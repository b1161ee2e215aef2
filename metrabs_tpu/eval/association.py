"""Track association for multi-person benchmark evaluation.

Host-side numpy/scipy utilities matching the reference's 3DPW harness
(`metrabs_tf/inference_scripts/predict_tdpw.py:157-205`): predictions are
matched to annotated tracks by Hungarian assignment over a 2D-AUC similarity
(falling back to temporal consistency with the previous frame's assignment
when too few annotated joints are confident).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import scipy.optimize

from metrabs_tpu.utils.joint_info import JointInfo

ASSOC_JOINTS = ('lsho', 'rsho', 'lelb', 'relb', 'lhip', 'rhip', 'lkne', 'rkne')


def pose2d_auc(pose2d_pred: np.ndarray, pose2d_true: np.ndarray,
               prev_pose2d_pred: np.ndarray, joint_info3d: JointInfo,
               joint_info2d: JointInfo,
               confidence_threshold: float = 0.2) -> float:
    """Torso-scale-normalized linear AUC between a predicted and annotated 2D
    pose; annotated joints below the confidence threshold are ignored. With
    fewer than 5 usable joints, similarity to the track's previous prediction
    is used instead (temporal association)."""
    pose2d_true = pose2d_true.copy()
    pose2d_true[pose2d_true[:, 2] < confidence_threshold] = np.nan
    ids3 = joint_info3d.ids
    ids2 = joint_info2d.ids
    indices_true = [ids2[name] for name in ASSOC_JOINTS]
    indices_pred = [ids3[name] for name in ASSOC_JOINTS]
    size = np.linalg.norm(pose2d_pred[ids3['rsho']] - pose2d_pred[ids3['lhip']])
    dist = np.linalg.norm(
        pose2d_true[indices_true, :2] - pose2d_pred[indices_pred], axis=-1)
    if np.count_nonzero(~np.isnan(dist)) < 5:
        dist = np.linalg.norm(
            prev_pose2d_pred[indices_pred] - pose2d_pred[indices_pred], axis=-1)
    with np.errstate(invalid='ignore'):
        return float(np.nanmean(np.maximum(0, 1 - dist / size)))


def associate_predictions(
        poses3d_pred: np.ndarray, poses2d_pred: np.ndarray,
        poses2d_true: np.ndarray, prev_poses2d_pred_ordered: np.ndarray,
        joint_info3d: JointInfo, joint_info2d: JointInfo):
    """Hungarian assignment of predictions to annotated tracks.

    Returns (poses3d ordered per track [n_tracks, J, 3] with NaN rows for
    unmatched tracks, updated per-track previous 2D predictions).
    """
    auc_matrix = np.array([
        [pose2d_auc(pp, pt, prev, joint_info3d, joint_info2d)
         for pp in poses2d_pred]
        for pt, prev in zip(poses2d_true, prev_poses2d_pred_ordered)])
    auc_matrix = np.nan_to_num(auc_matrix)
    true_indices, pred_indices = scipy.optimize.linear_sum_assignment(-auc_matrix)

    n_tracks = len(poses2d_true)
    result = np.full((n_tracks, joint_info3d.n_joints, 3), np.nan)
    poses2d_ordered = np.array(prev_poses2d_pred_ordered).copy()
    for ti, pi in zip(true_indices, pred_indices):
        result[ti] = poses3d_pred[pi]
        poses2d_ordered[ti] = poses2d_pred[pi]
    return result, poses2d_ordered


def associate_sequence(
        poses3d_per_frame: Sequence[np.ndarray],
        poses2d_per_frame: Sequence[np.ndarray],
        poses2d_true_per_frame: Sequence[np.ndarray],
        joint_info3d: JointInfo, joint_info2d: JointInfo) -> np.ndarray:
    """Runs association over a whole sequence, threading the per-track
    previous-frame predictions (`predict_tdpw.py` sequence loop). Returns
    [n_frames, n_tracks, J, 3] with NaNs for unmatched frames."""
    n_tracks = poses2d_true_per_frame[0].shape[0]
    prev = np.zeros((n_tracks, joint_info3d.n_joints, 2), np.float32)
    out = []
    for p3, p2, t2 in zip(poses3d_per_frame, poses2d_per_frame,
                          poses2d_true_per_frame):
        if len(p3) == 0:
            out.append(np.full((n_tracks, joint_info3d.n_joints, 3), np.nan))
            continue
        result, prev = associate_predictions(
            p3, p2, t2, prev, joint_info3d, joint_info2d)
        out.append(result)
    return np.stack(out)
