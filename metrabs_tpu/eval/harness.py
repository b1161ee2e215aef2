"""Benchmark prediction + evaluation harnesses.

Re-design of the reference's predict flow (`metrabs_tf/main.py:439-507`) and
`inference_scripts/` drivers: iterate test examples through the crop model
(optionally with test-time mirror augmentation), transform predictions from
crop-camera space to world space, dump NPZ, and evaluate the standard metric
tables (MPJPE / PA-MPJPE / PCK / AUC ...) against ground truth.

Datasets are supplied as example lists (see `data/loading.py` Example3D); the
per-benchmark eval protocols (3DPW 14-joint PA, H36M 17-joint S9/S11, 3DHP
PCK@150 with its 17-joint subset, MuPoTS matched PCK) are expressed as eval
configs over the generic metric kernel in `eval/metrics.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.data.loading import Example3D, LoadConfig, load_and_transform3d
from metrabs_tpu.data.pipeline import ParallelBatchLoader
from metrabs_tpu.eval import metrics as metrics_mod
from metrabs_tpu.utils.joint_info import JointInfo


def predict_dataset(
        crop_model_fn: Callable, examples: Sequence[Example3D],
        joint_info: JointInfo, cfg: ModelConfig, *,
        crop_model_state=None, batch_size: int = 64, n_workers: int = 8,
        test_time_mirror_aug: bool = False,
        lcfg: Optional[LoadConfig] = None) -> Dict[str, np.ndarray]:
    """Runs the crop model over a test set; returns stacked predictions in the
    ORIGINAL camera and world frames (`main.py:485-507` PredTransform logic).

    crop_model_fn(crops [N,S,S,3], intrinsics [N,3,3], valid [N]) -> [N,J,3],
    or the 4-argument form crop_model_fn(state, crops, intrinsics, valid) with
    `crop_model_state` supplied (preferred: weights stay jit arguments rather
    than HLO constants).
    """
    import inspect
    if len(inspect.signature(crop_model_fn).parameters) == 3:
        legacy = crop_model_fn
        crop_model_fn = lambda state, c, k, v: legacy(c, k, v)
    lcfg = lcfg or LoadConfig(
        geom_aug=False, occlude_aug_prob=0, color_aug=False,
        background_aug_prob=0, partial_visibility_prob=0)

    def load_fn(ex, rng):
        return load_and_transform3d(ex, joint_info, False, rng, cfg, lcfg)

    n_total = len(examples)
    if n_total == 0:
        raise ValueError('predict_dataset called with an empty example list '
                         '(did the dataset adapter match any files?)')
    loader = ParallelBatchLoader(
        load_fn, iter(list(examples)), batch_size=min(batch_size, n_total),
        n_workers=n_workers)

    mirror = jnp.asarray(joint_info.mirror_mapping)

    @jax.jit
    def predict_batch(state, images, intrinsics, valid):
        crops = images.astype(jnp.dtype(cfg.dtype))
        poses = crop_model_fn(state, crops, intrinsics, valid)
        if test_time_mirror_aug:
            flipped = crop_model_fn(state, crops[:, :, ::-1], intrinsics, valid)
            # Mirror back: negate camera-space x, swap left/right joints,
            # then average (`models/metrabs.py:416-435`).
            flipped = (flipped * jnp.asarray([-1.0, 1.0, 1.0]))[:, mirror]
            poses = (poses + flipped) / 2
        return poses

    all_preds_cam = []
    all_true_cam = []
    all_valid = []
    all_preds_world = []
    n_done = 0
    full_bs = min(batch_size, n_total)
    for batch in loader:
        if n_done >= n_total:
            break
        take = min(len(batch['image']), n_total - n_done)
        images_np = batch['image']
        intr_np = batch['intrinsics']
        valid_np = np.ones((full_bs,), bool)
        if len(images_np) < full_bs:
            # Pad the trailing partial batch to the compiled shape: a
            # different batch dimension would recompile predict_batch
            # (minutes over the tunnel) for a handful of examples. Pad rows
            # are marked invalid so the crop model's pooled reconstruction
            # statistics ignore them.
            pad = full_bs - len(images_np)
            valid_np[len(images_np):] = False
            images_np = np.concatenate(
                [images_np, np.zeros((pad,) + images_np.shape[1:],
                                     images_np.dtype)])
            intr_np = np.concatenate(
                [intr_np, np.tile(np.eye(3, dtype=intr_np.dtype)[None],
                                  (pad, 1, 1))])
        poses = np.asarray(predict_batch(
            crop_model_state, jnp.asarray(images_np),
            jnp.asarray(intr_np), jnp.asarray(valid_np)))
        for i in range(take):
            # Crop camera -> original camera / world (`main.py:496-507`).
            rot_oc = batch['rot_to_orig_cam'][i]
            rot_w = batch['rot_to_world'][i]
            cam_loc = batch['cam_loc'][i]
            all_preds_cam.append(poses[i] @ rot_oc.T)
            all_preds_world.append(poses[i] @ rot_w.T + cam_loc)
            all_true_cam.append(batch['coords3d_true'][i] @ rot_oc.T)
            all_valid.append(batch['joint_validity_mask'][i])
        n_done += take
    loader.close()
    return dict(
        poses3d_pred_cam=np.stack(all_preds_cam),
        poses3d_pred_world=np.stack(all_preds_world),
        poses3d_true_cam=np.stack(all_true_cam),
        joint_validity_mask=np.stack(all_valid))


@dataclasses.dataclass(frozen=True)
class EvalProtocol:
    """Per-benchmark evaluation configuration. `joint_subset` names a
    JOINT_SUBSETS entry the metrics are restricted to (None = all joints)."""
    name: str
    pck_threshold_mm: float = 150.0
    joint_subset: Optional[str] = None


# Standard evaluation joint subsets (indices into the h36m_17 model joint
# set): the 3DPW protocol's 14 LSP-like joints (limbs + neck + head).
JOINT_SUBSETS = {
    'lsp_14_of_h36m17': [3, 2, 1, 4, 5, 6, 16, 15, 14, 11, 12, 13, 8, 10],
}

BENCHMARK_PROTOCOLS = {
    # 3DPW: 14-joint (LSP-like) protocol, PCK@50mm also reported.
    '3dpw': EvalProtocol(name='3dpw', pck_threshold_mm=50.0,
                         joint_subset='lsp_14_of_h36m17'),
    'h36m': EvalProtocol(name='h36m'),
    '3dhp': EvalProtocol(name='3dhp'),
    'mupots': EvalProtocol(name='mupots'),
    '3doh': EvalProtocol(name='3doh'),
    'aspset': EvalProtocol(name='aspset'),
}


def evaluate_predictions(
        preds: Dict[str, np.ndarray], joint_info: Optional[JointInfo] = None,
        threshold_mm: float = 150.0,
        joint_subset: Optional[Sequence[int]] = None) -> Dict[str, float]:
    """Computes the standard metric table from a predict_dataset dump.

    `joint_subset` restricts evaluation to the given joint indices (e.g. the
    3DPW protocol's 14 LSP-like joints or 3DHP's 17-joint subset)."""
    pred = preds['poses3d_pred_cam']
    true = preds['poses3d_true_cam']
    mask = preds['joint_validity_mask']
    if joint_subset is not None:
        idx = np.asarray(joint_subset)
        pred, true, mask = pred[:, idx], true[:, idx], mask[:, idx]
    m = metrics_mod.compute_pose3d_metrics(
        jnp.asarray(pred), jnp.asarray(true), jnp.asarray(mask),
        joint_info=joint_info if joint_subset is None else None,
        threshold_mm=threshold_mm)
    return {k: float(v) for k, v in m.items()}


def save_predictions_npz(path: str, preds: Dict[str, np.ndarray]) -> None:
    """NPZ prediction dump (the fleras StorePredictionsAsNPZ analogue)."""
    np.savez_compressed(path, **preds)


def save_predictions_hdf5(path: str, preds: Dict[str, np.ndarray]) -> None:
    """HDF5 prediction dump (the fleras StorePredictionsAsHDF5 analogue,
    reference `main.py:475-478`); string arrays stored as variable-length
    UTF-8."""
    import h5py
    with h5py.File(path, 'w') as f:
        for key, value in preds.items():
            value = np.asarray(value)
            if value.dtype.kind in ('U', 'O'):
                f.create_dataset(
                    key, data=value.astype(object),
                    dtype=h5py.string_dtype(encoding='utf-8'))
            else:
                f.create_dataset(key, data=value, compression='gzip')


def save_predictions(path: str, preds: Dict[str, np.ndarray]) -> None:
    """Dispatches on extension: .h5/.hdf5 -> HDF5, otherwise NPZ."""
    if path.endswith(('.h5', '.hdf5')):
        save_predictions_hdf5(path, preds)
    else:
        save_predictions_npz(path, preds)


def matched_pose_metrics(
        preds_per_frame, gts_per_frame, threshold_mm: float = 150.0,
        match_threshold_mm: float = 500.0, root_index=None, eval_joints=None):
    """Multi-person matched metrics (the MuPoTS-style protocol): per frame,
    Hungarian-match predictions to GT poses by root-relative MPJPE, then
    report PCK over MATCHED joints plus detection recall. Unmatched GT poses
    count as misses (all joints incorrect), mirroring the official
    evaluation's treatment of undetected people.

    preds/gts: lists (frames) of [n_i, J, 3] arrays in a common frame.
    root_index: joint used for root alignment (the official MuPoTS protocol
    aligns at the pelvis); None mean-centers instead. eval_joints: indices
    scored by PCK (the official 14-joint subset); None scores all J —
    alignment always uses the FULL pose so the root joint may be outside
    the scored subset. Returns matched_pck (root-relative PCK@threshold,
    the MuPoTS "PCK" column), matched_apck (absolute camera-space PCK, the
    "APCK" column — no root alignment, so detection depth errors count),
    and recall.
    """
    import scipy.optimize

    sel = slice(None) if eval_joints is None else np.asarray(eval_joints)

    def rootrel(p):
        if root_index is None:
            return p - p.mean(axis=-2, keepdims=True)
        return p - p[..., root_index:root_index + 1, :]

    def n_scored(pose):
        return pose[sel].shape[0]

    n_correct = 0
    n_correct_abs = 0
    n_total = 0
    n_matched = 0
    n_gt = 0
    for preds, gts in zip(preds_per_frame, gts_per_frame):
        n_gt += len(gts)
        n_total += sum(n_scored(g) for g in gts)
        if len(gts) == 0:
            continue
        if len(preds) == 0:
            continue
        cost = np.zeros((len(gts), len(preds)))
        for i, g in enumerate(gts):
            for j, q in enumerate(preds):
                cost[i, j] = np.linalg.norm(
                    rootrel(g)[sel] - rootrel(q)[sel], axis=-1).mean()
        gi, pj = scipy.optimize.linear_sum_assignment(cost)
        for i, j in zip(gi, pj):
            if cost[i, j] > match_threshold_mm:
                continue
            n_matched += 1
            dist = np.linalg.norm(
                rootrel(gts[i])[sel] - rootrel(preds[j])[sel], axis=-1)
            n_correct += int((dist <= threshold_mm).sum())
            dist_abs = np.linalg.norm(gts[i][sel] - preds[j][sel], axis=-1)
            n_correct_abs += int((dist_abs <= threshold_mm).sum())
    return dict(
        matched_pck=n_correct / max(n_total, 1),
        matched_apck=n_correct_abs / max(n_total, 1),
        recall=n_matched / max(n_gt, 1))
