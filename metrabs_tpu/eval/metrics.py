"""3D pose evaluation metrics (JAX re-derivation of
`metrabs_tf/models/eval_metrics.py:10-62`).

MPJPE (root/mean-relative), absolute MPJPE, 2D pixel error, PA-MPJPE via
scale-aligned Procrustes, PCK/AUC@150mm (+ wrist-only variants), and NCPS
(all joints of a pose within threshold after Procrustes alignment).
All reductions are joint-validity masked and jit-safe.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from metrabs_tpu.ops import masked
from metrabs_tpu.ops.procrustes import rigid_align
from metrabs_tpu.utils.joint_info import JointInfo


def auc_score(x: jnp.ndarray, t1: float, t2: float) -> jnp.ndarray:
    """Linear-ramp AUC surrogate (`tfu.py:236-239`)."""
    return jnp.maximum(
        jnp.float32(1) - jnp.maximum(x - t1, 0.0) / (t2 - t1), 0.0)


def center_relative(diff: jnp.ndarray, validity: Optional[jnp.ndarray],
                    center_is_mean: bool = True) -> jnp.ndarray:
    if center_is_mean:
        center = masked.reduce_mean_masked(diff, validity, axis=1, keepdims=True)
    else:
        center = diff[:, -1:]
    return diff - center


def compute_pose3d_metrics(
        coords3d_pred: jnp.ndarray, coords3d_true: jnp.ndarray,
        joint_validity_mask: jnp.ndarray, *,
        coords3d_pred_is_abs: bool = True,
        coords2d_true: Optional[jnp.ndarray] = None,
        coords2d_pred: Optional[jnp.ndarray] = None,
        joint_info: Optional[JointInfo] = None,
        mean_relative: bool = True,
        threshold_mm: float = 150.0) -> Dict[str, jnp.ndarray]:
    metrics = {}
    diff = coords3d_pred - coords3d_true
    rootrel_diff = center_relative(diff, joint_validity_mask, mean_relative)
    dist = jnp.linalg.norm(rootrel_diff, axis=-1)
    metrics['mean_error'] = masked.reduce_mean_masked(dist, joint_validity_mask)

    if coords3d_pred_is_abs:
        metrics['mean_error_abs'] = masked.reduce_mean_masked(
            jnp.linalg.norm(diff, axis=-1), joint_validity_mask)

    if coords2d_true is not None and coords2d_pred is not None:
        metrics['mean_error_2d'] = masked.reduce_mean_masked(
            jnp.linalg.norm(coords2d_true - coords2d_pred[..., :2], axis=-1),
            joint_validity_mask)

    aligned = rigid_align(
        coords3d_pred, coords3d_true, joint_validity_mask=joint_validity_mask,
        scale_align=True)
    dist_pa = jnp.linalg.norm(aligned - coords3d_true, axis=-1)
    metrics['mean_error_procrustes'] = masked.reduce_mean_masked(
        dist_pa, joint_validity_mask)

    auc = auc_score(dist, 0.0, threshold_mm)
    metrics['mean_auc'] = masked.reduce_mean_masked(auc, joint_validity_mask)
    is_correct = (dist <= threshold_mm).astype(jnp.float32)
    metrics['mean_pck'] = masked.reduce_mean_masked(is_correct, joint_validity_mask)

    if joint_info is not None:
        ids = joint_info.ids
        wrists = [i for name, i in ids.items() if 'lwri' in name or 'rwri' in name]
        if wrists:
            w = np.asarray(wrists)
            metrics['pck_wrists'] = masked.reduce_mean_masked(
                is_correct[:, w], joint_validity_mask[:, w])
            metrics['auc_wrists'] = masked.reduce_mean_masked(
                auc[:, w], joint_validity_mask[:, w])

    masked_dist_pa = jnp.where(joint_validity_mask, dist_pa, 0.0)
    max_dist_pa = jnp.max(masked_dist_pa, axis=1)
    # NCPS-AUC ramp is HARDCODED 50..150 in the reference
    # (`eval_metrics.py:60`), independent of the PCK threshold — deriving
    # the upper edge from threshold_mm would divide by zero at the 3DPW
    # protocol's threshold of 50.
    metrics['ncps_auc'] = jnp.mean(auc_score(max_dist_pa, 50.0, 150.0))
    metrics['ncps'] = jnp.mean((max_dist_pa <= threshold_mm).astype(jnp.float32))
    return metrics
