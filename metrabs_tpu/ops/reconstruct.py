"""Absolute-pose reconstruction: fusing 2D and metric 3D predictions.

Re-derivation of the reference's `metrabs_tf/tfu3d.py:118-216` for JAX/XLA.
The full-perspective reference-point solve replaces `tf.linalg.lstsq(...,
l2_regularizer=1e-2)` with the mathematically identical Tikhonov normal
equations solved as a batched 3x3 linear system — static shapes, fully
jit/vmap-safe, and tiny enough that XLA keeps it fused on-chip (the PyTorch
port's explicit Tikhonov-row formulation, `metrabs_pytorch/ptu3d.py:56-105`,
shows the same regularization spelled out as extra rows).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from metrabs_tpu.ops import masked
from metrabs_tpu.ops.camera import to_homogeneous


def is_within_fov(
        imcoords: jnp.ndarray, *, proc_side: int, stride: int,
        centered_stride: bool = True, border_factor: float = 0.75) -> jnp.ndarray:
    """True where 2D image coords fall inside the trusted FOV band.

    The border is stride-aware (`tfu3d.py:210-216`): predictions closer than
    `stride * border_factor` to the crop edge are considered unreliable.
    """
    offset = 0.0 if centered_stride else -stride / 2.0
    lower = jnp.float32(stride * border_factor + offset)
    upper = jnp.float32(proc_side - stride * border_factor + offset)
    return jnp.all(jnp.logical_and(imcoords >= lower, imcoords <= upper), axis=-1)


def back_project(camcoords2d: jnp.ndarray, delta_z: jnp.ndarray,
                 z_offset: jnp.ndarray) -> jnp.ndarray:
    """Lifts normalized 2D points to 3D given per-joint depth offsets
    (`tfu3d.py:206-207`)."""
    return to_homogeneous(camcoords2d) * (delta_z + z_offset[..., jnp.newaxis])[..., jnp.newaxis]


def project_pose(coords3d: jnp.ndarray, intrinsic_matrix: jnp.ndarray) -> jnp.ndarray:
    """Projects camera-space 3D joints to pixels, clamping z >= 1mm
    (`tfu3d.py:246-248`). Used in training losses; the multiperson output path
    uses the unclamped `camera.project` instead."""
    projected = coords3d / jnp.maximum(jnp.float32(1), coords3d[..., 2:])
    return jnp.einsum(
        '...nk,...jk->...nj', projected, intrinsic_matrix[..., :2, :],
        precision='highest')


def reconstruct_ref_weakpersp(
        normalized_2d: jnp.ndarray, coords3d_rel: jnp.ndarray,
        validity_mask: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective reference point (`tfu3d.py:145-158`).

    Estimates depth as the ratio of 3D spatial spread to normalized-2D spread,
    then places the reference so the (masked) means align.
    """
    _, stdev3d = masked.mean_stdev_masked(
        coords3d_rel[..., :2], validity_mask, items_axis=-2, dimensions_axis=-1)
    mean2d, stdev2d = masked.mean_stdev_masked(
        normalized_2d[..., :2], validity_mask, items_axis=-2, dimensions_axis=-1)
    stdev2d = jnp.maximum(stdev2d, 1e-5)
    stdev3d = jnp.maximum(stdev3d, 1e-5)
    old_mean = masked.reduce_mean_masked(coords3d_rel, validity_mask, axis=-2, keepdims=True)
    new_mean_z = masked.divide_no_nan(stdev3d, stdev2d)
    new_mean = to_homogeneous(mean2d) * new_mean_z
    return jnp.squeeze(new_mean - old_mean, axis=-2)


def reconstruct_ref_fullpersp(
        normalized_2d: jnp.ndarray, coords3d_rel: jnp.ndarray,
        validity_mask: jnp.ndarray,
        sample_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full-perspective reference point via weighted, Tikhonov-regularized
    least squares (`tfu3d.py:165-199`).

    For each joint j with normalized image coords p_j and relative 3D offset
    d_j, the constraint is p_j * (z_ref + d_jz) = (x_ref, y_ref) + d_jxy, i.e.
    rows [I2 | -p_j] @ ref = d_jxy - p_j d_jz. Solved as batched 3x3 normal
    equations with the same RMS pre-normalization, validity weights (+1e-4)
    and l2 regularizer (1e-2) as the reference, which keeps the op a fused
    pile of batched matmuls instead of a QR decomposition.

    `sample_valid` ([...] batch-shaped bool) excludes padding batch elements
    from the pooled RMS normalization: the reference pools the RMS over the
    whole (ragged, hence padding-free) batch (`tfu3d.py:180-183`); with padded
    fixed-shape batches the garbage crops must not perturb the shared scale.
    """
    def rms_normalize(x):
        if sample_valid is None:
            scale = jnp.sqrt(jnp.mean(jnp.square(x)))
        else:
            # Exclusion must be where-before-square, not multiply-by-mask:
            # padding crops carry NaN/Inf coords (their warp homography is
            # singular) and NaN * 0 = NaN would poison the POOLED scale for
            # every valid sample sharing the chunk.
            mask = jnp.reshape(
                sample_valid, sample_valid.shape + (1,) * (x.ndim - sample_valid.ndim))
            mask = jnp.broadcast_to(mask, x.shape).astype(bool)
            xm = jnp.where(mask, x, jnp.zeros_like(x))
            scale = jnp.sqrt(
                jnp.sum(jnp.square(xm))
                / jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0))
        scale = jnp.maximum(scale, 1e-10)
        return scale, x / scale

    scale2d, p = rms_normalize(normalized_2d)  # [..., J, 2]
    rel_backproj = normalized_2d * coords3d_rel[..., 2:] - coords3d_rel[..., :2]
    scale_rel_backproj, b = rms_normalize(rel_backproj)  # [..., J, 2]

    w = validity_mask.astype(normalized_2d.dtype) + jnp.float32(1e-4)  # [..., J]
    w2 = jnp.square(w)

    # Normal equations M @ ref = v for A = [rows (1,0,-px),(0,1,-py) per joint]
    # weighted by w (same weight for a joint's two rows):
    #   M = sum_j w_j^2 * [[1,0,-px],[0,1,-py],[-px,-py,px²+py²]] + 1e-2 I
    #   v = sum_j w_j^2 * [bx, by, -(px bx + py by)]
    sw = jnp.sum(w2, axis=-1)  # [...]
    swp = jnp.einsum('...j,...jc->...c', w2, p)  # [..., 2]
    swpp = jnp.einsum('...j,...j->...', w2, jnp.sum(jnp.square(p), axis=-1))  # [...]
    zeros = jnp.zeros_like(sw)
    M = jnp.stack([
        jnp.stack([sw, zeros, -swp[..., 0]], axis=-1),
        jnp.stack([zeros, sw, -swp[..., 1]], axis=-1),
        jnp.stack([-swp[..., 0], -swp[..., 1], swpp], axis=-1)], axis=-2)
    M = M + 1e-2 * jnp.eye(3, dtype=M.dtype)

    swb = jnp.einsum('...j,...jc->...c', w2, b)  # [..., 2]
    swpb = jnp.einsum('...j,...j->...', w2, jnp.sum(p * b, axis=-1))  # [...]
    v = jnp.concatenate([swb, -swpb[..., jnp.newaxis]], axis=-1)  # [..., 3]

    ref = jnp.linalg.solve(M, v[..., jnp.newaxis])[..., 0]  # [..., 3]
    # Undo the RMS pre-normalization (`tfu3d.py:198`).
    return jnp.concatenate([
        ref[..., :2] * scale_rel_backproj,
        ref[..., 2:] * (scale_rel_backproj / scale2d)], axis=-1)


def reconstruct_absolute(
        coords2d: jnp.ndarray, coords3d_rel: jnp.ndarray, intrinsics: jnp.ndarray,
        *, proc_side: int, stride: int, centered_stride: bool = True,
        mix_3d_inside_fov: Optional[jnp.ndarray] = None,
        weak_perspective: bool = False,
        sample_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fuses 2D pixel predictions and metric root-relative 3D predictions into
    absolute camera-space 3D joints (`tfu3d.py:118-142`).

    Inside the FOV the 2D branch (optionally blended with the 3D branch by
    `mix_3d_inside_fov`) wins; outside it the 3D-based estimate is used.
    """
    inv_intrinsics = jnp.linalg.inv(intrinsics.astype(coords2d.dtype))
    coords2d_normalized = jnp.einsum(
        '...jk,...nk->...jn', to_homogeneous(coords2d), inv_intrinsics,
        precision='highest')[..., :2]

    in_fov = is_within_fov(
        coords2d, proc_side=proc_side, stride=stride, centered_stride=centered_stride)

    if weak_perspective:
        ref = reconstruct_ref_weakpersp(coords2d_normalized, coords3d_rel, in_fov)
    else:
        ref = reconstruct_ref_fullpersp(
            coords2d_normalized, coords3d_rel, in_fov, sample_valid=sample_valid)

    coords_abs_3d_based = coords3d_rel + ref[..., jnp.newaxis, :]
    reference_depth = ref[..., 2]
    relative_depths = coords3d_rel[..., 2]
    coords_abs_2d_based = back_project(coords2d_normalized, relative_depths, reference_depth)

    if mix_3d_inside_fov is not None:
        coords_abs_2d_based = (
            mix_3d_inside_fov * coords_abs_3d_based
            + (1 - mix_3d_inside_fov) * coords_abs_2d_based)
    return jnp.where(in_fov[..., jnp.newaxis], coords_abs_2d_based, coords_abs_3d_based)
