"""Fixed-iteration Levenberg-Marquardt depth solve from bone lengths.

TPU-native replacement for the tensorflow_graphics LM optimizer used by the
reference's Model25D absolute reconstruction (`metrabs_tf/tfu3d.py:219-269`).
The problem is scalar per example (one unknown: the reference depth z), so LM
reduces to damped 1D Gauss-Newton with static iteration count — fully
jit/vmap-safe, unrolled by XLA into straight-line elementwise code.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from metrabs_tpu.ops.camera import to_homogeneous
from metrabs_tpu.ops.reconstruct import back_project, is_within_fov


def optimize_z_offset_by_bones(
        coords2d_normalized: jnp.ndarray, delta_z: jnp.ndarray,
        bone_lengths_ideal: jnp.ndarray, bones: Sequence[Tuple[int, int]],
        bone_weights: jnp.ndarray, initial_guess: jnp.ndarray,
        max_iter: int = 10) -> jnp.ndarray:
    """Finds z minimizing sum over bones of
    w_b * (|| reproj_bone_b(z) || - ideal_length_b)^2.

    With x_j = homog(normalized 2d), y_j = x_j * delta_z_j:
      bone vector at depth z is a_b z + b_b with a = x_i - x_j, b = y_i - y_j,
      so ||bone||^2 = c z^2 + d z + e (`tfu3d.py:251-259`).
    """
    bones = jnp.asarray(bones)
    x = to_homogeneous(coords2d_normalized)  # [B, J, 3]
    y = x * delta_z[..., jnp.newaxis]
    a = jnp.take(x, bones[:, 0], axis=-2) - jnp.take(x, bones[:, 1], axis=-2)
    b = jnp.take(y, bones[:, 0], axis=-2) - jnp.take(y, bones[:, 1], axis=-2)
    c = jnp.sum(jnp.square(a), axis=-1)  # [B, n_bones]
    d = 2 * jnp.sum(a * b, axis=-1)
    e = jnp.sum(jnp.square(b), axis=-1)

    def residuals(z):  # z: [B, 1]
        lengths = jnp.sqrt(jnp.maximum(jnp.square(z) * c + z * d + e, 1e-10))
        return (lengths - bone_lengths_ideal) * bone_weights  # [B, n_bones]

    def jacobian(z):
        lengths = jnp.sqrt(jnp.maximum(jnp.square(z) * c + z * d + e, 1e-10))
        return (2 * z * c + d) / (2 * lengths) * bone_weights  # [B, n_bones]

    def lm_step(carry, _):
        z, damping = carry
        r = residuals(z)
        J = jacobian(z)
        jtj = jnp.sum(jnp.square(J), axis=-1, keepdims=True)
        jtr = jnp.sum(J * r, axis=-1, keepdims=True)
        step = jtr / (jtj + damping * jtj + 1e-20)
        z_new = z - step
        # Accept the step only if the cost decreased; adapt damping (classic LM).
        cost_old = jnp.sum(jnp.square(r), axis=-1, keepdims=True)
        cost_new = jnp.sum(jnp.square(residuals(z_new)), axis=-1, keepdims=True)
        improved = cost_new < cost_old
        z = jnp.where(improved, z_new, z)
        damping = jnp.where(improved, damping * 0.5, damping * 4.0)
        return (z, damping), None

    z0 = jnp.broadcast_to(
        jnp.asarray(initial_guess, jnp.float32)[..., jnp.newaxis],
        coords2d_normalized.shape[:-2] + (1,))
    damping0 = jnp.full_like(z0, 1e-3)
    (z, _), _ = jax.lax.scan(lm_step, (z0, damping0), None, length=max_iter)
    return z[..., 0]


def reconstruct_absolute_by_bone_lengths(
        coords25d: jnp.ndarray, intrinsics: jnp.ndarray,
        bone_lengths_ideal: jnp.ndarray, bones: Sequence[Tuple[int, int]], *,
        proc_side: int, stride: int, centered_stride: bool = True,
        mean_relative: bool = True, only_in_fov: bool = True,
        max_iter: int = 10) -> jnp.ndarray:
    """Model25D absolute reconstruction (`tfu3d.py:219-243`)."""
    inv_intrinsics = jnp.linalg.inv(intrinsics.astype(coords25d.dtype))
    coords2d_normalized = jnp.einsum(
        '...jk,...nk->...jn', to_homogeneous(coords25d[..., :2]), inv_intrinsics,
        precision='highest')[..., :2]
    z = coords25d[..., 2]
    z_relative = z - (jnp.mean(z, axis=-1, keepdims=True) if mean_relative else z[..., -1:])

    bones_arr = jnp.asarray(bones)
    if only_in_fov:
        in_fov = is_within_fov(
            coords25d[..., :2], proc_side=proc_side, stride=stride,
            centered_stride=centered_stride)
        bone_weights = jnp.logical_and(
            jnp.take(in_fov, bones_arr[:, 0], axis=-1),
            jnp.take(in_fov, bones_arr[:, 1], axis=-1)).astype(jnp.float32) + 1e-8
    else:
        bone_weights = jnp.ones(coords25d.shape[:-2] + (len(bones),), jnp.float32)

    maxi = jnp.max(coords2d_normalized, axis=-2)
    mini = jnp.min(coords2d_normalized, axis=-2)
    projected_size = jnp.max(maxi - mini, axis=-1)
    distance_guess = 1500.0 / projected_size
    z_ref = optimize_z_offset_by_bones(
        coords2d_normalized, z_relative, bone_lengths_ideal, bones, bone_weights,
        distance_guess, max_iter)
    return back_project(coords2d_normalized, z_relative, z_ref)
