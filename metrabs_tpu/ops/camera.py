"""Camera intrinsics helpers and basic projective ops (batched, jit-safe)."""

from __future__ import annotations

import jax.numpy as jnp


def to_homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    """Appends a 1 along the last axis (`tfu3d.py:161-162`)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def project(points: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection without z-clamping (`tfu3d.py:202-203`).

    Used by the multiperson 2D-output path; the training-loss path uses the
    z-clamped `project_pose` in `reconstruct.py`. The two are intentionally
    distinct in the reference — do not unify.
    """
    return points[..., :2] / points[..., 2:3]


def intrinsics_from_fov(fov_degrees, imshape) -> jnp.ndarray:
    """Builds a [1, 3, 3] intrinsic matrix from a diagonal-free FOV spec.

    The focal length makes the *larger* image side span `fov_degrees`
    (`tfu3d.py:272-280`); the principal point is the image center.
    `imshape` is (height, width).
    """
    imshape = jnp.asarray(imshape, jnp.float32)
    fov_radians = jnp.float32(fov_degrees) * jnp.float32(jnp.pi / 180.0)
    larger_side = jnp.max(imshape)
    focal = larger_side / (jnp.tan(fov_radians / 2) * 2)
    _0 = jnp.zeros_like(focal)
    _1 = jnp.ones_like(focal)
    row0 = jnp.stack([focal, _0, imshape[1] / 2])
    row1 = jnp.stack([_0, focal, imshape[0] / 2])
    row2 = jnp.stack([_0, _0, _1])
    return jnp.stack([row0, row1, row2])[jnp.newaxis]


def corner_aligned_scale_mat(factor) -> jnp.ndarray:
    """Intrinsics adjustment for resizing an image by `factor` with
    corner-aligned (pixel-center preserving) semantics (`warping.py:160-165`).
    """
    factor = jnp.asarray(factor, jnp.float32)
    shift = (factor - 1) / 2
    _0 = jnp.zeros_like(factor)
    _1 = jnp.ones_like(factor)
    return jnp.stack([
        jnp.stack([factor, _0, shift], axis=-1),
        jnp.stack([_0, factor, shift], axis=-1),
        jnp.stack([_0, _0, _1], axis=-1)], axis=-2)
