"""Rotation-matrix construction utilities (batched, jit-safe).

Semantics match the reference's `metrabs_tf/tfu3d.py:283-319`: row-vector
convention — a rotation matrix R maps camera-space points p (as row vectors)
via p @ R.T, and `lookat_rotation_matrix` stacks the new basis vectors as rows.
"""

from __future__ import annotations

import jax.numpy as jnp


def lookat_rotation_matrix(forward_vector: jnp.ndarray, up_vector: jnp.ndarray) -> jnp.ndarray:
    """Builds a batched rotation whose +Z axis points along `forward_vector`.

    Args:
      forward_vector: [batch, 3] direction the new Z should point to
        (e.g. the camera-space ray through a person box center).
      up_vector: [batch, 3] or [3] up direction in camera space.

    Returns:
      [batch, 3, 3] rotation with rows (new_x, new_y, new_z), mirroring
      `tfu3d.get_new_rotation_matrix` including the degenerate-case fallback
      where forward aligns with up.
    """
    up_vector = jnp.broadcast_to(up_vector, forward_vector.shape)
    new_z = forward_vector / jnp.linalg.norm(forward_vector, axis=-1, keepdims=True)
    new_x = jnp.cross(new_z, up_vector)
    # Fallback X: rotate new_z around the old Y by 90° for the case where the
    # look direction is parallel to up and the cross product vanishes.
    zeros = jnp.zeros_like(new_z[..., 2])
    new_x_alt = jnp.stack([new_z[..., 2], zeros, -new_z[..., 0]], axis=-1)
    x_norm = jnp.linalg.norm(new_x, axis=-1, keepdims=True)
    new_x = jnp.where(x_norm == 0, new_x_alt, new_x)
    new_x = new_x / jnp.linalg.norm(new_x, axis=-1, keepdims=True)
    new_y = jnp.cross(new_z, new_x)
    return jnp.stack([new_x, new_y, new_z], axis=-2)


def rotation_mat(angle: jnp.ndarray, rot_axis: str) -> jnp.ndarray:
    """Elementary rotation matrices about x/y/z for a batch of angles.

    Matches `tfu3d.rotation_mat` (`tfu3d.py:299-319`) including its sign
    conventions (note these are transposed relative to the textbook
    right-handed active rotations — they act on row vectors).
    """
    angle = jnp.asarray(angle)
    sin = jnp.sin(angle)
    cos = jnp.cos(angle)
    _0 = jnp.zeros_like(angle)
    _1 = jnp.ones_like(angle)

    if rot_axis == 'x':
        rows = [[_1, _0, _0], [_0, cos, sin], [_0, -sin, cos]]
    elif rot_axis == 'y':
        rows = [[cos, _0, -sin], [_0, _1, _0], [sin, _0, cos]]
    elif rot_axis == 'z':
        rows = [[cos, -sin, _0], [sin, cos, _0], [_0, _0, _1]]
    else:
        raise ValueError(f'Unknown rotation axis {rot_axis!r}')
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
