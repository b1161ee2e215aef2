"""Heatmap-coordinate to image/metric mappings (`metrabs_tf/models/util.py:8-29`).

The centered-stride pixel mapping is bit-accuracy critical: heatmap coordinate
u in [0, 1] maps to pixel u * last_receptive_center (+ stride/2 if the
backbone uses centered striding). Getting this off by stride/2 silently costs
millimeters of MPJPE (see reference's `legacy_centered_stride_bug` compat
flag, `metrabs_pytorch/models/util.py:17-18`).
"""

from __future__ import annotations

import jax.numpy as jnp


def heatmap_to_image(
        coords: jnp.ndarray, *, proc_side: int, stride: int,
        centered_stride: bool = True) -> jnp.ndarray:
    """Maps normalized heatmap xy coords in [0,1] to pixel coordinates."""
    last_image_pixel = proc_side - 1
    last_receptive_center = last_image_pixel - (last_image_pixel % stride)
    out = coords * jnp.float32(last_receptive_center)
    if centered_stride:
        out = out + jnp.float32(stride // 2)
    return out


def heatmap_to_25d(
        coords: jnp.ndarray, *, proc_side: int, stride: int, box_size_mm: float,
        centered_stride: bool = True) -> jnp.ndarray:
    """xy in pixels, z in millimeters (`models/util.py:21-23`)."""
    coords2d = heatmap_to_image(
        coords[..., :2], proc_side=proc_side, stride=stride, centered_stride=centered_stride)
    return jnp.concatenate([coords2d, coords[..., 2:] * box_size_mm], axis=-1)


def heatmap_to_metric(
        coords: jnp.ndarray, *, proc_side: int, stride: int, box_size_mm: float,
        centered_stride: bool = True) -> jnp.ndarray:
    """All three axes in millimeters, root-relative (`models/util.py:26-29`)."""
    coords2d = heatmap_to_image(
        coords[..., :2], proc_side=proc_side, stride=stride,
        centered_stride=centered_stride) * (box_size_mm / proc_side)
    return jnp.concatenate([coords2d, coords[..., 2:] * box_size_mm], axis=-1)
