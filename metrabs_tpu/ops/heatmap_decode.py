"""Soft-argmax heatmap decoding (`metrabs_tf/tfu.py:209-233`).

The decode runs in float32 regardless of the backbone compute dtype — the
heatmap axes have up to proc_side/stride * depth bins and the expectation is
precision-critical for mm-level accuracy.

TPU note: the whole decode is a softmax followed by tiny contractions with a
linspace vector; XLA fuses it with the preceding 1x1-conv head, so no custom
kernel is warranted here (the FLOPs are negligible next to the backbone).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp

Axes = Union[int, Sequence[int]]


def softmax_multi_axis(x: jnp.ndarray, axes: Axes) -> jnp.ndarray:
    """Softmax jointly over several axes."""
    if isinstance(axes, int):
        axes = (axes,)
    axes = tuple(axes)
    m = jnp.max(x, axis=axes, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axes, keepdims=True)


def decode_heatmap(inp: jnp.ndarray, axes: Axes, output_coord_axis: int = -1) -> jnp.ndarray:
    """Per-axis expected coordinate in [0, 1] of a (normalized) heatmap.

    For each requested axis, sums the heatmap over the *other* requested axes
    and contracts with linspace(0, 1, n_bins). Results are stacked along
    `output_coord_axis` in the order the axes were given (the reference decodes
    3D as axes [W, H, D] to emit x, y, z — order matters).
    """
    if isinstance(axes, int):
        axes = (axes,)
    heatmap_axes = tuple(ax if ax >= 0 else inp.ndim + ax for ax in axes)
    results = []
    for ax in heatmap_axes:
        other_axes = tuple(a for a in heatmap_axes if a != ax)
        marginal = jnp.sum(inp, axis=other_axes, keepdims=True) if other_axes else inp
        n_bins = inp.shape[ax]
        coords = jnp.linspace(0.0, 1.0, n_bins, dtype=inp.dtype)
        decoded = jnp.tensordot(marginal, coords, axes=[[ax], [0]])
        # tensordot removed `ax`; restore it as a singleton then drop all
        # heatmap axes so each decoded term has identical shape.
        decoded = jnp.expand_dims(decoded, ax)
        decoded = jnp.squeeze(decoded, heatmap_axes)
        results.append(decoded)
    return jnp.stack(results, axis=output_coord_axis)


def soft_argmax(logits: jnp.ndarray, axes: Axes) -> jnp.ndarray:
    """Softmax + expected coordinate, in [0, 1] per axis (`tfu.py:216-217`)."""
    return decode_heatmap(softmax_multi_axis(logits.astype(jnp.float32), axes), axes)
