"""Masked reductions (jit-safe equivalents of `metrabs_tf/tfu.py:27-88`).

All reductions are static-shape: invalid entries are zeroed and the divisor is
the count of valid entries (`divide_no_nan` semantics — 0/0 = 0), so these are
safe under vmap/jit with fully padded batches.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

Axis = Union[None, int, Sequence[int]]


def _expand_mask(mask: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Right-pads mask shape with singleton dims to match target rank."""
    return jnp.reshape(mask, mask.shape + (1,) * (target_ndim - mask.ndim))


def divide_no_nan(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(y == 0, jnp.zeros_like(x), x / jnp.where(y == 0, jnp.ones_like(y), y))


def reduce_mean_masked(
        x: jnp.ndarray, is_valid: Optional[jnp.ndarray], axis: Axis = None,
        keepdims: bool = False) -> jnp.ndarray:
    """Mean over `axis`, ignoring entries where `is_valid` is False.

    `is_valid` may have lower rank than `x`; its shape must match the leading
    dims of `x` (mask broadcast over trailing dims), as in `tfu.py:27-52`.
    """
    if is_valid is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    mask = _expand_mask(is_valid, x.ndim)
    replaced = jnp.where(mask, x, jnp.zeros_like(x))
    sum_valid = jnp.sum(replaced, axis=axis, keepdims=keepdims)
    n_valid = jnp.sum(
        jnp.broadcast_to(mask, x.shape).astype(x.dtype), axis=axis, keepdims=keepdims)
    return divide_no_nan(sum_valid, n_valid)


def reduce_sum_masked(
        x: jnp.ndarray, is_valid: jnp.ndarray, axis: Axis = None,
        keepdims: bool = False) -> jnp.ndarray:
    mask = _expand_mask(is_valid, x.ndim)
    return jnp.sum(jnp.where(mask, x, jnp.zeros_like(x)), axis=axis, keepdims=keepdims)


def mean_stdev_masked(
        x: jnp.ndarray, is_valid: jnp.ndarray, items_axis: int, dimensions_axis: int,
        fixed_ref: Optional[jnp.ndarray] = None):
    """Masked mean and pooled standard deviation (`tfu.py:55-71`).

    The stdev pools squared deviations over both the items axis and the
    dimensions axis but divides only by the item count — this 'spatial spread'
    convention is what the weak-perspective reconstruction relies on.
    """
    if fixed_ref is not None:
        mean = fixed_ref
    else:
        mean = reduce_mean_masked(x, is_valid, axis=items_axis, keepdims=True)
    centered = x - mean
    mask = _expand_mask(is_valid, x.ndim)
    n_valid = jnp.sum(
        jnp.broadcast_to(mask, x.shape).astype(x.dtype), axis=items_axis, keepdims=True)
    # After summing over items_axis, n_valid's dimensions_axis extent is that
    # of x; take one representative slice to divide by the item count only.
    n_valid = jnp.take(n_valid, jnp.array([0]), axis=dimensions_axis)
    sum_sq = reduce_sum_masked(
        jnp.square(centered), is_valid, axis=(items_axis, dimensions_axis), keepdims=True)
    stdev = jnp.sqrt(divide_no_nan(sum_sq, n_valid) + 1e-10)
    return mean, stdev
