"""Fixed-shape greedy non-maximum suppression.

Shared by the detector's box NMS and the 3D pose NMS: visit candidates in
score order; keep one if still unsuppressed, then suppress everything whose
overlap/similarity with it exceeds the threshold. Static shapes (fori_loop +
keep mask) — the TPU-safe replacement for tf.image.non_max_suppression*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_nms(overlap: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               threshold: float, max_output: int) -> jnp.ndarray:
    """overlap: [n, n] pairwise overlap/similarity; returns keep mask [n].
    Invalid candidates are never kept and never suppress others."""
    n = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(i, state):
        alive, keep, n_kept = state
        idx = order[i]
        can_keep = jnp.logical_and(
            jnp.logical_and(alive[idx], valid[idx]), n_kept < max_output)
        keep = keep.at[idx].set(can_keep)
        n_kept = n_kept + can_keep.astype(jnp.int32)
        suppress = jnp.logical_and(can_keep, overlap[idx] > threshold)
        alive = jnp.logical_and(alive, jnp.logical_not(suppress))
        return alive, keep, n_kept

    state = (jnp.ones((n,), bool), jnp.zeros((n,), bool), jnp.int32(0))
    _, keep, _ = jax.lax.fori_loop(0, n, body, state)
    return keep
