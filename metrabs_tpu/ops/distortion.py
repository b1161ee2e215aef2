"""OpenCV-style lens distortion, branch-free and jit-safe.

Implements the 12-coefficient model (k1 k2 p1 p2 k3 k4 k5 k6 s1 s2 s3 s4):
radial rational + tangential + thin-prism terms, matching the behavior of the
reference's `metrabs_tf/multiperson/warping.py:94-151`.

TPU-first design note: the reference dispatches on `reduce_all(coeffs == 0)` at
graph-build time to pick a fast no-distortion path. Under jit that would be a
data-dependent branch; instead we always evaluate the distortion polynomial.
With all-zero coefficients the terms reduce exactly to a=1, b=0, c=0, i.e. the
identity, so the branch-free form is bit-equivalent and lets XLA fuse the whole
thing into surrounding elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_DIST_COEFFS = 12


def pad_distortion_coeffs(d: jnp.ndarray) -> jnp.ndarray:
    """Zero-pads the trailing axis to the full 12-coefficient vector."""
    n = d.shape[-1]
    if n > NUM_DIST_COEFFS:
        raise ValueError(f'Expected at most {NUM_DIST_COEFFS} coeffs, got {n}')
    if n == NUM_DIST_COEFFS:
        return d
    pad = [(0, 0)] * (d.ndim - 1) + [(0, NUM_DIST_COEFFS - n)]
    return jnp.pad(d, pad)


def distortion_terms(undist_points2d: jnp.ndarray, distortion_coeffs: jnp.ndarray):
    """Returns (a, b, c) with distorted = p * (a + b) + c.

    `undist_points2d`: [..., 2] normalized (intrinsics-free) coordinates.
    `distortion_coeffs`: [..., n<=12], broadcast against the leading dims of
    the points the same way the reference does (coeff batch dims align with
    the leading point dims; remaining point dims are broadcast).
    """
    d = pad_distortion_coeffs(distortion_coeffs.astype(undist_points2d.dtype))
    # Align: coeffs of rank r broadcast over points of rank p by inserting
    # singleton dims between the coeff batch dims and the final coefficient
    # axis (mirrors `warping.py:131-134`).
    if d.ndim > 1:
        batch_shape = d.shape[:-1]
        new_shape = batch_shape + (1,) * (undist_points2d.ndim - d.ndim) + (NUM_DIST_COEFFS,)
    else:
        new_shape = (1,) * (undist_points2d.ndim - 1) + (NUM_DIST_COEFFS,)
    d = jnp.reshape(d, new_shape)

    r2 = jnp.sum(jnp.square(undist_points2d), axis=-1, keepdims=True)
    # Rational radial part: (1 + k1 r² + k2 r⁴ + k3 r⁶) / (1 + k4 r² + k5 r⁴ + k6 r⁶)
    a_num = ((d[..., 4:5] * r2 + d[..., 1:2]) * r2 + d[..., 0:1]) * r2 + 1.0
    a_den = ((d[..., 7:8] * r2 + d[..., 6:7]) * r2 + d[..., 5:6]) * r2 + 1.0
    a = a_num / a_den
    # Tangential: d[..., 3:1:-1] == (p2, p1)
    p2p1 = jnp.stack([d[..., 3], d[..., 2]], axis=-1)
    b = 2.0 * jnp.sum(undist_points2d * p2p1, axis=-1, keepdims=True)
    # Thin prism: ((s2, s4) r² + (p2, p1) + (s1, s3)) r²
    s2s4 = jnp.stack([d[..., 9], d[..., 11]], axis=-1)
    s1s3 = jnp.stack([d[..., 8], d[..., 10]], axis=-1)
    c = (s2s4 * r2 + p2p1 + s1s3) * r2
    return a, b, c


def distort_points(undist_points2d: jnp.ndarray, distortion_coeffs: jnp.ndarray) -> jnp.ndarray:
    """Applies forward lens distortion to normalized 2D points."""
    a, b, c = distortion_terms(undist_points2d, distortion_coeffs)
    return undist_points2d * (a + b) + c


def undistort_points(
        dist_points2d: jnp.ndarray, distortion_coeffs: jnp.ndarray,
        num_iters: int = 5) -> jnp.ndarray:
    """Inverts the distortion with fixed-point iteration.

    The reference uses exactly 5 iterations (`warping.py:102-110`); the count
    is kept as a static parameter so parity configurations can match it. The
    loop is unrolled — `num_iters` is tiny and static, so XLA fuses it into
    one elementwise kernel.
    """
    undist = dist_points2d
    for _ in range(num_iters):
        a, b, c = distortion_terms(undist, distortion_coeffs)
        undist = (dist_points2d - c - undist * b) / a
    return undist
