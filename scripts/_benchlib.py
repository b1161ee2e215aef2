"""Shared benchmark/profiling helpers for the scripts in this directory.

Single home of the axon-safe timing methodology (CLAUDE.md rule 3) so fixes
land once:
 - the iteration loop runs ON DEVICE as a lax.scan chained through a
   non-foldable feedback dependency (host-side loops measure RPC dispatch
   rate over the tunnel, not compute);
 - timing differences (t_N - t_1)/(N-1) cancel the round-trip + readback
   constant;
 - the feedback sum is computed in float32 (a bf16 sum overflows to inf,
   which constant-folds the feedback chain away).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np


def time_once(fn, args) -> float:
    t0 = time.perf_counter()
    np.asarray(fn(args))
    return time.perf_counter() - t0


def timed_scan(fn, args, iters: int = 8, reps: int = 3) -> float:
    """Seconds per iteration of `fn(state) -> (new_state, sample)`, measured
    on-device: scan of length N vs length 1, min over `reps` runs each,
    differenced to cancel dispatch/readback overhead."""
    def make(n):
        @jax.jit
        def run(a):
            def body(a, _):
                new_a, sample = fn(a)
                return new_a, sample
            _, samples = jax.lax.scan(body, a, None, length=n)
            return samples
        return run

    run_n, run_1 = make(iters), make(1)
    np.asarray(run_1(args))  # compile
    np.asarray(run_n(args))
    t1 = min(time_once(run_1, args) for _ in range(reps))
    tn = min(time_once(run_n, args) for _ in range(reps))
    return (tn - t1) / (iters - 1)


def feedback(carry, out):
    """Non-foldable dependency: ~1e-12 of tanh(sum(out)) added to the carry.
    The sum MUST be f32 — in bf16 it overflows to inf and XLA folds the
    chain (the bench then measures nothing)."""
    fb = (jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-12).astype(
        carry.dtype)
    return carry + fb


def make_crop_homographies(rng, n_crops: int, img_w: int, img_h: int,
                           out_side: int):
    """Realistic per-crop warp parameters for warp benchmarks: boxes of
    ~200-600 px (crop_scale 0.4-1.3), rotations within the TTA's +-25 deg.
    Returns (k_old [N,3,3], invproj [N,3,3], crop_scales [N]) as jnp arrays;
    new_invprojmat maps out px -> cam ray, K_old maps ray -> source px."""
    scales = rng.uniform(0.4, 1.3, size=n_crops).astype(np.float32)
    angles = rng.uniform(-0.44, 0.44, size=n_crops).astype(np.float32)
    cx = rng.uniform(300, img_w - 300, size=n_crops).astype(np.float32)
    cy = rng.uniform(200, img_h - 200, size=n_crops).astype(np.float32)

    k_old = np.tile(np.array(
        [[1000.0, 0, img_w / 2], [0, 1000.0, img_h / 2], [0, 0, 1]],
        np.float32), (n_crops, 1, 1))
    invproj = np.zeros((n_crops, 3, 3), np.float32)
    for i in range(n_crops):
        c, s = np.cos(angles[i]), np.sin(angles[i])
        rot = np.array([[c, -s], [s, c]], np.float32)
        a = rot / scales[i]  # d(src)/d(out)
        t = np.array([cx[i], cy[i]]) - a @ np.array([out_side / 2,
                                                     out_side / 2])
        m = np.eye(3, dtype=np.float32)
        m[:2, :2] = a
        m[:2, 2] = t
        invproj[i] = np.linalg.inv(k_old[i]) @ m
    return (jnp.asarray(k_old), jnp.asarray(invproj), jnp.asarray(scales))
