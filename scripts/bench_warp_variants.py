"""Microbenchmark: warp/gather formulations on the real TPU chip.

Round-2 experiment for the VERDICT item "kill the warp bottleneck": measures
the current XLA 4-corner gather (`ops/warp.py`) against alternative
formulations to decide where the Pallas/MXU rework should land.

Timing follows CLAUDE.md rule 3: on-device lax.scan with a non-foldable
feedback dependency, host readback, (t_N - t_1) differencing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._benchlib import feedback, make_crop_homographies, timed_scan

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.ops import warp as warp_ops

N_IMG = 8
H, W = 1080, 1920
N_CROPS = 64
OUT = 256
ITERS = 8


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(N_IMG, H, W, 3)), jnp.float32)
    image_ids = jnp.asarray(rng.integers(0, N_IMG, size=N_CROPS), jnp.int32)
    k_old, invproj, crop_scales = make_crop_homographies(
        rng, N_CROPS, W, H, OUT)
    dist = jnp.zeros((N_CROPS, 12), jnp.float32)

    # --- Variant 1: current pyramid warp (XLA 4-corner gather) ---
    def v1(images):
        out = warp_ops.warp_images_with_pyramid(
            images, k_old, invproj, dist, crop_scales, image_ids, (OUT, OUT))
        return feedback(images, out), out[0, 0, 0, 0]
    t = timed_scan(v1, images)
    print(f'v1 current pyramid gather : {t*1e3:8.2f} ms/batch '
          f'({t*1e3/N_CROPS:6.3f} ms/crop)')

    # --- Variant 2: single-level warp (no pyramid), same gather ---
    def v2(images):
        out = warp_ops.warp_images(
            images, k_old, invproj, dist, image_ids, (OUT, OUT))
        return feedback(images, out), out[0, 0, 0, 0]
    t = timed_scan(v2, images)
    print(f'v2 single-level gather    : {t*1e3:8.2f} ms/batch '
          f'({t*1e3/N_CROPS:6.3f} ms/crop)')

    # --- Variant 3: gather from per-crop dynamic-sliced windows ---
    WIN = 640

    def v3(images):
        coords = warp_ops.warp_coords(invproj, k_old, dist, (OUT, OUT))
        ox = jnp.clip(jnp.min(coords[..., 0], axis=(1, 2)).astype(jnp.int32) - 1,
                      0, W - WIN)
        oy = jnp.clip(jnp.min(coords[..., 1], axis=(1, 2)).astype(jnp.int32) - 1,
                      0, H - WIN)

        def slice_one(img_id, oy1, ox1):
            return jax.lax.dynamic_slice(
                images, (img_id, oy1, ox1, 0), (1, WIN, WIN, 3))[0]
        wins = jax.vmap(slice_one)(image_ids, oy, ox)  # [N, WIN, WIN, 3]

        local = coords - jnp.stack(
            [ox.astype(jnp.float32), oy.astype(jnp.float32)], -1)[:, None, None]

        def gather_one(win, cl):
            return warp_ops.bilinear_gather(win[None], jnp.zeros((1,), jnp.int32),
                                            cl[None])[0]
        out = jax.vmap(gather_one)(wins, local)
        return feedback(images, out), out[0, 0, 0, 0]
    t = timed_scan(v3, images)
    print(f'v3 windowed gather        : {t*1e3:8.2f} ms/batch '
          f'({t*1e3/N_CROPS:6.3f} ms/crop)')

    # --- Variant 4: row-gather layout [rows, 128]: how fast is the
    # embedding-style gather on this chip? (lower bound probe, not a warp) ---
    n_idx = N_CROPS * OUT * OUT
    tbl = jnp.asarray(rng.uniform(size=(1 << 16, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1 << 16, size=(n_idx,)), jnp.int32)

    def v4(tbl):
        out = jnp.take(tbl, idx, axis=0)
        return tbl + (jnp.tanh(jnp.sum(out[::4096])) * 1e-12), out[0, 0]
    t = timed_scan(v4, tbl)
    print(f'v4 row-gather [T,128] {n_idx} rows: {t*1e3:8.2f} ms '
          f'({t*1e3/N_CROPS:6.3f} ms per crop-equivalent)')

    # --- Variant 5: hat-weight matmul formulation, pure XLA, windows
    # materialized per 16x64 output tile (MXU path cost probe). ---
    TR, TC = 16, 64
    WINR, WINC = 128, 128

    def v5(images):
        coords = warp_ops.warp_coords(invproj, k_old, dist, (OUT, OUT))
        # [N, bands, TR, cols, TC, 2]
        ct = coords.reshape(N_CROPS, OUT // TR, TR, OUT // TC, TC, 2)
        ct = ct.transpose(0, 1, 3, 2, 4, 5)  # [N, by, bx, TR, TC, 2]
        tmin = jnp.floor(ct.min(axis=(3, 4))).astype(jnp.int32) - 2
        ox = jnp.clip(tmin[..., 0], 0, W - WINC)
        oy = jnp.clip(tmin[..., 1], 0, H - WINR)
        n_by, n_bx = OUT // TR, OUT // TC

        ids3 = jnp.broadcast_to(image_ids[:, None, None],
                                (N_CROPS, n_by, n_bx)).reshape(-1)
        oxf = ox.reshape(-1)
        oyf = oy.reshape(-1)

        def slice_one(img_id, oy1, ox1):
            return jax.lax.dynamic_slice(
                images, (img_id, oy1, ox1, 0), (1, WINR, WINC, 3))[0]
        wins = jax.vmap(slice_one)(ids3, oyf, oxf)  # [T, WINR, WINC, 3]

        ctf = ct.reshape(-1, TR * TC, 2)
        x = jnp.clip(ctf[..., 0] - oxf[:, None].astype(jnp.float32), 0, WINC - 1)
        y = jnp.clip(ctf[..., 1] - oyf[:, None].astype(jnp.float32), 0, WINR - 1)
        vx = jnp.maximum(0, 1 - jnp.abs(
            x[..., None] - jnp.arange(WINC, dtype=jnp.float32)))  # [T, P, C]
        vy = jnp.maximum(0, 1 - jnp.abs(
            y[..., None] - jnp.arange(WINR, dtype=jnp.float32)))  # [T, P, R]

        def tile_mm(win, vx1, vy1):
            s = jnp.einsum('pc,rck->prk', vx1, win)       # [P, R, 3]
            return jnp.einsum('pr,prk->pk', vy1, s)       # [P, 3]
        out = jax.lax.map(
            lambda args: tile_mm(*args), (wins, vx, vy),
            batch_size=256)
        return feedback(images, out), out[0, 0, 0]
    t = timed_scan(v5, images)
    print(f'v5 XLA hat-matmul tiles   : {t*1e3:8.2f} ms/batch '
          f'({t*1e3/N_CROPS:6.3f} ms/crop)')


if __name__ == '__main__':
    main()
