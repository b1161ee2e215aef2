"""Pallas TPU kernel for the batched perspective crop warp.

Replaces the 4-corner XLA gather of `ops/warp.py` (the round-1 pipeline
bottleneck: ~3-6 ms/crop@256, scalar-gather bound) with an MXU formulation:
bilinear sampling is a contraction of the source window against per-pixel
hat-function weight matrices,

    out[p, ch] = sum_r sum_c hat(y_p - r) * hat(x_p - c) * win[ch, r, c],

evaluated per output tile as ONE [3*WIN, WIN] x [WIN, P] matmul plus a VPU
row-reduction, with the tile's source window DMA'd from a channel-major
pyramid canvas in HBM. All intermediates ([3*WIN, P] partial sums, weight
matrices) live in VMEM — the equivalent pure-XLA einsum formulation
materializes ~13 GB of [P, WIN] weights per 64-crop batch.

Semantics are identical to `warp.warp_images_with_pyramid` (the reference
contract, `metrabs_tf/multiperson/warping.py:8-91`): always-distort 12-coef
model, zero border via 1px pad + replicate-clamp, per-crop pyramid level as
intrinsics adjustment. Correctness is tested against the gather backend
(tests/test_warp_pallas.py, interpret mode on CPU).

Geometry of the tiling: output tiles are TR x TC = 32 x 32 pixels (square =
rotation-invariant footprint); at in-level scale > 0.5 (guaranteed by level
selection for crop_scale > 1/8) a tile's source span per axis is at most
32*sqrt(2) / 0.5 + 2 (bilinear) + 2 (origin margin) = 95 px. Window origins
must start on the HBM (8, 128) tiling (Mosaic slice alignment). Rows
quantize to 8 (slack <= 7 -> WIN_R 104); columns quantize to 128 (slack <=
127 -> WIN_C 256, 2.5x the footprint). The N_SHIFTS machinery can shrink
WIN_C to 128 by storing column-pre-shifted canvas copies stacked along rows
(any 32-aligned origin is 128-aligned in one copy), but measured on v5e
(scripts/bench_warp_precision.py) that only wins for 6-pass f32 dots
(0.29 vs 0.41 ms/crop) and LOSES for 1-pass bf16 (0.18 vs 0.15) at 4x the
canvas HBM + ~6 ms/batch extra build — so the shipped config is N_SHIFTS=1
(plain 256 window). For crop_scale <= 1/8 (a box larger than ~8x the crop
resolution — beyond the reference's 3-level pyramid too) samples clamp to
the window edge.

MXU precision modes (`precision`), measured kernel-only at 64 crops/8x1080p:
'f32' (6-pass HIGHEST, 0.41 ms/crop; exact-f32), 'bf16x3' (three 1-pass
dots on hi/lo bf16 splits, 0.26 ms/crop, error ~1e-5 — numerically
f32-equivalent; the default via ModelConfig.warp_precision='high'), 'bf16'
(one pass, 0.15 ms/crop, error ~4e-3 ~= the u8 source quantization).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metrabs_tpu.ops import warp as warp_ops
from metrabs_tpu.ops.distortion import pad_distortion_coeffs

TR, TC = 32, 32          # output tile shape (rows, cols)
P = TR * TC              # pixels per tile
WIN_R = 104              # >= 95 px footprint + 7 rows of 8-alignment slack
WIN_C = 256              # >= 95 px footprint + 127 cols of alignment slack
N_SHIFTS = 1             # shifted canvas copies (see docstring; 1 = off)
SHIFT = 128 // N_SHIFTS  # column shift between copies
N_PARAMS = 32            # padded per-crop f32 parameter vector


def _warp_tile_kernel(meta_ref, params_ref, canvas_ref, out_ref, win, sem, *,
                      n_bx: int, n_tiles: int, n_total: int, precision):
    n = pl.program_id(0)
    t = pl.program_id(1)
    # meta is [N, T*8] (flat last axis: SMEM pads the minor dim to 128, so a
    # [N, T, 8] layout would blow the 1 MB SMEM budget 16x). Slots:
    # 0 image_id, 1 oy_dma (incl. shifted-copy block), 2 ox_dma (128-aligned
    # within the copy), 3 oy_local, 4 wp, 5 hp, 6 ox_local (32-aligned origin
    # in ORIGINAL canvas columns; ox_dma = ox_local - SHIFT*copy).
    ox = meta_ref[n, t * 8 + 6]
    oy_local = meta_ref[n, t * 8 + 3]
    wp = meta_ref[n, t * 8 + 4]
    hp = meta_ref[n, t * 8 + 5]

    # Double-buffered window fetch: step `lin` waits on slot lin%2 while the
    # DMA for step lin+1 runs into the other slot.
    def window_dma(lin, slot):
        n2 = lin // n_tiles
        t2 = lin % n_tiles
        return pltpu.make_async_copy(
            canvas_ref.at[
                meta_ref[n2, t2 * 8 + 0], :,
                pl.ds(pl.multiple_of(meta_ref[n2, t2 * 8 + 1], 8), WIN_R),
                pl.ds(pl.multiple_of(meta_ref[n2, t2 * 8 + 2], 128), WIN_C)],
            win.at[slot], sem.at[slot])

    lin = n * n_tiles + t

    @pl.when(lin == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(lin + 1 < n_total)
    def _():
        window_dma(lin + 1, (lin + 1) % 2).start()

    # Output-pixel coordinates in [1, P] layout (pixels on lanes).
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xo = ((pidx & (TC - 1)) + (t % n_bx) * TC).astype(jnp.float32)
    yo = ((pidx >> 5) + (t // n_bx) * TR).astype(jnp.float32)

    pr = lambda i: params_ref[n, i]
    # ray = new_invprojmat @ (xo, yo, 1)
    rx = pr(0) * xo + pr(1) * yo + pr(2)
    ry = pr(3) * xo + pr(4) * yo + pr(5)
    rz = pr(6) * xo + pr(7) * yo + pr(8)
    inv_rz = 1.0 / rz
    px = rx * inv_rz
    py = ry * inv_rz
    # 12-coefficient distortion (ops/distortion.py formula, scalars unrolled):
    # distorted = p * (a + b) + c.
    d = [pr(15 + i) for i in range(12)]
    r2 = px * px + py * py
    a_num = ((d[4] * r2 + d[1]) * r2 + d[0]) * r2 + 1.0
    a_den = ((d[7] * r2 + d[6]) * r2 + d[5]) * r2 + 1.0
    ab = a_num / a_den + 2.0 * (px * d[3] + py * d[2])
    cx_ = (d[9] * r2 + d[3] + d[8]) * r2
    cy_ = (d[11] * r2 + d[2] + d[10]) * r2
    xd = px * ab + cx_
    yd = py * ab + cy_
    # Source pixel via the level-adjusted intrinsics (rows 0,1 of K).
    xi = pr(9) * xd + pr(10) * yd + pr(11)
    yi = pr(12) * xd + pr(13) * yd + pr(14)
    # Padded-canvas coords, replicate-clamped (zero ring => zero border),
    # then window-local.
    x = jnp.clip(xi + 1.0, 0.0, wp.astype(jnp.float32) - 1.0)
    y = jnp.clip(yi + 1.0, 0.0, hp.astype(jnp.float32) - 1.0)
    xl = jnp.clip(x - ox.astype(jnp.float32), 0.0, WIN_C - 1.0)
    yl = jnp.clip(y - oy_local.astype(jnp.float32), 0.0, WIN_R - 1.0)

    iota_c = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_C, 1), 0).astype(jnp.float32)
    iota_r = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_R, 1), 0).astype(jnp.float32)
    vxt = jnp.maximum(0.0, 1.0 - jnp.abs(iota_c - xl))   # [WIN_C, P]
    vyt = jnp.maximum(0.0, 1.0 - jnp.abs(iota_r - yl))   # [WIN_R, P]

    window_dma(lin, lin % 2).wait()
    win2 = win[lin % 2].reshape(3 * WIN_R, WIN_C)
    dotf = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if precision == 'bf16x3':
        # Near-f32 accuracy at 3 one-pass dots: split both operands into
        # bf16 hi + exact-remainder lo, drop the lo*lo term (~2^-18 rel).
        win_hi = win2.astype(jnp.bfloat16)
        win_lo = (win2 - win_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        vxt_hi = vxt.astype(jnp.bfloat16)
        vxt_lo = (vxt - vxt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s = (dotf(win_hi, vxt_hi) + dotf(win_hi, vxt_lo)
             + dotf(win_lo, vxt_hi))                    # [3*WIN_R, P]
    elif precision == 'bf16x2':
        # Keep the GEOMETRY-critical vxt_lo term (subpixel hat weights to
        # f32 accuracy) but drop win_lo: pixel-value precision beyond bf16
        # is destroyed anyway by the crop model's bf16 input cast, so the
        # dropped term costs <=~1 ulp of bf16 at the backbone boundary while
        # saving one of three MXU passes.
        win_hi = win2.astype(jnp.bfloat16)
        vxt_hi = vxt.astype(jnp.bfloat16)
        vxt_lo = (vxt - vxt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s = dotf(win_hi, vxt_hi) + dotf(win_hi, vxt_lo)
    elif precision == 'bf16':
        s = dotf(win2.astype(jnp.bfloat16), vxt.astype(jnp.bfloat16))
    else:  # 'f32'
        s = dotf(win2, vxt, precision=jax.lax.Precision.HIGHEST)
    rows = [jnp.sum(s[ch * WIN_R:(ch + 1) * WIN_R] * vyt, axis=0,
                    keepdims=True)
            for ch in range(3)]
    out_ref[0, 0, :, :] = jnp.concatenate(rows, axis=0)


def _avg_pool_2x2_chmaj(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 box filter, stride 2, on channel-major [n, c, h, w]."""
    n, c, h, w = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, :, :h2 * 2, :w2 * 2].reshape(n, c, h2, 2, w2, 2)
    return x.mean(axis=(3, 5))


def pyramid_canvas_layout(image_shape, n_levels: int = 3):
    """Static geometry of the pyramid canvas for [n, h, w, c] sources:
    returns (level_rows, level_dims, canvas_shape). Pure shape arithmetic —
    lets callers allocate/skip the canvas under `lax.cond` (the build is
    ~13 ms device time for 8x1080p and is wasted when no detection is
    valid) while keeping the trace-time statics available."""
    n, h, w, c = image_shape
    wp_canvas = -(-max(w + 2, WIN_C) // 128) * 128
    level_rows, level_dims = [], []
    offset = 0
    lh, lw = h, w
    for level in range(n_levels):
        if level > 0:
            lh, lw = lh // 2, lw // 2
        hp, wp = lh + 2, lw + 2
        level_rows.append(offset)
        level_dims.append((hp, wp))
        offset += -(-hp // 8) * 8
    canvas_shape = (n, c, (offset + WIN_R) * N_SHIFTS, wp_canvas)
    return np.asarray(level_rows), level_dims, canvas_shape


def build_pyramid_canvas(images: jnp.ndarray, n_levels: int = 3,
                         gamma_decode: bool = False):
    """Channel-major canvas [n, 3, H_tot, Wp] stacking padded pyramid levels
    vertically; returns (canvas, level_rows, level_dims) with level_rows the
    per-level starting row and level_dims the (hp, wp) padded dims.

    The NHWC->channel-major relayout happens ONCE, first (on uint8 when
    `gamma_decode` folds the linearization in — 4x cheaper than transposing
    decoded f32); all pooling/padding then runs in the TPU-friendly layout.
    """
    level_rows, level_dims, canvas_shape = pyramid_canvas_layout(
        images.shape, n_levels)
    wp_canvas = canvas_shape[3]
    chmaj = images.transpose(0, 3, 1, 2)  # the one expensive relayout
    if gamma_decode:
        chmaj = (chmaj.astype(jnp.float32) / 255.0) ** 2.2
    else:
        chmaj = chmaj.astype(jnp.float32)
    padded_levels = []
    cur = chmaj
    for level, (hp, wp) in enumerate(level_dims):
        if level > 0:
            cur = _avg_pool_2x2_chmaj(cur)
        assert (hp, wp) == (cur.shape[2] + 2, cur.shape[3] + 2)
        # Level blocks stay 8-row-aligned so 8-aligned level-local window
        # rows remain 8-aligned canvas rows; 1px zero ring per level.
        block_h = -(-hp // 8) * 8
        lv = jnp.pad(cur, ((0, 0), (0, 0), (1, block_h - cur.shape[2] - 1),
                           (1, wp_canvas - cur.shape[3] - 1)))
        padded_levels.append(lv)
    canvas = jnp.concatenate(padded_levels, axis=2)
    # WIN_R rows of tail padding guarantee every window placement
    # (oy_local <= hp_l - 2 for any level) stays inside the canvas.
    canvas = jnp.pad(canvas, ((0, 0), (0, 0), (0, WIN_R), (0, 0)))
    # N_SHIFTS column-shifted copies stacked along rows: copy s holds the
    # canvas shifted left by SHIFT*s columns, so any SHIFT-aligned window
    # origin is 128-lane-aligned inside copy (origin // SHIFT) % N_SHIFTS —
    # this is what lets WIN_C be 128 instead of 256 (module docstring).
    copies = [canvas] + [
        jnp.pad(canvas[:, :, :, SHIFT * s:],
                ((0, 0), (0, 0), (0, 0), (0, SHIFT * s)))
        for s in range(1, N_SHIFTS)]
    canvas = jnp.concatenate(copies, axis=2)
    assert canvas.shape == canvas_shape, (canvas.shape, canvas_shape)
    return canvas, level_rows, level_dims


def warp_images_with_pyramid_tiled(
        images: jnp.ndarray, intrinsic_matrix: jnp.ndarray,
        new_invprojmat: jnp.ndarray, distortion_coeffs: jnp.ndarray,
        crop_scales: jnp.ndarray, image_ids: jnp.ndarray,
        output_shape: Tuple[int, int], n_pyramid_levels: int = 3,
        interpret: bool = False,
        precision=jax.lax.Precision.HIGHEST,
        pyramid_canvas=None) -> jnp.ndarray:
    """Drop-in equivalent of `warp.warp_images_with_pyramid` on the MXU.

    Requires output_shape divisible by (32, 32) and float32 images.
    `pyramid_canvas`: optional prebuilt (canvas, level_rows, level_dims) from
    `build_pyramid_canvas` — pass it to amortize the pyramid across chunks
    (when set, `images` may be None).
    `precision`: 'f32' | 'bf16x3' | 'bf16x2' | 'bf16' (module docstring),
    also accepts jax.lax.Precision.HIGHEST ('f32') / .DEFAULT ('bf16') for
    compatibility.
    """
    if precision in (jax.lax.Precision.HIGHEST, 'highest', 'f32'):
        precision = 'f32'
    elif precision in (jax.lax.Precision.HIGH, 'high', 'bf16x3'):
        precision = 'bf16x3'
    elif precision == 'bf16x2':
        precision = 'bf16x2'
    elif precision in (jax.lax.Precision.DEFAULT, 'default', 'bf16'):
        precision = 'bf16'
    else:
        # A typo must not silently run the lowest-accuracy kernel.
        raise ValueError(
            f'unknown warp precision {precision!r}; expected one of '
            f"'highest'/'f32', 'high'/'bf16x3', 'bf16x2', 'default'/'bf16'")
    oh, ow = output_shape
    if oh % TR or ow % TC:
        raise ValueError(f'output_shape {output_shape} must tile by {(TR, TC)}')
    n_crops = new_invprojmat.shape[0]
    n_by, n_bx = oh // TR, ow // TC
    n_tiles = n_by * n_bx

    i_levels, k_sel = warp_ops.select_pyramid_level(
        crop_scales, intrinsic_matrix, n_pyramid_levels)

    if pyramid_canvas is None:
        pyramid_canvas = build_pyramid_canvas(
            images.astype(jnp.float32), n_pyramid_levels)
    canvas, level_rows, level_dims = pyramid_canvas

    # Per-tile window origins from the exact coords (computed once in XLA;
    # the kernel recomputes per-pixel coords — identical formula, so a margin
    # of 1px covers float-association differences).
    coords = warp_ops.warp_coords(
        new_invprojmat, k_sel, distortion_coeffs, output_shape)  # [N,oh,ow,2]
    hps = jnp.asarray([d[0] for d in level_dims], jnp.int32)[i_levels]  # [N]
    wps = jnp.asarray([d[1] for d in level_dims], jnp.int32)[i_levels]
    rows0 = jnp.asarray(level_rows, jnp.int32)[i_levels]

    ct = coords.reshape(n_crops, n_by, TR, n_bx, TC, 2)
    tmin = ct.min(axis=(2, 4))  # [N, by, bx, 2]
    xpad_min = jnp.clip(tmin[..., 0] + 1.0, 0.0,
                        wps[:, None, None].astype(jnp.float32) - 1.0)
    ypad_min = jnp.clip(tmin[..., 1] + 1.0, 0.0,
                        hps[:, None, None].astype(jnp.float32) - 1.0)
    h_tot4, w_canvas = canvas.shape[2], canvas.shape[3]
    h_block = h_tot4 // N_SHIFTS  # rows per shifted copy
    # Quantize column origins to SHIFT; the copy whose pre-shift makes the
    # origin 128-aligned is (ox_local // SHIFT) % N_SHIFTS. Rows quantize
    # to the 8-row HBM tiling directly.
    ox_local = jnp.clip(jnp.floor(xpad_min).astype(jnp.int32) - 1, 0,
                        w_canvas - WIN_C) & ~(SHIFT - 1)
    copy = (ox_local // SHIFT) % N_SHIFTS
    ox_dma = ox_local - SHIFT * copy
    oy_local = (jnp.floor(ypad_min).astype(jnp.int32) - 1) & ~7
    oy_local = jnp.clip(oy_local, 0,
                        jnp.maximum(h_block - WIN_R - rows0[:, None, None], 0))
    oy_dma = copy * h_block + rows0[:, None, None] + oy_local

    bcast = lambda v: jnp.broadcast_to(
        v[:, None, None], (n_crops, n_by, n_bx)).reshape(n_crops, n_tiles)
    meta = jnp.stack([
        bcast(image_ids.astype(jnp.int32)),
        oy_dma.reshape(n_crops, n_tiles),
        ox_dma.reshape(n_crops, n_tiles),
        oy_local.reshape(n_crops, n_tiles),
        bcast(wps), bcast(hps),
        ox_local.reshape(n_crops, n_tiles),
        jnp.zeros((n_crops, n_tiles), jnp.int32)], axis=-1)
    meta = meta.reshape(n_crops, n_tiles * 8)  # flat minor axis for SMEM

    dist = pad_distortion_coeffs(distortion_coeffs.astype(jnp.float32))
    params = jnp.concatenate([
        new_invprojmat.reshape(n_crops, 9).astype(jnp.float32),
        k_sel[:, :2, :].reshape(n_crops, 6),
        dist,
        jnp.zeros((n_crops, N_PARAMS - 27), jnp.float32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_crops, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 3, P), lambda n, t, meta: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, WIN_R, WIN_C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    out = pl.pallas_call(
        functools.partial(_warp_tile_kernel, n_bx=n_bx, n_tiles=n_tiles,
                          n_total=n_crops * n_tiles, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_crops, n_tiles, 3, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=8 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_crops * n_tiles * 3 * WIN_R * WIN_C * P,
            bytes_accessed=n_crops * n_tiles * (3 * WIN_R * WIN_C + 3 * P) * 4,
            transcendentals=0),
        interpret=interpret,
    )(meta, params, canvas)

    out = out.reshape(n_crops, n_by, n_bx, 3, TR, TC)
    out = out.transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(n_crops, oh, ow, 3)
