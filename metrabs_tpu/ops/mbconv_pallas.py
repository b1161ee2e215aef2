"""Pallas TPU kernel: fused MBConv inner chain for inference.

The EfficientNetV2 MBConv block (`effnetv2_model.py:97-250`; here
`models/backbones/efficientnet_v2.py::MBConv`) runs, between its two 1x1 MXU
convolutions, a chain of bandwidth-bound ops over the EXPANDED tensor
(4-6x the block width): BN -> silu -> depthwise 3x3 -> BN -> silu ->
SE global mean. XLA:TPU cannot fuse elementwise epilogues into convolution
outputs, so each arrow above is a separate HBM round trip of the expanded
activation — the main reason the crop model sits far below the MXU roofline
(PARITY.md MFU profile).

This kernel performs the whole chain in ONE pass over the expanded tensor:
read a row-tile (body block + 1-row top/bottom halo blocks of the raw
expand-conv output), apply the folded BN0 scale/bias + silu, the 9-tap
depthwise conv (VPU FMAs, f32 accumulation like XLA's conv), folded BN1 +
silu, write the activated output tile, and accumulate the SE spatial sum —
HBM traffic drops from ~4 writes + 5 reads of the expanded tensor per block
to 1 write + ~1.1 reads.

MEASURED NEGATIVE RESULT (v5e, on-device scan timing, 2026-08): at the
EffNetV2-L stage-5 shape [128, 24, 24, 1344] bf16 this kernel runs in
4.11 ms while XLA's UNFUSED chain takes 1.22 ms — i.e. XLA already executes
the chain within ~2.4x of the pure-bandwidth bound (~0.5 ms), and the fused
formulation loses on VPU arithmetic: 9 bf16->f32 tap converts + f32 FMAs +
sublane-shift relayouts + f32 silu cost more than the HBM passes they save.
A bf16-tap variant would trade ~1% depthwise accuracy for an estimated
~1 ms — still not clearly ahead. Hence `fuse_mbconv` defaults to 'off' in
the backbone; the kernel is kept as working, tested infrastructure should a
future toolchain shift the balance (e.g. native bf16 transcendentals).

The halo rows arrive as separate row-clamped BlockSpec inputs over the same
array (Mosaic forbids unaligned lane-dim slices in manual DMAs, and
BlockSpec pipelining double-buffers for free); at image boundaries the
clamped duplicate rows are masked to zero AFTER activation, matching the
SAME zero padding of the depthwise conv on the activated tensor.

Numerics match the unfused flax path at bf16 resolution (BN folded into a
single scale+bias is algebraically identical; silu computed in f32 and
rounded — Mosaic miscompiles bf16-native sigmoid — is within 1 ulp).
Equivalence is tested in interpret mode (tests/test_mbconv_pallas.py) and
the backbone exposes `fuse_mbconv='off'|'auto'|'on'|'interpret'` to select
paths. Inference-only: training keeps the unfused differentiable path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_rows(h: int, w: int, e: int, dtype_bytes: int) -> int:
    """Largest row-tile that divides H and keeps the working set ~<= 8 MB."""
    budget = 8 * 1024 * 1024
    for th in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
        if h % th:
            continue
        # input blocks + padded activation (dtype) + f32 accumulator.
        need = (th + 2) * w * e * dtype_bytes * 2 + th * w * e * 4
        if need <= budget or th == 1:
            return th
    return 1


def _silu(x):
    # Mosaic miscompiles jax.nn.sigmoid on bf16 vectors (f32 scalar
    # broadcast into a bf16 vector); compute in f32 and round back —
    # within 1 ulp of the bf16-native silu the flax path produces.
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _kernel(top_ref, body_ref, bot_ref, w_ref, sb_ref, v_ref, se_ref, *,
            th: int, n_htiles: int, width: int):
    h = pl.program_id(1)
    x = jnp.concatenate([top_ref[0], body_ref[0], bot_ref[0]], axis=0)
    cdt = x.dtype
    # Folded BN0 + silu (flax BatchNorm at dtype=bf16 casts its f32
    # scale/bias to bf16 before applying — match that).
    a = x * sb_ref[0].astype(cdt) + sb_ref[1].astype(cdt)
    a = _silu(a)
    # The dw conv's SAME padding zero-pads the ACTIVATED tensor: at image
    # boundaries the (row-clamped, duplicated) halo rows must become 0.
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, width, 1), 0)
    keep = jnp.logical_and(
        jnp.logical_or(row > 0, h > 0),
        jnp.logical_or(row < th + 1, h < n_htiles - 1))
    a = jnp.where(keep, a, jnp.zeros_like(a))
    a = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))
    # 9-tap depthwise 3x3, f32 accumulation (XLA convs accumulate f32).
    acc = jnp.zeros((th, width, a.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = a[dy:dy + th, dx:dx + width, :].astype(jnp.float32)
            acc = acc + tap * w_ref[dy, dx].astype(jnp.float32)
    v = acc.astype(cdt)
    y = v * sb_ref[2].astype(cdt) + sb_ref[3].astype(cdt)
    y = _silu(y)
    v_ref[0] = y

    @pl.when(h == 0)
    def _():
        se_ref[0] = jnp.zeros_like(se_ref[0])
    # Row 0 of the 8-row block carries the sum (Mosaic requires >= 8
    # sublanes per VMEM block; the other 7 rows are padding).
    se_ref[0, 0] += jnp.sum(y.astype(jnp.float32), axis=(0, 1))


def fused_mbconv_inner(
        u_raw: jnp.ndarray, dw_kernel: jnp.ndarray,
        scale0: jnp.ndarray, bias0: jnp.ndarray,
        scale1: jnp.ndarray, bias1: jnp.ndarray,
        interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """silu(BN1(dw3x3(silu(BN0(u_raw))))) and its spatial mean, in one pass.

    u_raw: [N, H, W, E] raw expand-conv output (pre-BN), bf16 or f32.
    dw_kernel: [3, 3, 1, E] flax depthwise kernel (HWIO, groups=E).
    scale/bias: [E] float32 folded BN constants (gamma*rsqrt(var+eps) and
    beta - mean*scale).
    Returns (v_act [N, H, W, E] in u_raw.dtype, se_mean [N, E] float32).
    """
    n, height, width, e = u_raw.shape
    th = _pick_tile_rows(height, width, e, u_raw.dtype.itemsize)
    n_htiles = height // th
    w3 = dw_kernel.reshape(3, 3, e)
    sb = jnp.stack([scale0, bias0, scale1, bias1]).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, n_htiles),
        in_specs=[
            # Clamped 1-row top halo, th-row body, clamped 1-row bottom halo
            # of the same array; block indices are in units of rows for the
            # halos (block dim 1) and tiles for the body (block dim th).
            pl.BlockSpec((1, 1, width, e),
                         lambda n, h: (n, jnp.maximum(h * th - 1, 0) // 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, width, e), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, width, e),
                         lambda n, h: (n, jnp.minimum(h * th + th, height - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, width, e), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, e), lambda n, h: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ])

    v_act, se_sum = pl.pallas_call(
        functools.partial(_kernel, th=th, n_htiles=n_htiles, width=width),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, height, width, e), u_raw.dtype),
            jax.ShapeDtypeStruct((n, 8, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * height * width * e,
            bytes_accessed=n * height * width * e
            * 2 * u_raw.dtype.itemsize,
            transcendentals=2 * n * height * width * e),
        interpret=interpret,
    )(u_raw, u_raw, u_raw, w3, sb)
    se_mean = se_sum[:, 0, :] / jnp.float32(height * width)
    return v_act, se_mean
