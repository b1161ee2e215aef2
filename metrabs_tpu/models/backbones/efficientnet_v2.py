"""EfficientNetV2 backbones (S/M/L/XL + dilated -stride4/8/16 variants).

From-scratch flax implementation with the architecture semantics of the
reference's google/automl fork (`metrabs_tf/backbones/efficientnet/`):
 - MBConv / FusedMBConv blocks with SE (reduction from BLOCK INPUT filters),
   silu activations, BN momentum 0.9 / eps 1e-3
   (`effnetv2_hparams.py:226-235`, `effnetv2_model.py:97-420`);
 - explicit fixed padding before every spatial conv (VALID convs), with the
   `br` bottom-right shift on the last stride-2 block for centered-stride
   alignment (`effnetv2_model.py:296-299`, `effnetv2_configs.py:155-247`);
 - `-strideN` variants replace late strides with dilations (din/dout per
   stage) to raise feature resolution without memory blowup;
 - stochastic depth with linearly decaying survival probability.

TPU notes: all convs run in bfloat16 with float32 params; XLA maps the
1x1/3x3 convs onto the MXU directly. The final stride-32 feature map at
384px input is 12x12x1280 — the head 1x1 conv feeding MetrabsHeads.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from metrabs_tpu.models.backbones import common
from metrabs_tpu.ops import mbconv_pallas

BN_MOMENTUM = 0.9
BN_EPSILON = 1e-3
SURVIVAL_PROB = 0.8


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    num_repeat: int
    kernel_size: int
    strides: int
    dilation_in: int
    dilation_out: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: Optional[float]
    conv_type: int  # 0 = MBConv, 1 = Fused
    bottomright_stride: bool


def decode_block_string(s: str) -> BlockArgs:
    """Decodes 'r2_k3_s1_din1_dout1_e4_i24_o48_c1[_se0.25][_br]' strings
    (the reference's BlockDecoder grammar, `effnetv2_configs.py:33-100`)."""
    parts = s.split('_')
    opts = {}
    flags = set()
    for p in parts:
        m = re.match(r'([a-z]+)([\d.]+)$', p)
        if m:
            opts[m.group(1)] = m.group(2)
        else:
            flags.add(p)
    return BlockArgs(
        num_repeat=int(opts['r']),
        kernel_size=int(opts['k']),
        strides=int(opts['s']),
        dilation_in=int(opts.get('din', 1)),
        dilation_out=int(opts.get('dout', 1)),
        expand_ratio=int(opts['e']),
        input_filters=int(opts['i']),
        output_filters=int(opts['o']),
        se_ratio=float(opts['se']) if 'se' in opts else None,
        conv_type=int(opts.get('c', 0)),
        bottomright_stride='br' in flags)


# Stage tables transcribed from `effnetv2_configs.py:155-247`.
_V2_S = ['r2_k3_s1_din1_dout1_e1_i24_o24_c1',
         'r4_k3_s2_din1_dout1_e4_i24_o48_c1',
         'r4_k3_s2_din1_dout1_e4_i48_o64_c1',
         'r6_k3_s2_din1_dout1_e4_i64_o128_se0.25',
         'r9_k3_s1_din1_dout1_e6_i128_o160_se0.25',
         'r15_k3_s2_din1_dout1_e6_i160_o256_se0.25_br']
_V2_S_STRIDE16 = ['r2_k3_s1_din1_dout1_e1_i24_o24_c1',
                  'r4_k3_s2_din1_dout1_e4_i24_o48_c1',
                  'r4_k3_s2_din1_dout1_e4_i48_o64_c1',
                  'r6_k3_s2_din1_dout1_e4_i64_o128_se0.25_br',
                  'r9_k3_s1_din1_dout1_e6_i128_o160_se0.25',
                  'r15_k3_s1_din1_dout2_e6_i160_o256_se0.25']
_V2_S_STRIDE8 = ['r2_k3_s1_din1_dout1_e1_i24_o24_c1',
                 'r4_k3_s2_din1_dout1_e4_i24_o48_c1',
                 'r4_k3_s2_din1_dout1_e4_i48_o64_c1_br',
                 'r6_k3_s1_din1_dout2_e4_i64_o128_se0.25',
                 'r9_k3_s1_din2_dout2_e6_i128_o160_se0.25',
                 'r15_k3_s1_din2_dout4_e6_i160_o256_se0.25']
_V2_S_STRIDE4 = ['r2_k3_s1_din1_dout1_e1_i24_o24_c1',
                 'r4_k3_s2_din1_dout1_e4_i24_o48_c1_br',
                 'r4_k3_s1_din1_dout2_e4_i48_o64_c1',
                 'r6_k3_s1_din2_dout4_e4_i64_o128_se0.25',
                 'r9_k3_s1_din4_dout4_e6_i128_o160_se0.25',
                 'r15_k3_s1_din4_dout8_e6_i160_o256_se0.25']
_V2_M = ['r3_k3_s1_din1_dout1_e1_i24_o24_c1',
         'r5_k3_s2_din1_dout1_e4_i24_o48_c1',
         'r5_k3_s2_din1_dout1_e4_i48_o80_c1',
         'r7_k3_s2_din1_dout1_e4_i80_o160_se0.25',
         'r14_k3_s1_din1_dout1_e6_i160_o176_se0.25',
         'r18_k3_s2_din1_dout1_e6_i176_o304_se0.25_br',
         'r5_k3_s1_din1_dout1_e6_i304_o512_se0.25']
_V2_L = ['r4_k3_s1_din1_dout1_e1_i32_o32_c1',
         'r7_k3_s2_din1_dout1_e4_i32_o64_c1',
         'r7_k3_s2_din1_dout1_e4_i64_o96_c1',
         'r10_k3_s2_din1_dout1_e4_i96_o192_se0.25',
         'r19_k3_s1_din1_dout1_e6_i192_o224_se0.25',
         'r25_k3_s2_din1_dout1_e6_i224_o384_se0.25_br',
         'r7_k3_s1_din1_dout1_e6_i384_o640_se0.25']
_V2_L_STRIDE16 = ['r4_k3_s1_din1_dout1_e1_i32_o32_c1',
                  'r7_k3_s2_din1_dout1_e4_i32_o64_c1',
                  'r7_k3_s2_din1_dout1_e4_i64_o96_c1',
                  'r10_k3_s2_din1_dout1_e4_i96_o192_se0.25_br',
                  'r19_k3_s1_din1_dout1_e6_i192_o224_se0.25',
                  'r25_k3_s1_din1_dout2_e6_i224_o384_se0.25',
                  'r7_k3_s1_din2_dout2_e6_i384_o640_se0.25']
_V2_L_STRIDE8 = ['r4_k3_s1_din1_dout1_e1_i32_o32_c1',
                 'r7_k3_s2_din1_dout1_e4_i32_o64_c1',
                 'r7_k3_s2_din1_dout1_e4_i64_o96_c1_br',
                 'r10_k3_s1_din1_dout2_e4_i96_o192_se0.25',
                 'r19_k3_s1_din2_dout2_e6_i192_o224_se0.25',
                 'r25_k3_s1_din2_dout4_e6_i224_o384_se0.25',
                 'r7_k3_s1_din4_dout4_e6_i384_o640_se0.25']
_V2_L_STRIDE4 = ['r4_k3_s1_din1_dout1_e1_i32_o32_c1',
                 'r7_k3_s2_din1_dout1_e4_i32_o64_c1_br',
                 'r7_k3_s1_din1_dout2_e4_i64_o96_c1',
                 'r10_k3_s1_din2_dout4_e4_i96_o192_se0.25',
                 'r19_k3_s1_din4_dout4_e6_i192_o224_se0.25',
                 'r25_k3_s1_din4_dout8_e6_i224_o384_se0.25',
                 'r7_k3_s1_din8_dout8_e6_i384_o640_se0.25']
_V2_XL = ['r4_k3_s1_din1_dout1_e1_i32_o32_c1',
          'r8_k3_s2_din1_dout1_e4_i32_o64_c1',
          'r8_k3_s2_din1_dout1_e4_i64_o96_c1',
          'r16_k3_s2_din1_dout1_e4_i96_o192_se0.25',
          'r24_k3_s1_din1_dout1_e6_i192_o256_se0.25',
          'r32_k3_s2_din1_dout1_e6_i256_o512_se0.25_br',
          'r8_k3_s1_din1_dout1_e6_i512_o640_se0.25']

# name -> (stage strings, width_coefficient, depth_coefficient)
EFFNETV2_PARAMS = {
    'efficientnetv2-s': (_V2_S, 1.0, 1.0),
    'efficientnetv2-s-stride4': (_V2_S_STRIDE4, 1.0, 1.0),
    'efficientnetv2-s-stride8': (_V2_S_STRIDE8, 1.0, 1.0),
    'efficientnetv2-s-stride16': (_V2_S_STRIDE16, 1.0, 1.0),
    'efficientnetv2-m': (_V2_M, 1.0, 1.0),
    'efficientnetv2-l': (_V2_L, 1.0, 1.0),
    'efficientnetv2-l-stride4': (_V2_L_STRIDE4, 1.0, 1.0),
    'efficientnetv2-l-stride8': (_V2_L_STRIDE8, 1.0, 1.0),
    'efficientnetv2-l-stride16': (_V2_L_STRIDE16, 1.0, 1.0),
    'efficientnetv2-xl': (_V2_XL, 1.0, 1.0),
}


def round_filters(filters: float, width_coefficient: float,
                  divisor: int = 8, min_depth: int = 8) -> int:
    if not width_coefficient:
        return int(filters)
    filters *= width_coefficient
    new_filters = max(min_depth, int(filters + divisor / 2) // divisor * divisor)
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    return int(math.ceil(depth_coefficient * repeats))


def expand_blocks(model_name: str) -> List[BlockArgs]:
    """Expands stage strings into one BlockArgs per layer, applying the
    first-block-carries-stride rule (`effnetv2_model.py:574-600`)."""
    stage_strings, width, depth = EFFNETV2_PARAMS[model_name]
    blocks = []
    for s in stage_strings:
        args = decode_block_string(s)
        in_f = round_filters(args.input_filters, width)
        out_f = round_filters(args.output_filters, width)
        repeats = round_repeats(args.num_repeat, depth)
        first = dataclasses.replace(
            args, input_filters=in_f, output_filters=out_f, num_repeat=1,
            dilation_in=args.dilation_in, dilation_out=args.dilation_out)
        blocks.append(first)
        rest = dataclasses.replace(
            first, input_filters=out_f, strides=1, bottomright_stride=False,
            dilation_in=args.dilation_out)
        blocks.extend([rest] * (repeats - 1))
    return blocks


class SqueezeExcite(nn.Module):
    se_filters: int
    output_filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, precomputed_mean=None) -> jnp.ndarray:
        """`precomputed_mean` [N, 1, 1, C]: spatial mean already reduced (by
        the fused MBConv kernel) — skips the in-module reduction."""
        if precomputed_mean is None:
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            se = precomputed_mean.astype(x.dtype)
        se = nn.Conv(self.se_filters, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name='reduce')(se)
        se = nn.silu(se)
        se = nn.Conv(self.output_filters, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name='expand')(se)
        return jnp.asarray(nn.sigmoid(se), x.dtype) * x


class MBConv(nn.Module):
    args: BlockArgs
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    # 'off' | 'auto' | 'on' | 'interpret': use the fused Pallas inner chain
    # (ops/mbconv_pallas.py) at inference. 'auto' = on TPU only. The
    # parameter tree is identical either way.
    fuse: str = 'off'
    # Inference-only folded-BN layout (io/bn_fold.py): convs carry a bias,
    # BN modules are skipped entirely. Variables must come from
    # fold_bn_variables.
    bn_fold: bool = False
    # Batch statistics in bf16 (training-MFU lever; common.GhostBatchNorm).
    bn_bf16_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, survival_prob=1.0,
                 train: bool = False) -> jnp.ndarray:
        a = self.args
        inputs = x
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only layout')
        filters = a.input_filters * a.expand_ratio
        bn = lambda name: common.batch_norm(
            BN_MOMENTUM, BN_EPSILON, self.dtype, name, self.ghost_splits,
            bf16_stats=self.bn_bf16_stats)
        norm = (lambda name, h: h if self.bn_fold else bn(name)(h, train))
        use_fused = (
            not train and not self.bn_fold
            and a.expand_ratio != 1 and a.kernel_size == 3
            and a.strides == 1 and a.dilation_in == 1
            and not a.bottomright_stride
            and (self.fuse in ('on', 'interpret')
                 or (self.fuse == 'auto'
                     and jax.default_backend() == 'tpu')))
        if use_fused:
            u = nn.Conv(filters, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name='expand_conv')(x)
            scale0, bias0 = bn('norm0')(u, train=False, fold=True)
            dw = nn.Conv(
                filters, (a.kernel_size, a.kernel_size), strides=(1, 1),
                feature_group_count=filters, padding='VALID', use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
                name='depthwise_conv')
            dw(jnp.zeros((1, 3, 3, filters), self.dtype))  # declare variables
            dw_kernel = dw.variables['params']['kernel']
            scale1, bias1 = bn('norm1')(u, train=False, fold=True)
            x, se_mean = mbconv_pallas.fused_mbconv_inner(
                u, dw_kernel, scale0, bias0, scale1, bias1,
                interpret=self.fuse == 'interpret')
            if a.se_ratio:
                se_filters = max(1, int(a.input_filters * a.se_ratio))
                x = SqueezeExcite(se_filters, filters, dtype=self.dtype,
                                  name='se')(x, se_mean[:, None, None, :])
        else:
            if a.expand_ratio != 1:
                x = nn.Conv(filters, (1, 1), use_bias=self.bn_fold,
                            dtype=self.dtype,
                            param_dtype=jnp.float32, name='expand_conv')(x)
                x = nn.silu(norm('norm0', x))
            shift = 1 if a.bottomright_stride else 0
            pads = common.fixed_padding_amounts(a.kernel_size, a.dilation_in, shift)
            x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
            x = nn.Conv(
                filters, (a.kernel_size, a.kernel_size),
                strides=(a.strides, a.strides),
                kernel_dilation=(a.dilation_in, a.dilation_in),
                feature_group_count=filters, padding='VALID',
                use_bias=self.bn_fold,
                dtype=self.dtype, param_dtype=jnp.float32, name='depthwise_conv')(x)
            x = nn.silu(norm('norm1', x))
            if a.se_ratio:
                se_filters = max(1, int(a.input_filters * a.se_ratio))
                x = SqueezeExcite(se_filters, filters, dtype=self.dtype, name='se')(x)
        x = nn.Conv(a.output_filters, (1, 1), use_bias=self.bn_fold,
                    dtype=self.dtype,
                    param_dtype=jnp.float32, name='project_conv')(x)
        x = norm('norm2', x)
        if a.strides == 1 and a.input_filters == a.output_filters:
            rng = self.make_rng('dropout') if train else None
            x = common.stochastic_depth(inputs, x, survival_prob, train, rng)
        return x


class FusedMBConv(nn.Module):
    args: BlockArgs
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    # Inference-only folded-BN layout (io/bn_fold.py); see MBConv.
    bn_fold: bool = False
    # Batch statistics in bf16 (training-MFU lever; common.GhostBatchNorm).
    bn_bf16_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, survival_prob=1.0,
                 train: bool = False) -> jnp.ndarray:
        a = self.args
        inputs = x
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only layout')
        filters = a.input_filters * a.expand_ratio
        bn = lambda name: common.batch_norm(
            BN_MOMENTUM, BN_EPSILON, self.dtype, name, self.ghost_splits,
            bf16_stats=self.bn_bf16_stats)
        norm = (lambda name, h: h if self.bn_fold else bn(name)(h, train))
        shift = 1 if a.bottomright_stride else 0
        pads = common.fixed_padding_amounts(a.kernel_size, a.dilation_in, shift)
        if a.expand_ratio != 1:
            x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
            x = nn.Conv(
                filters, (a.kernel_size, a.kernel_size),
                strides=(a.strides, a.strides),
                kernel_dilation=(a.dilation_in, a.dilation_in),
                padding='VALID', use_bias=self.bn_fold, dtype=self.dtype,
                param_dtype=jnp.float32, name='expand_conv')(x)
            x = nn.silu(norm('norm0', x))
        if a.se_ratio:
            se_filters = max(1, int(a.input_filters * a.se_ratio))
            x = SqueezeExcite(se_filters, filters, dtype=self.dtype, name='se')(x)
        if a.expand_ratio == 1:
            x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
        x = nn.Conv(
            a.output_filters,
            (1, 1) if a.expand_ratio != 1 else (a.kernel_size, a.kernel_size),
            strides=(1, 1) if a.expand_ratio != 1 else (a.strides, a.strides),
            kernel_dilation=((1, 1) if a.expand_ratio != 1
                             else (a.dilation_in, a.dilation_in)),
            padding='VALID', use_bias=self.bn_fold, dtype=self.dtype,
            param_dtype=jnp.float32, name='project_conv')(x)
        x = norm('norm1', x)
        if a.expand_ratio == 1:
            x = nn.silu(x)
        if a.strides == 1 and a.input_filters == a.output_filters:
            rng = self.make_rng('dropout') if train else None
            x = common.stochastic_depth(inputs, x, survival_prob, train, rng)
        return x


class _ScanBody(nn.Module):
    """Scan wrapper: carry = feature map, scanned input = survival prob."""
    args: BlockArgs
    ghost_splits: int
    dtype: Any
    train: bool
    fuse: str = 'off'
    bn_fold: bool = False
    bn_bf16_stats: bool = False

    @nn.compact
    def __call__(self, carry, survival_prob):
        cls = FusedMBConv if self.args.conv_type == 1 else MBConv
        kw = {} if self.args.conv_type == 1 else dict(fuse=self.fuse)
        y = cls(args=self.args, ghost_splits=self.ghost_splits,
                dtype=self.dtype, name='block', bn_fold=self.bn_fold,
                bn_bf16_stats=self.bn_bf16_stats, **kw)(
            carry, survival_prob, train=self.train)
        return y, None


class EfficientNetV2(nn.Module):
    """[N, S, S, 3] gamma-space [0,1] RGB -> [N, S/32, S/32, 1280] features
    (or higher resolution for -strideN variants)."""

    model_name: str = 'efficientnetv2-s'
    # Test-time plan name (e.g. the -stride16 dilated variant of the same
    # family); None means same as training. All -strideN variants of a family
    # share filters/counts (only s/d/br flags differ), so the parameter tree
    # is identical and one set of weights serves both plans (the reference's
    # TrainTestSwitchLayer recipe, `resnet.py:31-32`).
    model_name_test: Optional[str] = None
    centered_stride: bool = True
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    feature_size: int = 1280
    # Stack within-stage repeated blocks with nn.scan (compile-time win);
    # set False for a flat blocks_{i} param tree (weight-import layout).
    scan_blocks: bool = True
    # Fused MBConv inner chain at inference (ops/mbconv_pallas.py):
    # 'off' | 'auto' (TPU only) | 'on' | 'interpret'. Same parameter tree.
    # Default OFF: measured on v5e, XLA's unfused chain is ~3x faster than
    # the Pallas fusion (1.2 vs 4.1 ms at [128,24,24,1344] — see the
    # ops/mbconv_pallas.py docstring for the full negative result).
    fuse_mbconv: str = 'off'
    # Rematerialize every block in the backward pass (jax.checkpoint per
    # block / per scanned stage): stores only block boundaries forward and
    # recomputes interiors during backprop — the standard TPU HBM lever
    # that trades ~1/3 extra FLOPs for O(1)-per-block activation memory.
    # Parameter tree is identical either way (verified: lifted remat does
    # not alter variable structure).
    remat: bool = False
    # Partial-remat boundary: blocks with index < remat_until_block are
    # rematerialized, later ones checkpoint normally. Conv nets have no
    # useful dot-targeted jax.checkpoint policy (the FLOPs are in
    # conv_general_dilated, which the dots_* policies ignore), but
    # activation MEMORY is dominated by the early high-resolution stages —
    # so the policy lever that actually exists on this workload is WHERE
    # remat stops. 10_000 = everywhere (the default full-block remat).
    remat_until_block: int = 10_000
    # Inference-only folded-BN serving layout (io/bn_fold.py): every conv
    # carries a bias, no BN modules. Variables from fold_bn_variables.
    bn_fold: bool = False
    # Training-MFU lever: compute BN batch statistics in bf16 instead of
    # flax's f32 reductions (common.GhostBatchNorm.bf16_stats). Identical
    # variable tree; accuracy bound in tests/test_bn_bf16_stats.py.
    bn_bf16_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only layout')
        plan = (self.model_name if train or not self.model_name_test
                else self.model_name_test)
        blocks = expand_blocks(plan)
        if not self.centered_stride:
            # The `br` bottom-right shifts exist to center-align features;
            # without centered stride they are dropped (vanilla automl /
            # torchvision alignment).
            blocks = [dataclasses.replace(b, bottomright_stride=False)
                      for b in blocks]
        x = common.tf_preproc(x.astype(self.dtype))

        # Stem: fixed pad + VALID 3x3 s2 (`effnetv2_model.py:440-468`).
        pads = common.fixed_padding_amounts(3)
        h = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
        h = nn.Conv(blocks[0].input_filters, (3, 3), strides=(2, 2),
                    padding='VALID', use_bias=self.bn_fold, dtype=self.dtype,
                    param_dtype=jnp.float32, name='stem_conv')(h)
        if not self.bn_fold:
            h = common.batch_norm(
                BN_MOMENTUM, BN_EPSILON, self.dtype, 'stem_bn',
                self.ghost_splits, bf16_stats=self.bn_bf16_stats)(h, train)
        h = nn.silu(h)

        n_blocks = len(blocks)
        drop_rate = 1.0 - SURVIVAL_PROB
        survival = [1.0 - drop_rate * float(i) / n_blocks for i in range(n_blocks)]

        def fuse_kw(args):
            kw = {} if args.conv_type == 1 else dict(fuse=self.fuse_mbconv)
            kw['bn_fold'] = self.bn_fold
            kw['bn_bf16_stats'] = self.bn_bf16_stats
            return kw

        def block_for(args, idx):
            cls = FusedMBConv if args.conv_type == 1 else MBConv
            if self.remat and idx < self.remat_until_block:
                # train is positional argnum 3 (self=0); it drives Python
                # control flow inside the block so it must be static.
                return nn.remat(cls, static_argnums=(3,), prevent_cse=False)
            return cls

        def scan_body_for(idx):
            if self.remat and idx < self.remat_until_block:
                return nn.remat(_ScanBody, prevent_cse=False)
            return _ScanBody

        if not self.scan_blocks:
            for idx, args in enumerate(blocks):
                h = block_for(args, idx)(
                    args=args, ghost_splits=self.ghost_splits,
                    dtype=self.dtype, name=f'blocks_{idx}',
                    **fuse_kw(args))(
                    h, survival[idx], train)
        else:
            # Stage-wise: the first block of each stage is standalone (it may
            # change stride/filters); the remaining identical blocks are ONE
            # nn.scan'd module. This collapses XLA program size: compile time
            # for EffNetV2-L drops from tens of minutes to ~1 minute on the
            # tunnel compiler, at negligible runtime cost (the standard
            # big-model layer-stacking pattern).
            idx = 0
            while idx < n_blocks:
                args = blocks[idx]
                h = block_for(args, idx)(
                    args=args, ghost_splits=self.ghost_splits,
                    dtype=self.dtype, name=f'blocks_{idx}',
                    **fuse_kw(args))(
                    h, survival[idx], train)
                idx += 1
                n_rest = 0
                while idx + n_rest < n_blocks and blocks[idx + n_rest] == dataclasses.replace(
                        args, input_filters=args.output_filters, strides=1,
                        bottomright_stride=False, dilation_in=args.dilation_out):
                    n_rest += 1
                if n_rest >= 2:
                    rest_args = blocks[idx]
                    sp = jnp.asarray(survival[idx:idx + n_rest], jnp.float32)
                    scanned = nn.scan(
                        scan_body_for(idx),
                        variable_axes={'params': 0, 'batch_stats': 0},
                        split_rngs={'params': True, 'dropout': True},
                        in_axes=(0,), length=n_rest,
                        metadata_params={nn.PARTITION_NAME: None})(
                        args=rest_args, ghost_splits=self.ghost_splits,
                        dtype=self.dtype, train=train,
                        fuse=self.fuse_mbconv, bn_fold=self.bn_fold,
                        bn_bf16_stats=self.bn_bf16_stats,
                        name=f'blocks_{idx}_scan{n_rest}')
                    h, _ = scanned(h, sp)
                    idx += n_rest
                elif n_rest == 1:
                    h = block_for(blocks[idx], idx)(
                        args=blocks[idx], ghost_splits=self.ghost_splits,
                        dtype=self.dtype, name=f'blocks_{idx}',
                        **fuse_kw(blocks[idx]))(
                        h, survival[idx], train)
                    idx += 1

        # Head: 1x1 conv to feature_size (`effnetv2_model.py:469-532`).
        h = nn.Conv(self.feature_size, (1, 1), use_bias=self.bn_fold,
                    dtype=self.dtype,
                    param_dtype=jnp.float32, name='head_conv')(h)
        if not self.bn_fold:
            h = common.batch_norm(
                BN_MOMENTUM, BN_EPSILON, self.dtype, 'head_bn',
                self.ghost_splits, bf16_stats=self.bn_bf16_stats)(h, train)
        return nn.silu(h)
