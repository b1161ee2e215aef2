"""ResNet backbones (18/34/50/101/152, V1 / V1.5 / V2) in flax.

Architecture semantics follow the reference's Keras fork
(`metrabs_tf/backbones/resnet.py`) including its unified striding system:
 - every strided/dilated conv is "dense-SAME + subsample": explicit symmetric
   fixed padding + VALID conv, so the sampling grid is center-aligned at any
   stride (the fleras Conv2DDenseSame behavior), optionally with a
   bottom-right shift on the last strided stage for centered-stride
   alignment (`get_strides_and_dilations`, `resnet.py:601-619`);
 - output_stride in {4, 8, 16, 32}: late strides are converted to dilations
   (dil_in for the strided block's first conv, dil_out afterwards);
 - V1: stride in the FIRST block of conv3/4/5 (on the 1x1 for V1, on the 3x3
   for V1.5); V2 (preact): stride in the LAST block of conv2/3/4;
 - BN eps 1e-5 / momentum 0.997 (`resnet.py:73-74`).

Train/test stride splitting (the fleras TrainTestSwitchLayer /
Conv2DDenseSame machinery, `resnet.py:31-32,626-627`) is expressed through
the `train` flag: the stride/dilation plan is chosen at trace time from
`output_stride` (train) vs `output_stride_test`, while the parameter tree is
identical for both plans (stride/dilation never change kernel shapes), so the
same weights serve both graphs — the high-res fine-tune recipe of
`docs/TRAINING.md:17-23`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.models.backbones import common

BN_MOMENTUM = 0.997
BN_EPSILON = 1e-5


def get_strides_and_dilations(output_stride: int, centered_stride: bool):
    """Stride/dilation plan for the three strided stages (`resnet.py:601-619`)."""
    brs = [False, False, False]
    i_last_strided = int(np.round(np.log2(output_stride))) - 3
    if centered_stride and i_last_strided >= 0:
        brs[i_last_strided] = True
    dil_in = [1, 1, 1]
    dil_out = [1, 1, 1]
    strides = [2, 2, 2]
    i_first_nonstrided = i_last_strided + 1
    for i in range(max(0, i_first_nonstrided), 3):
        strides[i] = 1
        dil_in[i] = 2 ** (i - i_first_nonstrided)
        dil_out[i] = dil_in[i] * 2
    return strides, dil_in, dil_out, brs


class DenseSameConv(nn.Module):
    """Center-aligned strided conv: dense-SAME evaluation then subsampling,
    via explicit fixed padding + VALID conv. With `bottomright`, the sampling
    grid shifts one pixel down-right (crop-begin/pad-end when padding would
    go negative, e.g. 1x1 kernels)."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    bottomright: bool = False
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shift = 1 if (self.bottomright and self.stride > 1) else 0
        (pt, pb), (pl, pr) = common.fixed_padding_amounts(
            self.kernel, self.dilation, shift)
        if pt < 0 or pl < 0:
            x = x[:, -pt if pt < 0 else 0:, -pl if pl < 0 else 0:, :]
            pt, pl = max(pt, 0), max(pl, 0)
        if pt or pb or pl or pr:
            x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding='VALID', use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name='conv')(x)


def _norm_factory(use_group_norm: bool, dtype, ghost_splits: int):
    """BatchNorm (ghost-capable) or GroupNorm per the reference's
    `use_group_norm` switch (`resnet.py:260-268`; the published
    resnet50v1_5_groupnorm weights). With GN, convs drop their bias
    (`resnet.py:270` use_bias = not use_group_norm)."""
    if use_group_norm:
        return lambda name: common.GroupNormCompat(
            epsilon=BN_EPSILON, dtype=dtype, name=name)
    return lambda name: common.batch_norm(
        BN_MOMENTUM, BN_EPSILON, dtype, name, ghost_splits)


class BottleneckBlock(nn.Module):
    """V1/V1.5 bottleneck (`resnet.py:239-319`)."""

    filters: int
    stride: int = 1
    dilation: int = 1
    bottomright: bool = False
    conv_shortcut: bool = True
    v1_5: bool = False
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    use_group_norm: bool = False
    # Inference-only folded-BN layout (io/bn_fold.py): BN skipped, its
    # affine folded into the (already-biased) convs' weights.
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = _norm_factory(self.use_group_norm, self.dtype, self.ghost_splits)
        norm = (lambda name, h: h if self.bn_fold else bn(name)(h, train))
        bias = not self.use_group_norm
        if self.conv_shortcut:
            shortcut = DenseSameConv(
                4 * self.filters, 1, stride=self.stride, use_bias=bias,
                bottomright=self.bottomright, dtype=self.dtype, name='conv0')(x)
            shortcut = norm('bn0', shortcut)
        else:
            shortcut = x

        if self.v1_5:
            h = nn.Conv(self.filters, (1, 1), use_bias=bias, dtype=self.dtype,
                        param_dtype=jnp.float32, name='conv1')(x)
        else:
            h = DenseSameConv(
                self.filters, 1, stride=self.stride, bottomright=self.bottomright,
                use_bias=bias, dtype=self.dtype, name='conv1')(x)
        h = nn.relu(norm('bn1', h))

        if self.v1_5:
            h = DenseSameConv(
                self.filters, 3, stride=self.stride, dilation=self.dilation,
                bottomright=self.bottomright, use_bias=bias, dtype=self.dtype,
                name='conv2')(h)
        else:
            h = DenseSameConv(
                self.filters, 3, stride=1, dilation=self.dilation,
                use_bias=bias, dtype=self.dtype, name='conv2')(h)
        h = nn.relu(norm('bn2', h))

        h = nn.Conv(4 * self.filters, (1, 1), use_bias=bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv3')(h)
        h = norm('bn3', h)
        return nn.relu(shortcut + h)


class BasicBlock(nn.Module):
    """ResNet-18/34 basic block (`resnet.py:322-390`); GroupNorm per the
    reference's use_group_norm switch (`resnet.py:674-693`
    stack1_basic_dense).

    `dilation2` is the second 3x3 conv's dilation: the reference applies a
    test-time correction `dil_out_test * strides_train / strides_test` there
    (`resnet.py:377-383`) — when a training stride-2 is removed at test
    time, conv2's grid is 2x denser and its dilation doubles to keep the
    receptive field. Defaults to `dilation` (the train-graph value)."""

    filters: int
    stride: int = 1
    dilation: int = 1
    dilation2: Optional[int] = None
    bottomright: bool = False
    conv_shortcut: bool = True
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    use_group_norm: bool = False
    # Inference-only folded-BN layout (io/bn_fold.py): convs gain a bias,
    # BN modules are skipped.
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = _norm_factory(self.use_group_norm, self.dtype, self.ghost_splits)
        norm = (lambda name, h: h if self.bn_fold else bn(name)(h, train))
        if self.conv_shortcut:
            shortcut = DenseSameConv(
                self.filters, 1, stride=self.stride, bottomright=self.bottomright,
                use_bias=self.bn_fold, dtype=self.dtype, name='conv0')(x)
            shortcut = norm('bn0', shortcut)
        else:
            shortcut = x
        h = DenseSameConv(
            self.filters, 3, stride=self.stride, dilation=self.dilation,
            bottomright=self.bottomright, use_bias=self.bn_fold,
            dtype=self.dtype,
            name='conv1')(x)
        h = nn.relu(norm('bn1', h))
        h = DenseSameConv(
            self.filters, 3, stride=1,
            dilation=(self.dilation2 if self.dilation2 is not None
                      else self.dilation),
            use_bias=self.bn_fold, dtype=self.dtype, name='conv2')(h)
        h = norm('bn2', h)
        return nn.relu(shortcut + h)


class PreactBlock(nn.Module):
    """V2 preactivation bottleneck (`resnet.py:392-458`)."""

    filters: int
    stride: int = 1
    dilation: int = 1
    bottomright: bool = False
    conv_shortcut: bool = False
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: common.batch_norm(
            BN_MOMENTUM, BN_EPSILON, self.dtype, name, self.ghost_splits)
        preact = nn.relu(bn('preact_bn')(x, train))
        if self.conv_shortcut:
            shortcut = DenseSameConv(
                4 * self.filters, 1, stride=self.stride,
                bottomright=self.bottomright, dtype=self.dtype, name='conv0')(preact)
        else:
            shortcut = x
            if self.stride > 1:
                if self.bottomright:
                    shortcut = shortcut[:, 1:, 1:, :]
                shortcut = shortcut[:, ::self.stride, ::self.stride, :]
        h = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv1')(preact)
        h = nn.relu(bn('bn1')(h, train))
        h = DenseSameConv(
            self.filters, 3, stride=self.stride, dilation=self.dilation,
            bottomright=self.bottomright, use_bias=False, dtype=self.dtype,
            name='conv2')(h)
        h = nn.relu(bn('bn2')(h, train))
        h = nn.Conv(4 * self.filters, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv3')(h)
        return shortcut + h


BLOCK_COUNTS = {
    18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
    101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}


class ResNet(nn.Module):
    """[N, S, S, 3] gamma-space [0,1] RGB -> [N, S/os, S/os, C] features.

    `variant`: '' (V1), 'v1_5' or 'v2'. Depths 18/34 are always the basic-
    block architecture (no V1.5/V2 distinction, `resnet.py:672-673`).
    Preprocessing per family matches `builder.py:41-48`: caffe for V1,
    torch for V1.5, tf for V2.
    """

    depth: int = 50
    variant: str = ''
    output_stride: int = 32
    # Test-time output stride; None means same as training. The param tree is
    # stride-independent, so one set of weights serves both plans.
    output_stride_test: Optional[int] = None
    centered_stride: bool = True
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    # GroupNorm instead of BatchNorm (the reference's resnet50v1_5_groupnorm
    # released variant); convs then drop their bias.
    use_group_norm: bool = False
    # Rematerialize each residual block in the backward pass
    # (jax.checkpoint): ~1/3 extra FLOPs for O(1)-per-block activation
    # memory. Identical parameter tree.
    remat: bool = False
    # Inference-only folded-BN serving layout (io/bn_fold.py). V1/V1.5 and
    # basic blocks only — V2's pre-activation BNs sit behind a relu and
    # cannot fold; GroupNorm statistics are data-dependent.
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        basic = self.depth in (18, 34)
        v2 = self.variant == 'v2' and not basic
        v1_5 = self.variant == 'v1_5' and not basic
        if self.bn_fold and (train or v2 or self.use_group_norm):
            raise ValueError('bn_fold is inference-only and supports '
                             'V1/V1.5/basic BatchNorm ResNets only')
        counts = BLOCK_COUNTS[self.depth]
        output_stride = (self.output_stride if train or not self.output_stride_test
                         else self.output_stride_test)
        strides, dil_in, dil_out, brs = get_strides_and_dilations(
            output_stride, self.centered_stride)
        # The TRAIN plan's strides also shape the test graph: the reference's
        # basic-block conv2 test dilation is dil_out_test * strides_train /
        # strides_test (`resnet.py:377-383`). Equal plans give factor 1.
        strides_train_plan = get_strides_and_dilations(
            self.output_stride, self.centered_stride)[0]

        bn = _norm_factory(self.use_group_norm, self.dtype, self.ghost_splits)
        if self.remat:
            # train (positional argnum 2; self=0) drives Python control flow
            # in the blocks, so it must be static under jax.checkpoint.
            maybe_remat = lambda cls: nn.remat(
                cls, static_argnums=(2,), prevent_cse=False)
        else:
            maybe_remat = lambda cls: cls
        x = x.astype(self.dtype)
        if v2:
            x = common.tf_preproc(x)
        elif v1_5:
            x = common.torch_preproc(x)
        else:
            x = common.caffe_preproc(x)

        # Stem: pad (3,3) + 7x7 s2 VALID + (pad (1,1) + maxpool 3 s2).
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding='VALID',
                    use_bias=((not basic and not self.use_group_norm)
                              or self.bn_fold),
                    dtype=self.dtype,
                    param_dtype=jnp.float32, name='stem_conv')(h)
        if not v2:
            if not self.bn_fold:
                h = nn.relu(bn('stem_bn')(h, train))
            else:
                h = nn.relu(h)
        # Bottom-right maxpool shift: TEST-graph-only and gated on the test
        # stride alone (`resnet.py:186-193,666`: bottomright_maxpool_test =
        # stride_test == 4 inside a TrainTestSwitchLayer whose train branch
        # is always the symmetric pad — independent of centered_stride).
        # ZERO padding, not -inf: the reference pads with ZeroPadding2D
        # before the VALID maxpool (`resnet.py:187-194`), so border windows
        # max AGAINST 0. Equivalent after V1's stem relu (inputs >= 0), but
        # semantically different for V2's preact stem where the raw conv
        # output enters the pool (negative border values clamp to 0 in the
        # reference) — caught by the executed-keras oracle
        # (tests/test_tf_oracle_backbone.py, resnet50v2).
        stride_test_eff = self.output_stride_test or self.output_stride
        if not train and stride_test_eff == 4:
            h = jnp.pad(h, ((0, 0), (0, 2), (0, 2), (0, 0)))
        else:
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding='VALID')

        stage_filters = [64, 128, 256, 512]
        if basic:
            for si, (filters, blocks) in enumerate(zip(stage_filters, counts)):
                for b in range(blocks):
                    first = b == 0
                    if si == 0:
                        stride, dil, br = 1, dil_in[0], False
                        # Stage 0 of ResNet-18/34 always uses identity
                        # shortcuts (conv1_shortcut=False, `resnet.py:691`).
                        conv_short = False
                        dil2 = dil
                    else:
                        stride = strides[si - 1] if first else 1
                        dil = dil_out[si - 1]
                        br = brs[si - 1] if first else False
                        conv_short = first
                        # First block's conv2 test-dilation correction
                        # (`resnet.py:377-383`); with train==test plans the
                        # factor is 1 and this is just `dil`.
                        dil2 = (int(dil * strides_train_plan[si - 1]
                                    / strides[si - 1]) if first else dil)
                    h = maybe_remat(BasicBlock)(
                        filters=filters, stride=stride, dilation=dil,
                        dilation2=dil2, bottomright=br,
                        conv_shortcut=conv_short,
                        ghost_splits=self.ghost_splits, dtype=self.dtype,
                        use_group_norm=self.use_group_norm,
                        bn_fold=self.bn_fold,
                        name=f'stage{si}_block{b}')(h, train)
        elif v2:
            for si, (filters, blocks) in enumerate(zip(stage_filters, counts)):
                for b in range(blocks):
                    first = b == 0
                    last = b == blocks - 1
                    if si < 3:
                        stride = strides[si] if last else 1
                        dil = dil_in[si]
                        br = brs[si] if last else False
                    else:
                        stride, dil, br = 1, dil_out[-1], False
                    h = maybe_remat(PreactBlock)(
                        filters=filters, stride=stride, dilation=dil,
                        bottomright=br, conv_shortcut=first,
                        ghost_splits=self.ghost_splits, dtype=self.dtype,
                        name=f'stage{si}_block{b}')(h, train)
            h = nn.relu(bn('post_bn')(h, train))
        else:
            for si, (filters, blocks) in enumerate(zip(stage_filters, counts)):
                for b in range(blocks):
                    first = b == 0
                    if si == 0:
                        stride, br = 1, False
                        dil = dil_in[0]
                    else:
                        stride = strides[si - 1] if first else 1
                        dil = (dil_in[si - 1] if v1_5 else dil_out[si - 1]) \
                            if first else dil_out[si - 1]
                        br = brs[si - 1] if first else False
                    h = maybe_remat(BottleneckBlock)(
                        filters=filters, stride=stride, dilation=dil,
                        bottomright=br, conv_shortcut=first, v1_5=v1_5,
                        ghost_splits=self.ghost_splits, dtype=self.dtype,
                        use_group_norm=self.use_group_norm,
                        bn_fold=self.bn_fold,
                        name=f'stage{si}_block{b}')(h, train)
        return h
