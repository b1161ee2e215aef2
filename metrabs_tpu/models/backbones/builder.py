"""Backbone dispatch by name (`metrabs_tf/backbones/builder.py` equivalent).

Accepted names mirror the reference FLAGS.backbone values:
  efficientnetv2-{s,m,l,xl}[-stride4|8|16]
  resnet{18,34,50,101,152}[v1-5|v2][-stride4|8|16]
  mobilenetv3-{small,large}[-mini]
Per-family input preprocessing is built into each backbone module (inputs are
gamma-space RGB in [0, 1], the crop pipeline's output).
"""

from __future__ import annotations

import re
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from metrabs_tpu.models.backbones.efficientnet_v2 import EfficientNetV2
from metrabs_tpu.models.backbones.mobilenet_v3 import MobileNetV3
from metrabs_tpu.models.backbones.resnet import ResNet
from metrabs_tpu.models.backbones.tiny import TinyBackbone


def build_backbone(name: str, *, centered_stride: bool = True,
                   ghost_splits: int = 1, dtype: Any = jnp.bfloat16,
                   scan_blocks: bool = True,
                   stride_test: int = None,
                   remat: bool = False,
                   bn_fold: bool = False) -> nn.Module:
    """`stride_test`: test-time output stride when it differs from training
    (the reference's TrainTestSwitch recipe, `resnet.py:31-32`,
    `docs/TRAINING.md:17-23`). The training stride comes from the name's
    -strideN suffix (default 32). Supported for resnet* and efficientnetv2*.

    `remat`: rematerialize blocks in the backward pass (jax.checkpoint) —
    ~1/3 extra FLOPs for O(1)-per-block activation HBM; use for large
    batch/resolution training. Parameter trees are unchanged.

    `bn_fold`: inference-only serving layout with BatchNorm folded into the
    convs (io/bn_fold.py); variables must come from `fold_bn_variables`.
    Supported where `io.bn_fold.backbone_supports_bn_fold` says so.
    """
    name = name.lower().replace('_', '-')
    if bn_fold:
        from metrabs_tpu.io.bn_fold import backbone_supports_bn_fold
        if not backbone_supports_bn_fold(name):
            raise ValueError(f'bn_fold is not supported for {name!r}')
    if name.startswith('efficientnetv2'):
        model_name_test = None
        if stride_test is not None:
            m = re.match(r'(efficientnetv2-[smlx]+)(?:-stride(\d+))?$', name)
            if not m:
                raise ValueError(f'Cannot parse EffNetV2 name {name!r}')
            base = m.group(1)
            model_name_test = (base if stride_test == 32
                               else f'{base}-stride{stride_test}')
            # Fail at build time with a clear message, not a KeyError at
            # first trace: dilated tables exist only for S and L (the two
            # the reference ships, `effnetv2_configs.py:155-247`).
            from metrabs_tpu.models.backbones.efficientnet_v2 import \
                EFFNETV2_PARAMS
            if model_name_test not in EFFNETV2_PARAMS:
                raise ValueError(
                    f'No -stride{stride_test} variant tables for {base!r}; '
                    f'available: '
                    f'{sorted(k for k in EFFNETV2_PARAMS if "stride" in k)}')
        return EfficientNetV2(
            model_name=name, model_name_test=model_name_test,
            centered_stride=centered_stride, ghost_splits=ghost_splits,
            dtype=dtype, scan_blocks=scan_blocks, remat=remat,
            bn_fold=bn_fold)
    if name.startswith('resnet'):
        m = re.match(
            r'resnet(\d+)(v1-5|v2)?(-groupnorm)?(?:-stride(\d+))?$', name)
        if not m:
            raise ValueError(f'Cannot parse ResNet name {name!r}')
        depth = int(m.group(1))
        variant = {'v1-5': 'v1_5', 'v2': 'v2', None: ''}[m.group(2)]
        if m.group(3) and variant == 'v2':
            # The reference's V2 (preact) block hard-codes BatchNorm
            # (`metrabs_tf/backbones/resnet.py:411-413`); GroupNorm only
            # exists for V1/V1.5.
            raise ValueError('groupnorm is not supported for ResNet V2')
        output_stride = int(m.group(4)) if m.group(4) else 32
        return ResNet(
            depth=depth, variant=variant, output_stride=output_stride,
            output_stride_test=stride_test,
            centered_stride=centered_stride, ghost_splits=ghost_splits,
            dtype=dtype, use_group_norm=bool(m.group(3)), remat=remat,
            bn_fold=bn_fold)
    if stride_test is not None:
        raise ValueError(
            f'stride_test is only supported for resnet/efficientnetv2 '
            f'backbones, got {name!r}')
    if name.startswith('mobilenetv3'):
        m = re.match(r'mobilenetv3-(small|large)(-?mini)?$', name)
        if not m:
            raise ValueError(f'Cannot parse MobileNet name {name!r}')
        return MobileNetV3(
            model_type=m.group(1), minimalistic=bool(m.group(2)),
            centered_stride=centered_stride, ghost_splits=ghost_splits,
            dtype=dtype, remat=remat, bn_fold=bn_fold)
    if name.startswith('tiny'):
        return TinyBackbone(dtype=dtype)
    raise ValueError(f'No backbone builder found for {name!r}')
