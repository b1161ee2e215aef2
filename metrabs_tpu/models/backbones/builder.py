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
                   scan_blocks: bool = True) -> nn.Module:
    name = name.lower().replace('_', '-')
    if name.startswith('efficientnetv2'):
        return EfficientNetV2(
            model_name=name, centered_stride=centered_stride,
            ghost_splits=ghost_splits, dtype=dtype, scan_blocks=scan_blocks)
    if name.startswith('resnet'):
        m = re.match(r'resnet(\d+)(v1-5|v2)?(?:-stride(\d+))?$', name)
        if not m:
            raise ValueError(f'Cannot parse ResNet name {name!r}')
        depth = int(m.group(1))
        variant = {'v1-5': 'v1_5', 'v2': 'v2', None: ''}[m.group(2)]
        output_stride = int(m.group(3)) if m.group(3) else 32
        return ResNet(
            depth=depth, variant=variant, output_stride=output_stride,
            centered_stride=centered_stride, ghost_splits=ghost_splits,
            dtype=dtype)
    if name.startswith('mobilenetv3'):
        m = re.match(r'mobilenetv3-(small|large)(-?mini)?$', name)
        if not m:
            raise ValueError(f'Cannot parse MobileNet name {name!r}')
        return MobileNetV3(
            model_type=m.group(1), minimalistic=bool(m.group(2)),
            centered_stride=centered_stride, ghost_splits=ghost_splits,
            dtype=dtype)
    if name.startswith('tiny'):
        return TinyBackbone(dtype=dtype)
    raise ValueError(f'No backbone builder found for {name!r}')
