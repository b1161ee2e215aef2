"""MobileNetV3 Small/Large (+minimalistic) backbones in flax.

Architecture semantics follow the reference's Keras fork
(`metrabs_tf/backbones/mobilenet_v3.py`):
 - inverted residual blocks with optional squeeze-excite (hard-sigmoid gate)
   and hard-swish activations, BN momentum 0.999 / eps 1e-3;
 - stride-2 blocks use explicit `correct_pad` padding + VALID depthwise, with
   a bottom-right shift on the final stride-2 block when centered_stride is
   on (`mobilenet_v3.py:513-517`, `correct_pad` at `:556-575`) — this is the
   feature-alignment detail that pairs with heatmap_to_image's +stride//2;
 - stem conv 16ch s2 SAME; tail Conv_1 (1x1, BN, act) + Conv_2 (1x1 + bias,
   act, no BN) to 1024 (small) / 1280 (large) channels
   (`mobilenet_v3.py:258-296`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from metrabs_tpu.models.backbones import common

BN_MOMENTUM = 0.999
BN_EPSILON = 1e-3


def _depth(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def correct_pad(kernel_size: int, shift: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    pad_total = kernel_size - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return ((pad_beg - shift, pad_end + shift), (pad_beg - shift, pad_end + shift))


class SEBlock(nn.Module):
    filters: int
    se_ratio: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(_depth(self.filters * self.se_ratio), (1, 1), use_bias=True,
                     dtype=self.dtype, param_dtype=jnp.float32, name='conv')(se)
        se = nn.relu(se)
        se = nn.Conv(self.filters, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name='conv_1')(se)
        return x * common.hard_sigmoid(se)


class InvertedResBlock(nn.Module):
    expansion: float
    filters: int
    kernel_size: int
    stride: int
    se_ratio: Optional[float]
    activation: Callable
    block_id: int
    bottomright_stride: bool = False
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    # Inference-only folded-BN layout (io/bn_fold.py): convs carry a bias,
    # BN modules are skipped. Variables from fold_bn_variables.
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shortcut = x
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only layout')
        infilters = x.shape[-1]
        bn = lambda name: common.batch_norm(
            BN_MOMENTUM, BN_EPSILON, self.dtype, name, self.ghost_splits)
        norm = (lambda name, h: h if self.bn_fold else bn(name)(h, train))
        if self.block_id:
            x = nn.Conv(_depth(infilters * self.expansion), (1, 1),
                        use_bias=self.bn_fold,
                        dtype=self.dtype, param_dtype=jnp.float32, name='expand')(x)
            x = self.activation(norm('expand_bn', x))
        expanded = x.shape[-1]

        if self.stride == 2:
            shift = 1 if self.bottomright_stride else 0
            pads = correct_pad(self.kernel_size, shift)
            x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
            padding = 'VALID'
        else:
            padding = 'SAME'
        x = nn.Conv(expanded, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=padding,
                    feature_group_count=expanded, use_bias=self.bn_fold,
                    dtype=self.dtype, param_dtype=jnp.float32, name='depthwise')(x)
        x = self.activation(norm('depthwise_bn', x))

        if self.se_ratio:
            x = SEBlock(expanded, self.se_ratio, dtype=self.dtype,
                        name='squeeze_excite')(x)

        x = nn.Conv(self.filters, (1, 1), use_bias=self.bn_fold,
                    dtype=self.dtype,
                    param_dtype=jnp.float32, name='project')(x)
        x = norm('project_bn', x)

        if self.stride == 1 and infilters == self.filters:
            x = shortcut + x
        return x


# Stack tables: (expansion, filters, kernel, stride, se, act, final_s2)
# transcribed from `mobilenet_v3.py:364-385` (small) and `:404-433` (large).
def _small_stack(depth, kernel, act, se):
    relu = nn.relu
    return [
        (1.0, depth(16), 3, 2, se, relu, False),
        (72.0 / 16, depth(24), 3, 2, None, relu, False),
        (88.0 / 24, depth(24), 3, 1, None, relu, False),
        (4.0, depth(40), kernel, 2, se, act, False),
        (6.0, depth(40), kernel, 1, se, act, False),
        (6.0, depth(40), kernel, 1, se, act, False),
        (3.0, depth(48), kernel, 1, se, act, False),
        (3.0, depth(48), kernel, 1, se, act, False),
        (6.0, depth(96), kernel, 2, se, act, True),
        (6.0, depth(96), kernel, 1, se, act, False),
        (6.0, depth(96), kernel, 1, se, act, False),
    ]


def _large_stack(depth, kernel, act, se):
    relu = nn.relu
    return [
        (1.0, depth(16), 3, 1, None, relu, False),
        (4.0, depth(24), 3, 2, None, relu, False),
        (3.0, depth(24), 3, 1, None, relu, False),
        (3.0, depth(40), kernel, 2, se, relu, False),
        (3.0, depth(40), kernel, 1, se, relu, False),
        (3.0, depth(40), kernel, 1, se, relu, False),
        (6.0, depth(80), 3, 2, None, act, False),
        (2.5, depth(80), 3, 1, None, act, False),
        (2.3, depth(80), 3, 1, None, act, False),
        (2.3, depth(80), 3, 1, None, act, False),
        (6.0, depth(112), 3, 1, se, act, False),
        (6.0, depth(112), 3, 1, se, act, False),
        (6.0, depth(160), kernel, 2, se, act, True),
        (6.0, depth(160), kernel, 1, se, act, False),
        (6.0, depth(160), kernel, 1, se, act, False),
    ]


class MobileNetV3(nn.Module):
    """[N, S, S, 3] gamma-space [0,1] RGB -> [N, S/32, S/32, C] features."""

    model_type: str = 'small'  # 'small' | 'large'
    alpha: float = 1.0
    minimalistic: bool = False
    centered_stride: bool = True
    ghost_splits: int = 1
    dtype: Any = jnp.bfloat16
    # Rematerialize each block in the backward pass (jax.checkpoint):
    # ~1/3 extra FLOPs for O(1)-per-block activation memory. Identical
    # parameter tree.
    remat: bool = False
    # Inference-only folded-BN serving layout (io/bn_fold.py).
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only layout')
        if self.minimalistic:
            kernel, act, se = 3, nn.relu, None
        else:
            kernel, act, se = 5, common.hard_swish, 0.25

        def depth(d):
            return _depth(d * self.alpha)

        bn = lambda name: common.batch_norm(
            BN_MOMENTUM, BN_EPSILON, self.dtype, name, self.ghost_splits)

        norm = (lambda name, h: h if self.bn_fold else bn(name)(h, train))
        x = common.mobilenet_preproc(x.astype(self.dtype))
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding='SAME',
                    use_bias=self.bn_fold,
                    dtype=self.dtype, param_dtype=jnp.float32, name='stem_conv')(x)
        x = act(norm('stem_bn', x))

        stack = (_small_stack if self.model_type == 'small' else _large_stack)(
            depth, kernel, act, se)
        if self.remat:
            # train (positional argnum 2; self=0) is static under
            # jax.checkpoint: it drives Python control flow in batch_norm.
            block_cls = nn.remat(InvertedResBlock, static_argnums=(2,),
                                 prevent_cse=False)
        else:
            block_cls = InvertedResBlock
        for i, (exp, filt, k, s, se_r, a, final_s2) in enumerate(stack):
            x = block_cls(
                expansion=exp, filters=filt, kernel_size=k, stride=s,
                se_ratio=se_r, activation=a, block_id=i,
                bottomright_stride=final_s2 and self.centered_stride,
                ghost_splits=self.ghost_splits, dtype=self.dtype,
                bn_fold=self.bn_fold,
                name=f'block_{i}')(x, train)

        last_conv_ch = _depth(x.shape[-1] * 6)
        last_point_ch = 1024 if self.model_type == 'small' else 1280
        if self.alpha > 1.0:
            last_point_ch = _depth(last_point_ch * self.alpha)
        x = nn.Conv(last_conv_ch, (1, 1), use_bias=self.bn_fold,
                    dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv_1')(x)
        x = act(norm('conv_1_bn', x))
        x = nn.Conv(last_point_ch, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv_2')(x)
        return act(x)
