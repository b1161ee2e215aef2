"""Shared backbone building blocks: padding, normalization, preprocessing.

The centered-stride alignment machinery is the bit-accuracy-critical part
(SURVEY.md §7 "hard parts" #4): stride-2 convolutions use explicit fixed
padding with an optional bottom-right shift (`effnetv2_utils.py:100-140`,
`mobilenet_v3.py:515-517,556`) so that heatmap cell centers line up with
`heatmap_to_image`'s `+stride//2` offset.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def fixed_padding_amounts(kernel_size: int, rate: int = 1,
                          shift: int = 0) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Explicit SAME-equivalent padding for a VALID conv, with an optional
    bottom-right shift of the sampling grid (`effnetv2_utils.py:100-140`)."""
    effective = kernel_size + (kernel_size - 1) * (rate - 1)
    pad_total = effective - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return ((pad_beg - shift, pad_end + shift), (pad_beg - shift, pad_end + shift))


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) * (1.0 / 6.0)


def hard_swish(x):
    return x * hard_sigmoid(x)


ACTIVATIONS = {
    'relu': nn.relu,
    'silu': nn.silu,
    'swish': nn.silu,
    'hard_swish': hard_swish,
    'gelu': nn.gelu,
}


class GhostBatchNorm(nn.Module):
    """Batch normalization with optional ghost-batch statistics.

    With `splits > 1`, training-time statistics are computed over
    batch-subgroups independently (the fleras GhostBatchNormalization used by
    the reference via `--ghost-bn`, `builder.py:85-96`). On TPU this maps
    exactly to per-shard batch statistics under data parallelism: no
    cross-replica sync, which is what ghost BN wants (SURVEY.md §5).
    Inference always uses the (shared) running averages.
    """

    momentum: float = 0.9
    epsilon: float = 1e-3
    splits: int = 1
    dtype: Any = jnp.bfloat16
    # Compute batch statistics in the COMPUTE dtype (bf16) instead of
    # flax's default f32 reduction (force_float32_reductions). Training-MFU
    # lever (VERDICT r4 #6b): the f32 upcasts of every activation tensor
    # feeding the BN reduces are pure HBM traffic on this conv workload.
    # Running averages stay f32 either way. Identical variable tree.
    bf16_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 fold: bool = False):
        if fold:
            # Inference-mode folding: declare the SAME variables (the tree
            # stays checkpoint/import-compatible) but return the per-channel
            # (scale, bias) f32 constants gamma*rsqrt(var+eps) and
            # beta - mean*scale instead of applying them — consumed by the
            # fused MBConv Pallas kernel (ops/mbconv_pallas.py).
            bn_mod = nn.BatchNorm(
                use_running_average=True, momentum=self.momentum,
                epsilon=self.epsilon, dtype=self.dtype,
                param_dtype=jnp.float32, name='bn')
            bn_mod(jnp.zeros((1, x.shape[-1]), self.dtype))
            v = bn_mod.variables
            scale = v['params']['scale'] * jax.lax.rsqrt(
                v['batch_stats']['var'] + self.epsilon)
            bias = v['params']['bias'] - v['batch_stats']['mean'] * scale
            return scale, bias
        f32_red = not self.bf16_stats
        if not train or self.splits <= 1:
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.momentum,
                epsilon=self.epsilon, dtype=self.dtype, param_dtype=jnp.float32,
                force_float32_reductions=f32_red, name='bn')(x)
        n = x.shape[0]
        g = self.splits
        if n % g != 0:
            raise ValueError(f'Batch {n} not divisible by ghost splits {g}')
        xs = x.reshape((g, n // g) + x.shape[1:])
        bn = nn.BatchNorm(
            use_running_average=False, momentum=self.momentum,
            epsilon=self.epsilon, dtype=self.dtype, param_dtype=jnp.float32,
            force_float32_reductions=f32_red, name='bn')
        # The (static, small) number of splits is unrolled; each split updates
        # the shared running stats in turn, like the reference's fleras layer.
        parts = [bn(xs[i]) for i in range(g)]
        return jnp.concatenate(parts, axis=0)


def batch_norm(momentum: float, epsilon: float, dtype, name: str,
               ghost_splits: int = 1, bf16_stats: bool = False):
    return GhostBatchNorm(
        momentum=momentum, epsilon=epsilon, splits=ghost_splits, dtype=dtype,
        bf16_stats=bf16_stats, name=name)


class GroupNormCompat(nn.Module):
    """GroupNorm with the (x, train) call signature of GhostBatchNorm so the
    two are interchangeable in block builders. Keras GroupNormalization
    defaults (the reference's resnet50v1_5_groupnorm variant,
    `metrabs_tf/backbones/resnet.py:174-176`): 32 groups, BN's epsilon."""

    epsilon: float = 1e-5
    groups: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.GroupNorm(
            num_groups=self.groups, epsilon=self.epsilon, dtype=self.dtype,
            param_dtype=jnp.float32, name='gn')(x)


def stochastic_depth(x: jnp.ndarray, residual: jnp.ndarray,
                     survival_prob, train: bool, rng=None) -> jnp.ndarray:
    """Residual add with drop-connect (`effnetv2_model.py:265-276`).

    `survival_prob` may be a traced scalar (it is a scanned input when blocks
    are stacked with nn.scan)."""
    if not train or rng is None:
        return x + residual
    mask_shape = (residual.shape[0],) + (1,) * (residual.ndim - 1)
    p = jnp.clip(jnp.asarray(survival_prob, jnp.float32), 1e-6, 1.0)
    keep = jax.random.bernoulli(rng, p, mask_shape)
    # Stay in the residual dtype: promoting to f32 here changes the scanned
    # block's carry type (scan requires carry-in == carry-out).
    scaled = residual / p.astype(residual.dtype)
    return x + jnp.where(keep, scaled, jnp.zeros_like(scaled))


# --- Per-family input preprocessing (`backbones/builder.py:99-117`).
# Crop-model inputs are gamma-space RGB in [0, 1].

def tf_preproc(x):
    return 2.0 * x - 1.0


def torch_preproc(x):
    mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
    return (x - mean) / std


def caffe_preproc(x):
    # BGR-ordered means in the reference applied to RGB values as-is.
    mean = jnp.asarray([103.939, 116.779, 123.68], x.dtype)
    return 255.0 * x - mean


def mobilenet_preproc(x):
    # MobileNetV3's own stem contains Rescaling(1/127.5, -1); combined with
    # the x255 lambda this is (255/127.5)x - 1.
    return (255.0 / 127.5) * x - 1.0
