"""Prediction heads: 2D + 3D volumetric heatmaps decoded by soft-argmax.

Re-design of `metrabs_tf/models/metrabs.py:90-106` (MetrabsHeads),
`metro.py:36-56` (Head3D) and `twofive.py:38-58` (Head25D) for JAX/flax.

The entire head is a single 1x1 convolution — i.e. one [C, (1+depth)*J] matmul
over the backbone's stride-32 feature map — followed by softmax-expectation
decoding. On TPU this is one MXU call fused with the decode by XLA; the
backbone dominates FLOPs (SURVEY.md §3.5). Logits are upcast to float32 before
soft-argmax exactly as the reference does (`models/metrabs.py:102-104`).
"""

from __future__ import annotations

from typing import Any

import einops
import flax.linen as nn
import jax.numpy as jnp

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.ops import heatmap as heatmap_ops
from metrabs_tpu.ops import heatmap_decode as sa


class MetrabsHeads(nn.Module):
    """Joint 2D-heatmap + 3D-volumetric-heatmap head.

    Output channels: [n_points] 2D logits followed by [depth * n_points] 3D
    logits, matching the reference's channel split order
    (`models/metrabs.py:94-101`).
    """

    cfg: ModelConfig
    n_points: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        depth = self.cfg.depth
        n_outs = self.n_points + depth * self.n_points
        x = nn.Conv(
            features=n_outs, kernel_size=(1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name='conv_final')(features)
        logits2d = x[..., :self.n_points]
        logits3d = einops.rearrange(
            x[..., self.n_points:], 'b h w (d j) -> b h w d j', j=self.n_points)

        stride = self.cfg.stride_train if train else self.cfg.stride_test
        # 3D: axes (W, H, D) -> (x, y, z) in [0,1]^3, then to millimeters.
        coords3d = sa.soft_argmax(logits3d.astype(jnp.float32), axes=(2, 1, 3))
        coords3d_rel = heatmap_ops.heatmap_to_metric(
            coords3d, proc_side=self.cfg.proc_side, stride=stride,
            box_size_mm=self.cfg.box_size_mm, centered_stride=self.cfg.centered_stride)
        # 2D: axes (W, H) -> (x, y) in [0,1]^2, then to pixels.
        coords2d = sa.soft_argmax(logits2d.astype(jnp.float32), axes=(2, 1))
        coords2d_pred = heatmap_ops.heatmap_to_image(
            coords2d, proc_side=self.cfg.proc_side, stride=stride,
            centered_stride=self.cfg.centered_stride)
        return coords2d_pred, coords3d_rel


class Head3D(nn.Module):
    """Metro-style root-relative 3D head (no separate 2D stream);
    `metrabs_tf/models/metro.py:36-56`."""

    cfg: ModelConfig
    n_points: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        depth = self.cfg.depth
        x = nn.Conv(
            features=depth * self.n_points, kernel_size=(1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name='conv_final')(features)
        logits3d = einops.rearrange(x, 'b h w (d j) -> b h w d j', j=self.n_points)
        coords3d = sa.soft_argmax(logits3d.astype(jnp.float32), axes=(2, 1, 3))
        stride = self.cfg.stride_train if train else self.cfg.stride_test
        return heatmap_ops.heatmap_to_metric(
            coords3d, proc_side=self.cfg.proc_side, stride=stride,
            box_size_mm=self.cfg.box_size_mm, centered_stride=self.cfg.centered_stride)


class Head25D(nn.Module):
    """2.5D head: xy in pixels, z relative in millimeters
    (`metrabs_tf/models/twofive.py:38-58`)."""

    cfg: ModelConfig
    n_points: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        depth = self.cfg.depth
        x = nn.Conv(
            features=depth * self.n_points, kernel_size=(1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name='conv_final')(features)
        logits = einops.rearrange(x, 'b h w (d j) -> b h w d j', j=self.n_points)
        coords = sa.soft_argmax(logits.astype(jnp.float32), axes=(2, 1, 3))
        stride = self.cfg.stride_train if train else self.cfg.stride_test
        return heatmap_ops.heatmap_to_25d(
            coords, proc_side=self.cfg.proc_side, stride=stride,
            box_size_mm=self.cfg.box_size_mm, centered_stride=self.cfg.centered_stride)
