"""Metro: root-relative-only 3D heatmap model (`metrabs_tf/models/metro.py`).

No intrinsics input and no absolute reconstruction — the head decodes a
metric root-relative pose directly. The trainer supervises the 3D batch with
a root-relative L1 and the 2D batch with aligned weak 2D supervision
(`metro.py:82-107`): the predicted 2D-like joints are Procrustes-style
mean/stdev aligned to the annotations before the loss (no absolute scale is
available without intrinsics).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from metrabs_tpu.config import ModelConfig, TrainConfig
from metrabs_tpu.models.heads import Head3D
from metrabs_tpu.ops import masked
from metrabs_tpu.train import losses as losses_mod


class Metro(nn.Module):
    cfg: ModelConfig
    backbone: nn.Module

    def setup(self):
        self.heatmap_head = Head3D(
            cfg=self.cfg, n_points=self.cfg.n_joints,
            dtype=jnp.dtype(self.cfg.dtype))

    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        features = self.backbone(image, train=train)
        return self.heatmap_head(features, train=train)


def align_2d_skeletons(coords_pred: jnp.ndarray, coords_true: jnp.ndarray,
                       joint_validity_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean/stdev alignment of predicted to annotated 2D skeletons
    (`models/util.py:32-38`)."""
    mean_pred, stdev_pred = masked.mean_stdev_masked(
        coords_pred, joint_validity_mask, items_axis=1, dimensions_axis=2)
    mean_true, stdev_true = masked.mean_stdev_masked(
        coords_true, joint_validity_mask, items_axis=1, dimensions_axis=2)
    return masked.divide_no_nan(
        coords_pred - mean_pred, stdev_pred) * stdev_true + mean_true


def compute_metro_losses(
        coords3d_rel_pred: jnp.ndarray, coords3d_pred_2d: jnp.ndarray,
        batch3d: Dict, batch2d: Dict,
        index_groups: Sequence[Sequence[int]], *, cfg: ModelConfig,
        tcfg: TrainConfig) -> Dict[str, jnp.ndarray]:
    """Metro losses (`metro.py:82-107`)."""
    losses = {}
    true_rootrel = losses_mod.center_relative_pose(
        batch3d['coords3d_true'], batch3d['joint_validity_mask'],
        tcfg.mean_relative)
    pred_rootrel = losses_mod.center_relative_pose(
        coords3d_rel_pred, batch3d['joint_validity_mask'], tcfg.mean_relative)
    losses['loss3d'] = masked.reduce_mean_masked(
        jnp.abs((true_rootrel - pred_rootrel) / 1000.0),
        batch3d['joint_validity_mask'])

    scale_2d = 1.0 / cfg.proc_side * cfg.box_size_mm / 1000.0
    coords2d_pred_2d = losses_mod.get_2dlike_joints(
        coords3d_pred_2d[..., :2], index_groups)
    coords2d_pred_2d = align_2d_skeletons(
        coords2d_pred_2d, batch2d['coords2d_true'],
        batch2d['joint_validity_mask'])
    losses['loss2d'] = masked.reduce_mean_masked(
        jnp.abs((batch2d['coords2d_true'] - coords2d_pred_2d) * scale_2d),
        batch2d['joint_validity_mask'])

    losses['loss'] = losses['loss3d'] + tcfg.loss2d_factor * losses['loss2d']
    return losses
