"""Model25D: 2.5D head with bone-length absolute depth recovery
(`metrabs_tf/models/twofive.py`).

The head predicts (x px, y px, z relative mm); absolute depth is recovered by
the fixed-iteration Levenberg-Marquardt bone-length solve
(`ops/lm_solver.py`, replacing tensorflow_graphics' optimizer). Losses
(`twofive.py:102-122`): 2D pixel L1 on the 3D batch, relative-z L1 (shifted
by box_size/2 to match the head's absolute-z convention), and weak 2D
supervision on the 2D batch; combined z/3 + 2*2d/3.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig, TrainConfig
from metrabs_tpu.models.heads import Head25D
from metrabs_tpu.ops import masked
from metrabs_tpu.ops.lm_solver import reconstruct_absolute_by_bone_lengths
from metrabs_tpu.train import losses as losses_mod


class Model25D(nn.Module):
    cfg: ModelConfig
    backbone: nn.Module
    bones: Tuple[Tuple[int, int], ...] = ()
    # Ideal bone lengths (mm), a dataset asset like the reference's
    # `bone_lengths_ideal` constructor argument (`twofive.py:15-18`).
    bone_lengths_ideal: Tuple[float, ...] = ()

    def setup(self):
        self.heatmap_head = Head25D(
            cfg=self.cfg, n_points=self.cfg.n_joints,
            dtype=jnp.dtype(self.cfg.dtype))

    def forward_25d(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        features = self.backbone(image, train=train)
        return self.heatmap_head(features, train=train)

    def __call__(self, image: jnp.ndarray, intrinsics: jnp.ndarray,
                 train: bool = False,
                 sample_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        coords25d = self.forward_25d(image, train=train)
        if sample_valid is not None:
            # Estimator crop-fn contract: padding crops carry arbitrary head
            # outputs, and the LM bone solve divides by bone directions —
            # substitute a well-conditioned diagonal dummy pose (nonzero
            # bone lengths) so invalid slots stay finite; their outputs are
            # masked downstream by the same validity mask.
            n_j = coords25d.shape[-2]
            spread = jnp.linspace(0.25, 0.75, n_j) * self.cfg.proc_side
            neutral = jnp.stack(
                [spread, spread,
                 jnp.full((n_j,), 0.5 * self.cfg.box_size_mm)], axis=-1)
            coords25d = jnp.where(
                sample_valid[:, None, None], coords25d, neutral)
        # stride here only sets the FOV trust border, which the reference
        # always derives from stride_train (`tfu3d.py:209-216`) regardless
        # of the test-time stride.
        return reconstruct_absolute_by_bone_lengths(
            coords25d, intrinsics,
            jnp.asarray(np.asarray(self.bone_lengths_ideal, np.float32)),
            self.bones, proc_side=self.cfg.proc_side,
            stride=self.cfg.stride_train,
            centered_stride=self.cfg.centered_stride)


def compute_model25d_losses(
        coords25d_pred: jnp.ndarray, coords25d_pred_2d: jnp.ndarray,
        batch3d: Dict, batch2d: Dict,
        index_groups: Sequence[Sequence[int]], *, cfg: ModelConfig,
        tcfg: TrainConfig) -> Dict[str, jnp.ndarray]:
    """Model25D losses (`twofive.py:102-122`)."""
    losses = {}
    scale_2d = 1.0 / cfg.proc_side * cfg.box_size_mm / 1000.0

    coords2d_pred = coords25d_pred[..., :2]
    losses['loss23d'] = masked.reduce_mean_masked(
        jnp.abs((batch3d['coords2d_true'] - coords2d_pred) * scale_2d),
        batch3d['joint_validity_mask'])

    z_ref = losses_mod.center_relative_pose(
        batch3d['coords3d_true'][..., 2:], batch3d['joint_validity_mask'],
        tcfg.mean_relative)[..., 0] + 0.5 * cfg.box_size_mm
    z_pred = coords25d_pred[..., 2]
    losses['loss_z'] = masked.reduce_mean_masked(
        jnp.abs(z_ref - z_pred), batch3d['joint_validity_mask']) / 1000.0

    coords2d_pred_2d = losses_mod.get_2dlike_joints(
        coords25d_pred_2d[..., :2], index_groups)
    losses['loss2d'] = masked.reduce_mean_masked(
        jnp.abs((batch2d['coords2d_true'] - coords2d_pred_2d) * scale_2d),
        batch2d['joint_validity_mask'])

    losses['loss3d'] = losses['loss_z'] / 3 + 2 * losses['loss23d'] / 3
    losses['loss'] = losses['loss3d'] + tcfg.loss2d_factor * losses['loss2d']
    return losses
