"""The MeTRAbs crop model: backbone + dual-heatmap head + absolute reconstruction.

TPU-native re-design of `metrabs_tf/models/metrabs.py:16-141`. The model is a
pure flax module; `predict_multi` (the L5->L3 interface of SURVEY.md §1) is
obtained by jitting `apply` with `train=False`. The reference's float16 call
boundary (`models/metrabs.py:72-78`) becomes a bfloat16 backbone compute dtype
with float32 decode/reconstruction.

Latent-joint ("affine-combining autoencoder") variants are supported as in the
reference (`models/metrabs.py:26-48,54-65`):
  - latent_mode='transform_coords': the head predicts n_latents points which
    are decoded to joints after absolute reconstruction.
  - latent_mode='predict_all_and_latents': the head predicts n_latents +
    n_joints points; __call__ uses the latent part, decoded to joints.
  - latent_mode='' (default): the head predicts the joints directly
    (regularize_to_manifold only affects the loss, not the architecture).
Encoder/recombination weights live in the 'constants' variable collection.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.models.heads import MetrabsHeads
from metrabs_tpu.ops import reconstruct


def linear_combine_points(coords: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Affine recombination of points (`tfu3d.py:48-49`)."""
    return jnp.einsum('...jc,jJ->...Jc', coords, weights, precision='highest')


class Metrabs(nn.Module):
    cfg: ModelConfig
    backbone: nn.Module
    latent_mode: str = ''  # '', 'transform_coords', 'predict_all_and_latents'
    n_latents: int = 0

    @property
    def n_raw_points(self) -> int:
        if self.latent_mode == 'transform_coords':
            return self.n_latents
        if self.latent_mode == 'predict_all_and_latents':
            return self.n_latents + self.cfg.n_joints
        return self.cfg.n_joints

    def setup(self):
        self.heatmap_heads = MetrabsHeads(
            cfg=self.cfg, n_points=self.n_raw_points,
            dtype=jnp.dtype(self.cfg.dtype))
        if self.latent_mode:
            # w2: [n_latents, n_joints] decode; w1: [n_joints, n_latents] encode.
            self.recombination_weights = self.variable(
                'constants', 'recombination_weights',
                lambda: jnp.zeros((self.n_latents, self.cfg.n_joints), jnp.float32))
            self.encoder_weights = self.variable(
                'constants', 'encoder_weights',
                lambda: jnp.zeros((self.cfg.n_joints, self.n_latents), jnp.float32))

    def backbone_and_head(self, image: jnp.ndarray, train: bool = False):
        features = self.backbone(image, train=train)
        coords2d, coords3d = self.heatmap_heads(features, train=train)
        return features, coords2d, coords3d

    def __call__(self, image: jnp.ndarray, intrinsics: jnp.ndarray,
                 train: bool = False,
                 sample_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """[N, S, S, 3] images + [N, 3, 3] intrinsics -> [N, J, 3] absolute
        camera-space joints in millimeters.

        `sample_valid` masks padding crops out of the reconstruction's pooled
        RMS normalization (see `reconstruct_ref_fullpersp`)."""
        _, coords2d, coords3d = self.backbone_and_head(image, train=train)

        if self.latent_mode == 'predict_all_and_latents':
            coords2d = coords2d[:, :self.n_latents]
            coords3d = coords3d[:, :self.n_latents]

        # The FOV trust border ALWAYS uses stride_train — the reference's
        # is_within_fov reads FLAGS.stride_train unconditionally
        # (`tfu3d.py:209-216`), so a stride_test != stride_train config
        # must not change which border-band joints use the 2D-based
        # absolute reconstruction.
        coords3d_abs = reconstruct.reconstruct_absolute(
            coords2d, coords3d, intrinsics,
            proc_side=self.cfg.proc_side, stride=self.cfg.stride_train,
            centered_stride=self.cfg.centered_stride,
            mix_3d_inside_fov=self.cfg.mix_3d_inside_fov,
            weak_perspective=self.cfg.weak_perspective,
            sample_valid=sample_valid)

        if self.latent_mode:
            coords3d_abs = self.latent_points_to_joints(coords3d_abs)
        return coords3d_abs

    def latent_points_to_joints(self, points: jnp.ndarray) -> jnp.ndarray:
        return linear_combine_points(points, self.recombination_weights.value)

    def joints_to_latent_points(self, points: jnp.ndarray) -> jnp.ndarray:
        return linear_combine_points(points, self.encoder_weights.value)

    def joints_to_joints(self, points: jnp.ndarray) -> jnp.ndarray:
        w = self.encoder_weights.value @ self.recombination_weights.value
        return linear_combine_points(points, w)


def set_last_point_weights(
        params: dict, other_kernel: np.ndarray, other_bias: np.ndarray,
        depth: int, n_points: int, head_path=('heatmap_heads', 'conv_final')) -> dict:
    """Head-weight surgery for fine-tuning (`models/metrabs.py:108-141`).

    Writes the 2D/3D conv kernel+bias of a smaller head (predicting
    n_points_other joints) into the *last* n_points_other slots of this
    model's head, preserving the [2d | 3d-interleaved-by-depth] layout.
    Operates on a flax params pytree, returning an updated copy.
    """
    import jax

    n_total_other = other_kernel.shape[-1]
    n_points_other = n_total_other // (1 + depth)
    k2d_o, k3d_o = np.split(other_kernel, [n_points_other], axis=-1)
    b2d_o, b3d_o = np.split(other_bias, [n_points_other], axis=-1)

    params = jax.tree_util.tree_map(np.asarray, params)
    node = params
    for key in head_path[:-1]:
        node = node[key]
    conv = node[head_path[-1]]
    kernel, bias = np.array(conv['kernel']), np.array(conv['bias'])

    k2d, k3d = np.split(kernel, [n_points], axis=-1)
    b2d, b3d = np.split(bias, [n_points], axis=-1)
    k2d[..., -n_points_other:] = k2d_o
    b2d[..., -n_points_other:] = b2d_o

    b3d_r = b3d.reshape(depth, n_points)
    b3d_r[:, -n_points_other:] = b3d_o.reshape(depth, n_points_other)
    k3d_r = k3d.reshape(*k3d.shape[:-1], depth, n_points)
    k3d_r[..., -n_points_other:] = k3d_o.reshape(*k3d_o.shape[:-1], depth, n_points_other)

    conv['kernel'] = np.concatenate([k2d, k3d_r.reshape(k3d.shape)], axis=-1)
    conv['bias'] = np.concatenate([b2d, b3d_r.reshape(-1)], axis=-1)
    return params
