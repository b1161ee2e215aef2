"""MeTRAbs training losses (re-derivation of `metrabs_tf/models/metrabs.py:
144-405` MetrabsTrainer for JAX).

The training scheme is dual-stream: a 3D-labeled batch and a 2D-labeled batch
are concatenated and run through the network together
(`models/metrabs.py:159-160`); the 3D batch gets root-relative + absolute +
projection losses, the 2D batch gets weak 2D supervision through name-prefix
joint matching. All reductions are validity-masked. Millimeters are scaled to
meters (/1000) inside the losses exactly as the reference does.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig, TrainConfig
from metrabs_tpu.ops import masked
from metrabs_tpu.ops import reconstruct
from metrabs_tpu.utils.joint_info import JointInfo


def center_relative_pose(
        coords3d: jnp.ndarray, joint_validity_mask: Optional[jnp.ndarray],
        center_is_mean: bool) -> jnp.ndarray:
    """Root-relative (or mean-relative) pose (`tfu3d.py:21-45`)."""
    if center_is_mean:
        if joint_validity_mask is None:
            center = jnp.mean(coords3d, axis=1, keepdims=True)
        else:
            center = masked.reduce_mean_masked(
                coords3d, joint_validity_mask, axis=1, keepdims=True)
    else:
        center = coords3d[:, -1:]
    return coords3d - center


def compute_loss_with_3d_gt(
        coords3d_pred_abs: jnp.ndarray, coords3d_true: jnp.ndarray,
        intrinsics: jnp.ndarray, joint_validity_mask: Optional[jnp.ndarray],
        *, cfg: ModelConfig, tcfg: TrainConfig, step: jnp.ndarray) -> jnp.ndarray:
    """Root-relative + gated absolute + in-FOV projection loss
    (`models/metrabs.py:259-305`)."""
    diff = coords3d_true - coords3d_pred_abs

    true_rootrel = center_relative_pose(
        coords3d_true, joint_validity_mask, tcfg.mean_relative)
    pred_rootrel = center_relative_pose(
        coords3d_pred_abs, joint_validity_mask, tcfg.mean_relative)
    loss3d = masked.reduce_mean_masked(
        jnp.abs(true_rootrel - pred_rootrel) / 1000.0, joint_validity_mask)

    is_far_enough = coords3d_true[..., 2] > 300.0
    if joint_validity_mask is not None:
        is_valid_and_far = jnp.logical_and(joint_validity_mask, is_far_enough)
    else:
        is_valid_and_far = is_far_enough

    # Absolute loss: z is downweighted for far-away subjects
    # (scale 10000/|z|, capped at 1), xy weighted 2:1 vs z.
    absdiff = jnp.abs(diff)
    scale_factor_for_far = jnp.minimum(
        jnp.float32(1), 10000.0 / jnp.abs(coords3d_true[..., 2:]))
    absdiff_scaled = (absdiff[..., :2] * 2 + absdiff[..., 2:] * scale_factor_for_far) / 3
    loss3d_abs = masked.reduce_mean_masked(absdiff_scaled, is_valid_and_far) / 1000.0

    # Projection loss, masked to predictions inside the FOV and GT near it.
    coords2d_pred = reconstruct.project_pose(coords3d_pred_abs, intrinsics)
    coords2d_true = reconstruct.project_pose(coords3d_true, intrinsics)
    scale_2d = 1.0 / cfg.proc_side * cfg.box_size_mm / 1000.0
    in_fov_pred = jnp.logical_and(
        reconstruct.is_within_fov(
            coords2d_pred, proc_side=cfg.proc_side, stride=cfg.stride_train,
            centered_stride=cfg.centered_stride),
        coords3d_pred_abs[..., 2] > 1)
    near_fov_true = jnp.logical_and(
        reconstruct.is_within_fov(
            coords2d_true, proc_side=cfg.proc_side, stride=cfg.stride_train,
            centered_stride=cfg.centered_stride, border_factor=-20),
        coords3d_true[..., 2] > 1)
    loss2d = masked.reduce_mean_masked(
        jnp.abs((coords2d_true - coords2d_pred) * scale_2d),
        jnp.logical_and(is_valid_and_far,
                        jnp.logical_and(in_fov_pred, near_fov_true)))

    absloss_factor = jnp.where(
        step > tcfg.absloss_start_step, jnp.float32(tcfg.absloss_factor),
        jnp.float32(0))
    return loss3d + loss2d + absloss_factor * loss3d_abs


def get_2d_joint_index_groups(
        joint_info3d: JointInfo, joint_info2d: JointInfo) -> List[List[int]]:
    """For each 2D-dataset joint name, the 3D joints whose names start with it
    (`models/metrabs.py:396-405`); resolved at trace time (static).

    Raises on a 2D joint with NO matching 3D joint: a size-0 group would
    mean over an empty axis (NaN) and silently drop that joint from
    supervision — a misconfiguration (mismatched naming conventions between
    the 2D and 3D joint sets) that must fail loudly."""
    groups = [
        [joint_info3d.ids[n3] for n3 in joint_info3d.names if n3.startswith(n2)]
        for n2 in joint_info2d.names]
    empty = [n2 for n2, g in zip(joint_info2d.names, groups) if not g]
    if empty:
        raise ValueError(
            f'2D joints {empty} match no 3D joint by name-prefix; check the '
            f'joint naming conventions of the 2D and 3D joint sets')
    return groups


def get_2dlike_joints(coords: jnp.ndarray,
                      index_groups: Sequence[Sequence[int]]) -> jnp.ndarray:
    """Averages matched 3D joints' xy to compare with 2D annotations."""
    cols = [jnp.mean(coords[:, jnp.asarray(list(ids)), :2], axis=1)
            for ids in index_groups]
    return jnp.stack(cols, axis=1)


def compute_loss_with_2d_gt(
        coords3d_pred_abs: jnp.ndarray, coords2d_true: jnp.ndarray,
        intrinsics: jnp.ndarray, joint_validity_mask: jnp.ndarray,
        index_groups: Sequence[Sequence[int]], *, cfg: ModelConfig) -> jnp.ndarray:
    """Weak 2D supervision on the 2D-labeled stream
    (`models/metrabs.py:307-318`)."""
    scale_2d = 1.0 / cfg.proc_side * cfg.box_size_mm / 1000.0
    coords2d_pred_2dlike = get_2dlike_joints(
        reconstruct.project_pose(coords3d_pred_abs, intrinsics), index_groups)
    in_fov_pred = reconstruct.is_within_fov(
        coords2d_pred_2dlike, proc_side=cfg.proc_side, stride=cfg.stride_train,
        centered_stride=cfg.centered_stride)
    near_fov_true = reconstruct.is_within_fov(
        coords2d_true, proc_side=cfg.proc_side, stride=cfg.stride_train,
        centered_stride=cfg.centered_stride, border_factor=-20)
    return masked.reduce_mean_masked(
        jnp.abs((coords2d_true - coords2d_pred_2dlike) * scale_2d),
        jnp.logical_and(joint_validity_mask,
                        jnp.logical_and(in_fov_pred, near_fov_true)))


def reconstruct_absolute_trainmode(
        head2d: jnp.ndarray, head3d: jnp.ndarray, intrinsics: jnp.ndarray,
        mix_3d_inside_fov: jnp.ndarray, step: jnp.ndarray, *,
        cfg: ModelConfig) -> jnp.ndarray:
    """Weak-perspective reconstruction for the first 500 steps (numerical
    warmup), full-perspective afterwards (`models/metrabs.py:214-225`)."""
    weak = reconstruct.reconstruct_absolute(
        head2d, head3d, intrinsics, proc_side=cfg.proc_side,
        stride=cfg.stride_train, centered_stride=cfg.centered_stride,
        mix_3d_inside_fov=mix_3d_inside_fov, weak_perspective=True)
    full = reconstruct.reconstruct_absolute(
        head2d, head3d, intrinsics, proc_side=cfg.proc_side,
        stride=cfg.stride_train, centered_stride=cfg.centered_stride,
        mix_3d_inside_fov=mix_3d_inside_fov, weak_perspective=False)
    return jnp.where(step < 500, weak, full)


def compute_losses_latents_and_all(
        preds_abs: jnp.ndarray, preds_abs_latent: jnp.ndarray,
        preds_abs_2d: jnp.ndarray, preds_abs_2d_latent: jnp.ndarray,
        batch3d: Dict, batch2d: Dict,
        index_groups: Sequence[Sequence[int]], *,
        cfg: ModelConfig, tcfg: TrainConfig, step: jnp.ndarray,
        recombination_weights: jnp.ndarray,
        encoder_weights: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Hybrid student-teacher losses for predict_all_and_latents
    (`models/metrabs.py:320-391`): the all-joints head supervises the latent
    head (teacher), both are tied to GT directly and through the
    encode/decode autoencoder."""
    w_dec = recombination_weights                        # [L, J]
    w_enc = encoder_weights                              # [J, L]
    w_rec = jnp.matmul(w_enc, w_dec, precision='highest')  # [J, J]

    def comb(x, w):
        return jnp.einsum('bjc,jJ->bJc', x, w, precision='highest')

    sg = jax.lax.stop_gradient if tcfg.stop_gradient_latent else (lambda x: x)
    losses = {}

    def loss3d(pred, true, intr, mask=None):
        return compute_loss_with_3d_gt(
            pred, true, intr, mask, cfg=cfg, tcfg=tcfg, step=step)

    # 3D batch (`models/metrabs.py:328-358`).
    losses['loss_allhead_vs_gt'] = loss3d(
        preds_abs, batch3d['coords3d_true'], batch3d['intrinsics'],
        batch3d.get('joint_validity_mask'))
    losses['loss_latentheadreconstruction_vs_gt'] = loss3d(
        comb(preds_abs_latent, w_dec), batch3d['coords3d_true'],
        batch3d['intrinsics'], batch3d.get('joint_validity_mask'))
    losses['loss_allhead_vs_reconstr'] = jnp.mean(
        jnp.abs(preds_abs - comb(preds_abs, w_rec))) / 1000.0
    losses['loss_allhead_ae_vs_gt'] = loss3d(
        comb(preds_abs, w_rec), batch3d['coords3d_true'],
        batch3d['intrinsics'], batch3d.get('joint_validity_mask'))
    losses['loss_latenthead_vs_latents_from_allhead'] = loss3d(
        preds_abs_latent, comb(sg(preds_abs), w_enc), batch3d['intrinsics'])

    teacher_factor = jnp.where(
        step > tcfg.teacher_start_step,
        jnp.float32(tcfg.teacher_loss_factor), jnp.float32(0))
    losses['loss_3dbatch'] = (
        losses['loss_allhead_vs_gt']
        + losses['loss_latentheadreconstruction_vs_gt']
        + tcfg.allhead_aegt_loss_factor * losses['loss_allhead_ae_vs_gt']
        + tcfg.loss_manif_factor * losses['loss_allhead_vs_reconstr']
        + teacher_factor * losses['loss_latenthead_vs_latents_from_allhead'])

    # 2D batch (`models/metrabs.py:360-388`).
    def loss2d(pred):
        return compute_loss_with_2d_gt(
            pred, batch2d['coords2d_true'], batch2d['intrinsics'],
            batch2d['joint_validity_mask'], index_groups, cfg=cfg)

    losses['loss_allhead_vs_gt_2dbatch'] = loss2d(preds_abs_2d)
    losses['loss_latentheadreconstruction_vs_gt_2dbatch'] = loss2d(
        comb(preds_abs_2d_latent, w_dec))
    losses['loss_allhead_vs_reconstr_2dbatch'] = jnp.mean(
        jnp.abs(preds_abs_2d - comb(preds_abs_2d, w_rec))) / 1000.0
    losses['loss_allhead_ae_vs_gt_2dbatch'] = loss2d(comb(preds_abs_2d, w_rec))
    losses['loss_latenthead_vs_latents_from_allhead_2dbatch'] = loss3d(
        preds_abs_2d_latent, comb(sg(preds_abs_2d), w_enc),
        batch2d['intrinsics'])

    losses['loss_2dbatch'] = (
        losses['loss_allhead_vs_gt_2dbatch']
        + losses['loss_latentheadreconstruction_vs_gt_2dbatch']
        + tcfg.allhead_aegt_loss_factor * losses['loss_allhead_ae_vs_gt_2dbatch']
        + 0.5 * (tcfg.loss_manif_factor * tcfg.loss_manif_factor2d
                 * losses['loss_allhead_vs_reconstr_2dbatch'])
        + 0.5 * teacher_factor
        * losses['loss_latenthead_vs_latents_from_allhead_2dbatch'])

    losses['loss'] = (losses['loss_3dbatch']
                      + tcfg.loss2d_factor * losses['loss_2dbatch'])
    return losses


def compute_losses(
        preds_abs: jnp.ndarray, preds_abs_2d: jnp.ndarray, batch3d: Dict,
        batch2d: Dict, index_groups: Sequence[Sequence[int]], *,
        cfg: ModelConfig, tcfg: TrainConfig, step: jnp.ndarray,
        reconstruction_weights: Optional[jnp.ndarray] = None,
        encoder_weights: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Standard (non-hybrid) loss combination (`models/metrabs.py:227-257`).

    With regularize_to_manifold, adds the pred-vs-autoencoder-reconstruction
    penalties using w_reconstruction = w_encode @ w_decode.
    """
    losses = {}
    losses['loss_3dbatch'] = compute_loss_with_3d_gt(
        preds_abs, batch3d['coords3d_true'], batch3d['intrinsics'],
        batch3d.get('joint_validity_mask'), cfg=cfg, tcfg=tcfg, step=step)
    losses['loss_2dbatch'] = compute_loss_with_2d_gt(
        preds_abs_2d, batch2d['coords2d_true'], batch2d['intrinsics'],
        batch2d['joint_validity_mask'], index_groups, cfg=cfg)

    if tcfg.regularize_to_manifold:
        if reconstruction_weights is None:
            raise ValueError('regularize_to_manifold requires autoencoder weights')

        def j2j(x):
            return jnp.einsum('bjc,jJ->bJc', x, reconstruction_weights,
                              precision='highest')

        losses['loss_pred_vs_reconstr'] = jnp.mean(
            jnp.abs(preds_abs - j2j(preds_abs))) / 1000.0
        losses['loss_pred_vs_reconstr_2dbatch'] = jnp.mean(
            jnp.abs(preds_abs_2d - j2j(preds_abs_2d))) / 1000.0
        losses['loss'] = (
            losses['loss_3dbatch']
            + tcfg.loss_manif_factor * losses['loss_pred_vs_reconstr']
            + tcfg.loss2d_factor * losses['loss_2dbatch']
            + (tcfg.loss2d_factor * tcfg.loss_manif_factor
               * tcfg.loss_manif_factor2d * losses['loss_pred_vs_reconstr_2dbatch']))
    else:
        losses['loss'] = (losses['loss_3dbatch']
                          + tcfg.loss2d_factor * losses['loss_2dbatch'])
    return losses
