"""Latent-joint (hybrid student-teacher) loss tests."""

import numpy as np
import jax
import jax.numpy as jnp

from metrabs_tpu.config import ModelConfig, TrainConfig
from metrabs_tpu.ops.camera import intrinsics_from_fov
from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
from metrabs_tpu.train import losses as losses_mod

CFG = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32')
TCFG = TrainConfig(training_steps=1000, predict_all_and_latents=True)
N_LATENTS = 8


def make_inputs(rng, n3=2, n2=2):
    K = np.asarray(intrinsics_from_fov(55.0, (64, 64)))[0]
    batch3d = dict(
        intrinsics=jnp.tile(jnp.asarray(K)[None], (n3, 1, 1)),
        coords3d_true=jnp.asarray(
            rng.normal(size=(n3, 17, 3)) * 200 + np.array([0, 0, 3000]),
            jnp.float32),
        joint_validity_mask=jnp.ones((n3, 17), bool))
    batch2d = dict(
        intrinsics=jnp.tile(jnp.asarray(K)[None], (n2, 1, 1)),
        coords2d_true=jnp.asarray(rng.uniform(10, 50, (n2, 14, 2)), jnp.float32),
        joint_validity_mask=jnp.ones((n2, 14), bool))
    preds = jnp.asarray(rng.normal(size=(2, 17, 3)) * 200 + np.array([0, 0, 3000]),
                        jnp.float32)
    preds_lat = jnp.asarray(
        rng.normal(size=(2, N_LATENTS, 3)) * 200 + np.array([0, 0, 3000]),
        jnp.float32)
    w_dec = jnp.asarray(rng.normal(size=(N_LATENTS, 17)) / N_LATENTS, jnp.float32)
    w_enc = jnp.asarray(rng.normal(size=(17, N_LATENTS)) / 17, jnp.float32)
    return batch3d, batch2d, preds, preds_lat, w_dec, w_enc


def test_hybrid_losses_finite_and_complete(rng):
    batch3d, batch2d, preds, preds_lat, w_dec, w_enc = make_inputs(rng)
    groups = losses_mod.get_2d_joint_index_groups(H36M_17, LSP_14)
    losses = losses_mod.compute_losses_latents_and_all(
        preds, preds_lat, preds, preds_lat, batch3d, batch2d, groups,
        cfg=CFG, tcfg=TCFG, step=jnp.int32(10000),
        recombination_weights=w_dec, encoder_weights=w_enc)
    expected_keys = {
        'loss', 'loss_3dbatch', 'loss_2dbatch', 'loss_allhead_vs_gt',
        'loss_latentheadreconstruction_vs_gt', 'loss_allhead_vs_reconstr',
        'loss_allhead_ae_vs_gt', 'loss_latenthead_vs_latents_from_allhead'}
    assert expected_keys <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_teacher_loss_gated_by_step(rng):
    batch3d, batch2d, preds, preds_lat, w_dec, w_enc = make_inputs(rng)
    groups = losses_mod.get_2d_joint_index_groups(H36M_17, LSP_14)

    def total(step):
        return float(losses_mod.compute_losses_latents_and_all(
            preds, preds_lat, preds, preds_lat, batch3d, batch2d, groups,
            cfg=CFG, tcfg=TCFG, step=jnp.int32(step),
            recombination_weights=w_dec, encoder_weights=w_enc)['loss'])

    # Before teacher_start_step the teacher term is off -> smaller loss.
    assert total(100) < total(10000)


def test_hybrid_losses_differentiable(rng):
    batch3d, batch2d, preds, preds_lat, w_dec, w_enc = make_inputs(rng)
    groups = losses_mod.get_2d_joint_index_groups(H36M_17, LSP_14)

    def f(p, pl):
        return losses_mod.compute_losses_latents_and_all(
            p, pl, p, pl, batch3d, batch2d, groups,
            cfg=CFG, tcfg=TCFG, step=jnp.int32(10000),
            recombination_weights=w_dec, encoder_weights=w_enc)['loss']

    g1, g2 = jax.grad(f, argnums=(0, 1))(preds, preds_lat)
    assert np.all(np.isfinite(np.asarray(g1)))
    assert np.all(np.isfinite(np.asarray(g2)))
    assert float(jnp.max(jnp.abs(g2))) > 0
