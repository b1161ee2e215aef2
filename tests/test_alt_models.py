"""Metro / Model25D forward paths and ghost batch normalization."""

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig, TrainConfig
from metrabs_tpu.models.backbones.common import GhostBatchNorm
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metro import Metro, compute_metro_losses
from metrabs_tpu.models.model25d import Model25D, compute_model25d_losses
from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
from metrabs_tpu.train import losses as losses_mod

CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')
TCFG = TrainConfig(training_steps=1000)


def test_metro_forward(rng):
    model = Metro(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 17, 3)
    # Metric root-relative range: within the box volume.
    assert float(jnp.abs(out).max()) <= CFG.box_size_mm


def test_metro_losses(rng):
    groups = losses_mod.get_2d_joint_index_groups(H36M_17, LSP_14)
    pred = jnp.asarray(rng.normal(size=(2, 17, 3)) * 200, jnp.float32)
    batch3d = dict(
        coords3d_true=jnp.asarray(rng.normal(size=(2, 17, 3)) * 200, jnp.float32),
        joint_validity_mask=jnp.ones((2, 17), bool))
    batch2d = dict(
        coords2d_true=jnp.asarray(rng.uniform(10, 50, (2, 14, 2)), jnp.float32),
        joint_validity_mask=jnp.ones((2, 14), bool))
    losses = compute_metro_losses(
        pred, pred, batch3d, batch2d, groups, cfg=CFG, tcfg=TCFG)
    assert np.isfinite(float(losses['loss']))
    assert set(losses) >= {'loss', 'loss3d', 'loss2d'}


def test_model25d_forward_and_bone_solve(rng):
    bones = H36M_17.edges
    bone_lengths = tuple(float(x) for x in
                         np.full(len(bones), 300.0, np.float32))
    model = Model25D(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32),
                     bones=bones, bone_lengths_ideal=bone_lengths)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    K = jnp.tile(jnp.asarray(
        np.array([[70.0, 0, 32], [0, 70.0, 32], [0, 0, 1]], np.float32))[None],
        (2, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), x, K)
    out = model.apply(variables, x, K)
    assert out.shape == (2, 17, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # Absolute depth must be positive (the LM solve starts from a positive
    # distance guess and bone constraints keep it there).
    assert float(out[..., 2].min()) > 0


def test_model25d_losses(rng):
    groups = losses_mod.get_2d_joint_index_groups(H36M_17, LSP_14)
    pred25 = jnp.concatenate([
        jnp.asarray(rng.uniform(10, 50, (2, 17, 2)), jnp.float32),
        jnp.asarray(rng.uniform(500, 1500, (2, 17, 1)), jnp.float32)], axis=-1)
    batch3d = dict(
        coords2d_true=jnp.asarray(rng.uniform(10, 50, (2, 17, 2)), jnp.float32),
        coords3d_true=jnp.asarray(
            rng.normal(size=(2, 17, 3)) * 200 + np.array([0, 0, 3000]), jnp.float32),
        joint_validity_mask=jnp.ones((2, 17), bool))
    batch2d = dict(
        coords2d_true=jnp.asarray(rng.uniform(10, 50, (2, 14, 2)), jnp.float32),
        joint_validity_mask=jnp.ones((2, 14), bool))
    losses = compute_model25d_losses(
        pred25, pred25, batch3d, batch2d, groups, cfg=CFG, tcfg=TCFG)
    assert np.isfinite(float(losses['loss']))
    assert set(losses) >= {'loss', 'loss23d', 'loss_z', 'loss2d'}


def test_ghost_bn_statistics_differ(rng):
    """Ghost BN with 2 splits normalizes each half by its own statistics —
    outputs must differ from plain BN when halves have different stats."""
    x = np.concatenate([
        rng.normal(0, 1, size=(4, 4, 4, 8)),
        rng.normal(5, 3, size=(4, 4, 4, 8))]).astype(np.float32)
    x = jnp.asarray(x)

    plain = GhostBatchNorm(splits=1, dtype=jnp.float32)
    ghost = GhostBatchNorm(splits=2, dtype=jnp.float32)
    v_plain = plain.init(jax.random.PRNGKey(0), x, train=False)
    v_ghost = ghost.init(jax.random.PRNGKey(0), x, train=False)
    y_plain, _ = plain.apply(v_plain, x, train=True, mutable=['batch_stats'])
    y_ghost, _ = ghost.apply(v_ghost, x, train=True, mutable=['batch_stats'])
    assert not np.allclose(np.asarray(y_plain), np.asarray(y_ghost), atol=1e-3)
    # Each ghost half is individually standardized.
    gh = np.asarray(y_ghost)
    assert abs(gh[:4].mean()) < 1e-2 and abs(gh[4:].mean()) < 1e-2
    assert abs(gh[:4].std() - 1) < 5e-2 and abs(gh[4:].std() - 1) < 5e-2
