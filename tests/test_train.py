"""Training-stack tests: losses, schedules, full train step, and the
data-parallel sharded step on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.config import ModelConfig, TrainConfig
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.models.metro import Metro
from metrabs_tpu.models.model25d import Model25D
from metrabs_tpu.ops.camera import intrinsics_from_fov
from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
from metrabs_tpu.train import losses as losses_mod
from metrabs_tpu.train import loop as loop_mod
from metrabs_tpu.train import optim

CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')
TCFG = TrainConfig(training_steps=1000, batch_size=4, batch_size_2d=4,
                   grad_accum_steps=1, ema_momentum=0.99)


def make_batches(rng, n3=4, n2=4):
    K = np.asarray(intrinsics_from_fov(55.0, (64, 64)))[0]
    batch3d = dict(
        image=rng.uniform(size=(n3, 64, 64, 3)).astype(np.float32),
        intrinsics=np.tile(K[None], (n3, 1, 1)).astype(np.float32),
        coords3d_true=(rng.normal(size=(n3, 17, 3)) * 200
                       + np.array([0, 0, 3000])).astype(np.float32),
        joint_validity_mask=np.ones((n3, 17), bool))
    batch2d = dict(
        image=rng.uniform(size=(n2, 64, 64, 3)).astype(np.float32),
        intrinsics=np.tile(K[None], (n2, 1, 1)).astype(np.float32),
        coords2d_true=rng.uniform(10, 50, size=(n2, 14, 2)).astype(np.float32),
        joint_validity_mask=np.ones((n2, 14), bool))
    return {k: jnp.asarray(v) for k, v in batch3d.items()}, \
           {k: jnp.asarray(v) for k, v in batch2d.items()}


def test_lr_schedule_phases():
    sched = optim.lr_schedule(TCFG)
    b = TCFG.base_learning_rate
    np.testing.assert_allclose(sched(0), b, rtol=1e-6)
    # End of phase 1 (92%): decayed to ~b/3.
    np.testing.assert_allclose(sched(919), b / 3, rtol=2e-3)
    # Phase 2 starts at exactly 92% (reference uses `<`): drops to b/30.
    np.testing.assert_allclose(sched(920), b / 30, rtol=1e-4)
    # End of training: b/30 * 0.3.
    np.testing.assert_allclose(sched(1000), b / 30 * 0.3, rtol=1e-4)


def test_loss_3d_perfect_prediction_zero(rng):
    K = jnp.asarray(intrinsics_from_fov(55.0, (64, 64)))
    pose = jnp.asarray(
        (rng.normal(size=(2, 17, 3)) * 100 + np.array([0, 0, 3000])), jnp.float32)
    loss = losses_mod.compute_loss_with_3d_gt(
        pose, pose, jnp.tile(K, (2, 1, 1)), jnp.ones((2, 17), bool),
        cfg=CFG, tcfg=TCFG, step=jnp.int32(10000))
    assert float(loss) < 1e-6


def test_loss_3d_scales_with_error(rng):
    K = jnp.asarray(intrinsics_from_fov(55.0, (64, 64)))
    pose = jnp.asarray(
        (rng.normal(size=(2, 17, 3)) * 100 + np.array([0, 0, 3000])), jnp.float32)
    loss_small = losses_mod.compute_loss_with_3d_gt(
        pose + 10, pose, jnp.tile(K, (2, 1, 1)), jnp.ones((2, 17), bool),
        cfg=CFG, tcfg=TCFG, step=jnp.int32(10000))
    loss_big = losses_mod.compute_loss_with_3d_gt(
        pose + 100, pose, jnp.tile(K, (2, 1, 1)), jnp.ones((2, 17), bool),
        cfg=CFG, tcfg=TCFG, step=jnp.int32(10000))
    assert float(loss_big) > float(loss_small) > 0


def test_2d_index_groups():
    groups = losses_mod.get_2d_joint_index_groups(H36M_17, LSP_14)
    assert len(groups) == 14
    # 'rank' in LSP matches 'rank' in h36m (index 3).
    assert groups[0] == [3]
    # every LSP_14 joint must match at least one h36m joint
    assert all(len(g) >= 1 for g in groups)


@pytest.fixture(scope='module')
def train_setup():
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    tx = optim.build_optimizer(TCFG)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, TCFG)
    return model, tx, state, step_fn


def test_bf16_mu_dtype_optimizer_state(rng):
    import dataclasses
    tcfg = dataclasses.replace(TCFG, optimizer_mu_dtype='bfloat16')
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    tx = optim.build_optimizer(tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    # Adam's first moment is bf16, second moment stays f32.
    adam_state = state.opt_state[0] if isinstance(state.opt_state, tuple) \
        else state.opt_state
    mus = jax.tree_util.tree_leaves(adam_state.mu)
    nus = jax.tree_util.tree_leaves(adam_state.nu)
    assert all(m.dtype == jnp.bfloat16 for m in mus)
    assert all(n.dtype == jnp.float32 for n in nus)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, tcfg)
    batch3d, batch2d = make_batches(rng)
    state1, losses = jax.jit(step_fn)(state, batch3d, batch2d,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(losses['loss']))


def test_train_step_decreases_nothing_nan(train_setup, rng):
    _, _, state, step_fn = train_setup
    batch3d, batch2d = make_batches(rng)
    jitted = jax.jit(step_fn)
    state1, losses1 = jitted(state, batch3d, batch2d, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    assert np.isfinite(float(losses1['loss']))
    # params actually changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state1.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_overfits_tiny_batch(train_setup, rng):
    """A few steps on one batch should reduce the loss (end-to-end gradient
    sanity through backbone, heads, soft-argmax and reconstruction)."""
    _, _, state, step_fn = train_setup
    batch3d, batch2d = make_batches(rng)
    jitted = jax.jit(step_fn)
    losses_first = None
    for i in range(8):
        state, losses = jitted(state, batch3d, batch2d, jax.random.PRNGKey(100))
        if losses_first is None:
            losses_first = float(losses['loss'])
    assert float(losses['loss']) < losses_first


def test_sharded_train_step_on_mesh(train_setup, rng):
    """DP train step over the virtual 8-device CPU mesh."""
    from metrabs_tpu.parallel import mesh as mesh_mod
    model, tx, state, step_fn = train_setup
    mesh = mesh_mod.make_mesh(n_data=8, n_model=1)
    sharded = loop_mod.make_sharded_train_step(step_fn, mesh)
    batch3d, batch2d = make_batches(rng, n3=8, n2=8)
    with mesh:
        state1, losses = sharded(state, batch3d, batch2d, jax.random.PRNGKey(2))
    assert np.isfinite(float(losses['loss']))
    assert int(state1.step) == 1


def test_tp_sharded_train_step_matches_dp(train_setup, rng):
    """Tensor-parallel state shardings (kernels split over the 'model' mesh
    axis) must be numerically equivalent to pure DP — GSPMD inserts the
    collectives, the math is unchanged. Runs the same step on an (8 data,
    1 model) and a (4 data, 2 model) mesh and compares updated params."""
    from metrabs_tpu.parallel import mesh as mesh_mod
    model, tx, state, step_fn = train_setup
    batch3d, batch2d = make_batches(rng, n3=8, n2=8)

    mesh_dp = mesh_mod.make_mesh(n_data=8, n_model=1)
    sharded_dp = loop_mod.make_sharded_train_step(step_fn, mesh_dp)
    with mesh_dp:
        state_dp, losses_dp = sharded_dp(
            state, batch3d, batch2d, jax.random.PRNGKey(2))

    mesh_tp = mesh_mod.make_mesh(n_data=4, n_model=2)
    # min_size below the tiny net's 3x3x16x16 kernels so the TP path is
    # actually exercised, not vacuously replicated.
    state_sh = mesh_mod.tp_shardings(mesh_tp, state, min_size=2048)
    sharded_tp = loop_mod.make_sharded_train_step(
        step_fn, mesh_tp, state_shardings=state_sh)
    with mesh_tp:
        state_tp, losses_tp = sharded_tp(
            state, batch3d, batch2d, jax.random.PRNGKey(2))

    # Non-vacuous: at least one parameter leaf really lives sharded over
    # the model axis.
    specs = [str(l.sharding.spec)
             for l in jax.tree_util.tree_leaves(state_tp.params)]
    assert any('model' in s for s in specs), specs

    np.testing.assert_allclose(
        float(losses_dp['loss']), float(losses_tp['loss']), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        state_dp.params, state_tp.params)


def test_ema_update():
    p = {'w': jnp.ones(3)}
    e = {'w': jnp.zeros(3)}
    out = optim.ema_update(e, p, 0.9)
    np.testing.assert_allclose(out['w'], 0.1 * np.ones(3), atol=1e-6)
    out_off = optim.ema_update(e, p, 1.0)
    np.testing.assert_allclose(out_off['w'], np.ones(3))


def test_finetune_in_inference_mode_freezes_batch_stats():
    """The bn_inference step (SwitchToInferenceMode recipe,
    `metrabs_tf/main.py:131-134`): batch_stats stay frozen, params update."""
    rng = np.random.default_rng(5)
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(
        width=16, dtype=jnp.float32, use_bn=True))
    tx = optim.build_optimizer(TCFG)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    assert jax.tree_util.tree_leaves(state.batch_stats), 'fixture needs BN'
    b3, b2 = make_batches(rng)

    step_train = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, TCFG)
    step_inf = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, TCFG,
                                        bn_inference=True)

    # Normal step: batch_stats move.
    s1, _ = jax.jit(step_train)(state, b3, b2, jax.random.PRNGKey(1))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.batch_stats, s1.batch_stats)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # Inference-mode step: batch_stats identical, params still update.
    s2, losses = jax.jit(step_inf)(s1, b3, b2, jax.random.PRNGKey(2))
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        s1.batch_stats, s2.batch_stats)
    assert all(jax.tree_util.tree_leaves(same))
    p_moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(p_moved)) > 0
    assert np.isfinite(float(losses['loss']))


def _affine_weights(rng, n_joints=17, n_latents=8):
    return {'encoder_weights':
                rng.normal(size=(n_joints, n_latents)).astype(np.float32) * 0.3,
            'recombination_weights':
                rng.normal(size=(n_latents, n_joints)).astype(np.float32) * 0.3}


def test_train_step_transform_coords(rng):
    """transform_coords training: the latent head's reconstruction is decoded
    to joints before the losses (`models/metrabs.py:190-191`)."""
    import dataclasses
    tcfg = dataclasses.replace(TCFG, transform_coords=True)
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32),
                    latent_mode='transform_coords', n_latents=8)
    tx = optim.build_optimizer(tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    aff = _affine_weights(rng)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, tcfg,
                                       affine_weights=aff)
    b3, b2 = make_batches(rng)
    s1, losses = jax.jit(step_fn)(state, b3, b2, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses['loss']))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, s1.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_predict_all_and_latents_uses_hybrid_losses(rng):
    """predict_all_and_latents must route through the hybrid student-teacher
    losses (`models/metrabs.py:228-229`), not plain compute_losses."""
    import dataclasses
    tcfg = dataclasses.replace(TCFG, predict_all_and_latents=True)
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32),
                    latent_mode='predict_all_and_latents', n_latents=8)
    tx = optim.build_optimizer(tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    aff = _affine_weights(rng)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, tcfg,
                                       affine_weights=aff)
    b3, b2 = make_batches(rng)
    s1, losses = jax.jit(step_fn)(state, b3, b2, jax.random.PRNGKey(1))
    assert 'loss_latentheadreconstruction_vs_gt' in losses
    assert 'loss_latenthead_vs_latents_from_allhead' in losses
    assert np.isfinite(float(losses['loss']))


def test_train_step_regularize_to_manifold(rng):
    """Manifold regularization threads the AE reconstruction weights; without
    affine weights make_train_step must fail at BUILD time, not at trace."""
    import dataclasses
    tcfg = dataclasses.replace(TCFG, regularize_to_manifold=True)
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    tx = optim.build_optimizer(tcfg)
    with pytest.raises(ValueError, match='autoencoder'):
        loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, tcfg,
                                       affine_weights=_affine_weights(rng))
    b3, b2 = make_batches(rng)
    _, losses = jax.jit(step_fn)(state, b3, b2, jax.random.PRNGKey(1))
    assert 'loss_pred_vs_reconstr' in losses
    assert np.isfinite(float(losses['loss']))


def test_train_step_latent_mode_mismatch_raises(rng):
    import dataclasses
    tcfg = dataclasses.replace(TCFG, predict_all_and_latents=True)
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    tx = optim.build_optimizer(tcfg)
    with pytest.raises(ValueError, match='latent_mode'):
        loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, tcfg,
                                 affine_weights=_affine_weights(rng))


def test_ema_updates_only_on_applied_steps(rng):
    """Under optax.MultiSteps accumulation the EMA must blend once per
    APPLIED optimizer update, not per micro-step (the reference's Keras EMA
    sits behind the accumulator)."""
    import dataclasses
    tcfg = dataclasses.replace(TCFG, grad_accum_steps=2, ema_momentum=0.9)
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    tx = optim.build_optimizer(tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, CFG, tcfg)
    b3, b2 = make_batches(rng)
    jitted = jax.jit(step_fn)
    # Micro-step 1: accumulate only; params and EMA must be untouched.
    s1, _ = jitted(state, b3, b2, jax.random.PRNGKey(1))
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.ema_params, s1.ema_params)
    assert all(jax.tree_util.tree_leaves(same))
    # Micro-step 2: the update applies; EMA blends exactly once.
    s2, _ = jitted(s1, b3, b2, jax.random.PRNGKey(2))
    expected = jax.tree_util.tree_map(
        lambda e, p: 0.9 * np.asarray(e) + 0.1 * np.asarray(p),
        s1.ema_params, s2.params)
    actual_vs_expected = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        s2.ema_params, expected)
    assert max(jax.tree_util.tree_leaves(actual_vs_expected)) < 1e-6


def test_empty_2d_index_group_raises():
    from metrabs_tpu.utils.joint_info import JointInfo
    ji2d = JointInfo(names=('lank', 'nose_tip'), edges=())
    with pytest.raises(ValueError, match='nose_tip'):
        losses_mod.get_2d_joint_index_groups(H36M_17, ji2d)


def test_train_step_metro(rng):
    """Metro training (`metro.py:60-107`): no intrinsics input, root-relative
    3D L1 + aligned weak 2D loss; params must move and losses stay finite."""
    model = Metro(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    tx = optim.build_optimizer(TCFG)
    state = loop_mod.create_train_state(
        model, tx, jax.random.PRNGKey(0), CFG, with_intrinsics=False)
    step_fn = loop_mod.make_train_step_metro(
        model, tx, H36M_17, LSP_14, CFG, TCFG)
    b3, b2 = make_batches(rng)
    s1, losses = jax.jit(step_fn)(state, b3, b2, jax.random.PRNGKey(1))
    assert set(losses) >= {'loss', 'loss3d', 'loss2d'}
    assert np.isfinite(float(losses['loss']))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, s1.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_model25d(rng):
    """Model25D training (`twofive.py:70-122`): supervises the raw 2.5D head
    (2D px + relative-z + weak 2D); the LM solve is inference-only."""
    bones = H36M_17.edges
    model = Model25D(
        cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32),
        bones=bones,
        bone_lengths_ideal=tuple(float(x) for x in np.full(len(bones), 300.0)))
    tx = optim.build_optimizer(TCFG)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), CFG)
    step_fn = loop_mod.make_train_step_model25d(
        model, tx, H36M_17, LSP_14, CFG, TCFG)
    b3, b2 = make_batches(rng)
    # model25d additionally supervises 2D pixel coords on the 3D batch.
    b3 = dict(b3, coords2d_true=jnp.asarray(
        rng.uniform(10, 50, size=(4, 17, 2)).astype(np.float32)))
    s1, losses = jax.jit(step_fn)(state, b3, b2, jax.random.PRNGKey(1))
    assert set(losses) >= {'loss', 'loss23d', 'loss_z', 'loss2d'}
    assert np.isfinite(float(losses['loss']))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, s1.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
