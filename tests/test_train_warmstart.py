"""Backbone warm start (--load-backbone-from) and kernel-norm constraint
(`main.py:186-191`, `builder.py:54-60` parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.config import AugConfig, ModelConfig, TrainConfig

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'



def test_project_kernel_norms():
    from metrabs_tpu.train.optim import project_kernel_norms
    params = {
        'conv': {'kernel': np.full((3, 3, 4, 8), 1.0, np.float32)},
        'dense': {'kernel': np.full((16, 8), 100.0, np.float32)},
        'bias': np.full((8,), 100.0, np.float32)}
    out = project_kernel_norms(params, 2.0)
    norms = np.linalg.norm(
        np.asarray(out['conv']['kernel']).reshape(-1, 8), axis=0)
    np.testing.assert_allclose(norms, 2.0, rtol=1e-5)  # projected onto ball
    # non-4D leaves untouched (Keras constrains only convs)
    np.testing.assert_array_equal(out['dense']['kernel'],
                                  params['dense']['kernel'])
    np.testing.assert_array_equal(out['bias'], params['bias'])
    # already-small kernels untouched
    small = {'conv': {'kernel': np.full((3, 3, 4, 8), 1e-3, np.float32)}}
    np.testing.assert_array_equal(
        np.asarray(project_kernel_norms(small, 2.0)['conv']['kernel']),
        small['conv']['kernel'])


def test_train_step_applies_kernel_constraint(rng):
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
    from metrabs_tpu.train import loop as loop_mod, optim

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32')
    tcfg = TrainConfig(training_steps=10, constrain_kernel_norm=0.5)
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    tx = optim.build_optimizer(tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    step = jax.jit(loop_mod.make_train_step(
        model, tx, H36M_17, LSP_14, cfg, tcfg))

    n = 4
    K = np.tile(np.array([[250.0, 0, 32], [0, 250.0, 32], [0, 0, 1]],
                         np.float32)[None], (n, 1, 1))
    b3 = dict(image=rng.uniform(size=(n, 64, 64, 3)).astype(np.float32),
              intrinsics=K,
              coords3d_true=(rng.normal(size=(n, 17, 3)) * 200
                             + [0, 0, 3000]).astype(np.float32),
              joint_validity_mask=np.ones((n, 17), bool))
    b2 = dict(image=rng.uniform(size=(n, 64, 64, 3)).astype(np.float32),
              intrinsics=K,
              coords2d_true=rng.uniform(10, 54, size=(n, 14, 2)).astype(
                  np.float32),
              joint_validity_mask=np.ones((n, 14), bool))
    state, _ = step(state, b3, b2, jax.random.PRNGKey(1))

    def max_conv_norm(t):
        worst = 0.0
        for leaf in jax.tree_util.tree_leaves(t):
            x = np.asarray(leaf)
            if x.ndim == 4:
                worst = max(worst, float(np.linalg.norm(
                    x.reshape(-1, x.shape[-1]), axis=0).max()))
        return worst

    # Only the backbone is constrained (`builder.py:54-60` constructs just
    # the effnetv2 model with MinMaxNorm; the head conv is unconstrained,
    # `models/metrabs.py:95`).
    assert max_conv_norm(state.params['backbone']) <= 0.5 + 1e-5
    head_norm = max_conv_norm(state.params['heatmap_heads'])
    assert head_norm > 0.5, (
        f'head conv must NOT be norm-clipped (got {head_norm}); a tiny '
        f'head norm would mean the projection leaked outside the backbone')


def test_train_cli_load_backbone_from(tmp_path, rng):
    """Export a tiny package, then train a fresh model with
    --load-backbone-from: the new state must start from the source backbone
    and carry the source head joints in its last head slots."""
    from metrabs_tpu.apps import train as train_cli
    from metrabs_tpu.io.packaging import save_pose_estimator_package
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17
    from metrabs_tpu.utils.joint_info import JointInfo
    from tests.test_train_cli import _write_datasets

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='tiny', warp_backend='gather')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=32,
                                                   dtype=jnp.float32))
    src_vars = model.init(jax.random.PRNGKey(7),
                          jnp.zeros((1, 64, 64, 3), jnp.float32),
                          jnp.eye(3)[None])
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    pkg = str(tmp_path / 'src_pkg')
    save_pose_estimator_package(
        pkg, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=src_vars,
        joint_info=joint_info)

    p3, p2 = _write_datasets(tmp_path, rng)
    ckpt_dir = str(tmp_path / 'ckpt_ws')
    export_dir = str(tmp_path / 'pkg_ws')
    train_cli.main([
        '--ds3d', p3, '--ds2d', p2, '--checkpoint-dir', ckpt_dir,
        '--backbone', 'tiny', '--proc-side', '64', '--depth', '4',
        '--batch-size', '8', '--batch-size-2d', '8', '--training-steps', '0',
        '--workers', '2', '--dtype', 'float32', '--checkpoint-period', '1',
        '--export-dir', export_dir, '--load-backbone-from', pkg])

    from metrabs_tpu.io.checkpoints import load_model_msgpack
    import os
    out_vars = load_model_msgpack(
        os.path.join(export_dir, 'crop_model.msgpack'))['variables']
    src_bb = jax.tree_util.tree_leaves(src_vars['params']['backbone'])
    out_bb = jax.tree_util.tree_leaves(out_vars['params']['backbone'])
    for a, b in zip(src_bb, out_bb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # head surgery: the exported head's last slots equal the source head's
    src_k = np.asarray(src_vars['params']['heatmap_heads']['conv_final']['kernel'])
    out_k = np.asarray(out_vars['params']['heatmap_heads']['conv_final']['kernel'])
    np.testing.assert_allclose(out_k, src_k, atol=1e-6)  # same joint count


def test_train_cli_in_training_validation(tmp_path, rng):
    """--ds3d-val/--validate-period: the metric pass runs during training
    and writes val_* records to the JSONL log (`main.py:84-93,143-145`)."""
    import json
    import os
    from metrabs_tpu.apps import train as train_cli
    from tests.test_train_cli import _write_datasets

    p3, p2 = _write_datasets(tmp_path, rng)
    ckpt_dir = str(tmp_path / 'ckpt_val')
    train_cli.main([
        '--ds3d', p3, '--ds2d', p2, '--checkpoint-dir', ckpt_dir,
        '--backbone', 'tiny', '--proc-side', '64', '--depth', '4',
        '--batch-size', '8', '--batch-size-2d', '8', '--training-steps', '2',
        '--workers', '2', '--dtype', 'float32', '--checkpoint-period', '1',
        '--ds3d-val', p3, '--validate-period', '1', '--batch-size-test', '8'])
    with open(os.path.join(ckpt_dir, 'train_log.jsonl')) as f:
        recs = [json.loads(l) for l in f]
    val_recs = [r for r in recs if 'val_mean_error' in r]
    assert len(val_recs) == 2  # every step with period 1 over 2 steps
    assert all(np.isfinite(r['val_mean_error']) for r in val_recs)
