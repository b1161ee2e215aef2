"""Load-time BN folding (io/bn_fold.py + the backbones' bn_fold layout).

BN at inference is an exact per-channel affine (`effnetv2_utils.py:56-66`),
so the folded model must reproduce the unfolded one to float32 numerics.
Each family is checked end-to-end at f32 (forward equality), plus the
packaged-estimator path that applies the fold by default at load.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metrabs_tpu.io.bn_fold import (
    backbone_supports_bn_fold, bn_epsilon_for, fold_bn_variables)
from metrabs_tpu.models.backbones.builder import build_backbone


def _randomize_bn_stats(variables, rng):
    """Give BN stats non-trivial values (fresh init is mean=0/var=1, which
    would make folding trivially correct)."""
    import flax

    flat = dict(flax.traverse_util.flatten_dict(variables))
    for key in flat:
        if len(key) >= 2 and key[-2] == 'bn':
            shape = flat[key].shape
            if key[-1] == 'mean':
                flat[key] = jnp.asarray(
                    rng.normal(size=shape) * 0.5, jnp.float32)
            elif key[-1] == 'var':
                flat[key] = jnp.asarray(
                    rng.uniform(0.2, 2.0, size=shape), jnp.float32)
            elif key[-1] == 'scale':
                flat[key] = jnp.asarray(
                    rng.uniform(0.5, 1.5, size=shape), jnp.float32)
            elif key[-1] == 'bias':
                flat[key] = jnp.asarray(
                    rng.normal(size=shape) * 0.3, jnp.float32)
    return flax.traverse_util.unflatten_dict(flat)


@pytest.mark.parametrize('name, scan', [
    # The big-backbone cases are multi-minute XLA CPU compiles; the smoke
    # tier keeps mobilenet (generic wrapper case) + resnet18 (bnK/convK +
    # DenseSameConv nesting) for fast transform coverage.
    pytest.param('efficientnetv2-s', True, marks=pytest.mark.slow),
    pytest.param('efficientnetv2-s', False, marks=pytest.mark.slow),
    pytest.param('mobilenetv3-small', False,
                 marks=pytest.mark.slow),
    ('resnet18', False),
    pytest.param('resnet50', False, marks=pytest.mark.slow),
    pytest.param('resnet50v1-5', False, marks=pytest.mark.slow),
])
def test_fold_matches_unfolded_forward(name, scan):
    rng = np.random.default_rng(3)
    model = build_backbone(name, dtype=jnp.float32, scan_blocks=scan)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn_stats(variables, rng)
    ref = model.apply(variables, x, train=False)

    folded_vars = fold_bn_variables(variables, epsilon=bn_epsilon_for(name))
    folded_model = build_backbone(
        name, dtype=jnp.float32, scan_blocks=scan, bn_fold=True)
    out = folded_model.apply(folded_vars, x, train=False)

    # f32 noise only: the fold reorders the affine arithmetic (kernel-side
    # multiply vs activation-side), so isolated elements near relu
    # boundaries differ by ~1e-5 of the activation SCALE (caffe-preproc
    # ResNets run at O(100) activations). A wrong fold is off by the full
    # scale; tolerate 1e-4 of it.
    ref = np.asarray(ref)
    scale = float(np.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), ref, rtol=1e-2, atol=1e-4 * scale + 1e-4)
    # All BN leaves must be gone from the folded tree.
    import flax
    for key in flax.traverse_util.flatten_dict(folded_vars):
        assert 'bn' not in key, key


@pytest.mark.slow
def test_fold_rejects_preact_resnet_v2():
    model = build_backbone('resnet50v2', dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match='no conv sibling'):
        fold_bn_variables(variables, epsilon=1e-5)
    with pytest.raises(ValueError, match='bn_fold'):
        build_backbone('resnet50v2', dtype=jnp.float32, bn_fold=True)


def test_fold_is_inference_only():
    model = build_backbone('mobilenetv3-small', dtype=jnp.float32,
                           bn_fold=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match='inference-only'):
        model.init(jax.random.PRNGKey(0), x, train=True)


@pytest.mark.slow
def test_fold_matches_unfolded_detector():
    """Darknet ConvBlock declares a bare nn.BatchNorm named 'bn' (no
    GhostBatchNorm wrapper) — the resolver's case (b)."""
    from metrabs_tpu.detect.yolov4 import YOLOv4Tiny

    rng = np.random.default_rng(9)
    model = YOLOv4Tiny(dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn_stats(variables, rng)
    ref = model.apply(variables, x, train=False)

    folded = fold_bn_variables(variables, epsilon=1e-5)
    out = YOLOv4Tiny(dtype=jnp.float32, bn_fold=True).apply(
        folded, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_supported_families():
    assert backbone_supports_bn_fold('efficientnetv2-l')
    assert backbone_supports_bn_fold('mobilenetv3-large')
    assert backbone_supports_bn_fold('resnet152')
    assert backbone_supports_bn_fold('resnet50v1-5')
    assert not backbone_supports_bn_fold('resnet50v2')
    assert not backbone_supports_bn_fold('resnet50v1-5-groupnorm')
    assert not backbone_supports_bn_fold('tiny')


@pytest.mark.slow
def test_packaged_estimator_folds_by_default(tmp_path):
    """load_pose_estimator applies the fold for supported families; poses
    must match the unfolded estimator at f32."""
    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.io.packaging import (
        load_pose_estimator, save_pose_estimator_package)
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17

    rng = np.random.default_rng(5)
    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='mobilenetv3-small', warp_backend='gather')
    backbone = build_backbone(cfg.backbone, dtype=jnp.float32)
    model = Metrabs(cfg=cfg, backbone=backbone)
    crops = jnp.zeros((1, 64, 64, 3), jnp.float32)
    K = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 100, (1, 1, 1))
    variables = jax.jit(model.init, static_argnames='train')(
        jax.random.PRNGKey(0), crops, K, train=False)
    variables = _randomize_bn_stats(variables, rng)

    d = str(tmp_path / 'pkg')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=variables,
        joint_info=H36M_17)

    est_folded = load_pose_estimator(d)
    assert est_folded.cfg.bn_fold
    est_plain = load_pose_estimator(d, cfg_overrides={'bn_fold': False})
    assert not est_plain.cfg.bn_fold

    imgs = (rng.uniform(size=(1, 128, 128, 3)) * 255).astype(np.uint8)
    boxes = np.asarray([[[20.0, 20.0, 80.0, 90.0]]], np.float32)
    intr = np.asarray([[[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]]],
                      np.float32)
    out_f = est_folded.estimate_poses_batched(
        imgs, boxes, intrinsic_matrix=intr, num_aug=1)
    out_p = est_plain.estimate_poses_batched(
        imgs, boxes, intrinsic_matrix=intr, num_aug=1)
    np.testing.assert_allclose(np.asarray(out_f['poses3d']),
                               np.asarray(out_p['poses3d']),
                               rtol=1e-4, atol=5e-2)
