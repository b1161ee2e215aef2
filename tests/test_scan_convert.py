"""Scan-layout converter tests: both block layouts must produce IDENTICAL
outputs for the same (converted) weights, in both directions."""

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.io.scan_convert import flat_to_scanned, scanned_to_flat
from metrabs_tpu.models.backbones.efficientnet_v2 import EfficientNetV2


def test_flat_to_scanned_output_equivalence(rng):
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)

    flat_model = EfficientNetV2(
        model_name='efficientnetv2-s', dtype=jnp.float32, scan_blocks=False)
    flat_vars = flat_model.init({'params': jax.random.PRNGKey(7)}, x, train=False)

    scan_model = EfficientNetV2(
        model_name='efficientnetv2-s', dtype=jnp.float32, scan_blocks=True)
    template = scan_model.init({'params': jax.random.PRNGKey(0)}, x, train=False)

    converted = flat_to_scanned(flat_vars, template)

    y_flat = flat_model.apply(flat_vars, x, train=False)
    y_scan = scan_model.apply(converted, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_flat), np.asarray(y_scan), rtol=1e-5, atol=1e-5)


def test_scanned_to_flat_output_equivalence(rng):
    """The serving-time unroll (load_pose_estimator default since round 4):
    scanned-trained weights, split template-free into the flat layout, must
    drive the unrolled model to the scanned model's exact outputs."""
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)

    scan_model = EfficientNetV2(
        model_name='efficientnetv2-s', dtype=jnp.float32, scan_blocks=True)
    scan_vars = scan_model.init(
        {'params': jax.random.PRNGKey(3)}, x, train=False)

    flat_model = EfficientNetV2(
        model_name='efficientnetv2-s', dtype=jnp.float32, scan_blocks=False)
    flat_vars = scanned_to_flat(scan_vars)

    # Tree structure must match the flat model's own init exactly.
    template = jax.eval_shape(
        lambda: flat_model.init(
            {'params': jax.random.PRNGKey(0)}, x, train=False))
    assert (jax.tree_util.tree_structure(flat_vars)
            == jax.tree_util.tree_structure(template))
    for got, want in zip(jax.tree_util.tree_leaves(flat_vars),
                         jax.tree_util.tree_leaves(template)):
        assert got.shape == want.shape and got.dtype == want.dtype

    y_scan = scan_model.apply(scan_vars, x, train=False)
    y_flat = flat_model.apply(flat_vars, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_scan), np.asarray(y_flat), rtol=1e-5, atol=1e-5)

    # Round trip back to the scanned layout is leaf-exact.
    back = flat_to_scanned(flat_vars, scan_vars)
    for got, want in zip(jax.tree_util.tree_leaves(back),
                         jax.tree_util.tree_leaves(scan_vars)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_load_crop_model_unrolls_scanned_package(tmp_path, rng):
    """Packaged scanned-layout crop model, loaded with scan_blocks=False
    (what load_pose_estimator now does by default), must produce the same
    poses as the stored layout."""
    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.io.packaging import (
        load_crop_model, save_pose_estimator_package)
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17
    from metrabs_tpu.utils.joint_info import JointInfo

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='efficientnetv2-s', warp_backend='gather')
    model = Metrabs(cfg=cfg, backbone=build_backbone(
        'efficientnetv2-s', dtype=jnp.float32, scan_blocks=True))
    crop_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.eye(3)[None])
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    d = str(tmp_path / 'pkg')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=crop_vars,
        joint_info=joint_info)

    kept_model, kept_vars, kept_cfg, _, _ = load_crop_model(d)
    flat_model, flat_vars, flat_cfg, _, _ = load_crop_model(
        d, scan_blocks=False)
    assert kept_cfg.backbone_scan_blocks and not flat_cfg.backbone_scan_blocks

    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    K = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    y_kept = kept_model.apply(kept_vars, x, K, train=False)
    y_flat = flat_model.apply(flat_vars, x, K, train=False)
    np.testing.assert_allclose(
        np.asarray(y_kept), np.asarray(y_flat), rtol=1e-5, atol=1e-4)
