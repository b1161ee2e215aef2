"""Data-parallel inference over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.parallel import mesh as mesh_mod
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import H36M_17

import pytest

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'


CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')


def test_estimator_sharded_over_mesh(rng):
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])

    def crop_fn(state, c, k, v):
        return model.apply(state, c, k, train=False, sample_valid=v)

    mesh = mesh_mod.make_mesh(n_data=8, n_model=1)
    est_sharded = PoseEstimator(crop_fn, H36M_17, CFG,
                                crop_model_state=params, mesh=mesh)
    est_plain = PoseEstimator(crop_fn, H36M_17, CFG, crop_model_state=params)

    images = rng.integers(0, 255, size=(8, 96, 128, 3), dtype=np.uint8)
    boxes = np.tile(np.array([[[20, 10, 60, 80], [50, 5, 40, 70]]], np.float32),
                    (8, 1, 1))
    with mesh:
        out_sharded = est_sharded.estimate_poses_batched(
            images, boxes, num_aug=2, internal_batch_size=64)
    out_plain = est_plain.estimate_poses_batched(
        images, boxes, num_aug=2, internal_batch_size=64)

    p_sharded = np.asarray(out_sharded['poses3d'])
    p_plain = np.asarray(out_plain['poses3d'])
    assert p_sharded.shape == (8, 2, 17, 3)
    assert np.all(np.isfinite(p_sharded))
    # DP must not change results beyond accumulation-order noise... except the
    # full-persp pooled RMS couples crops within a chunk identically in both
    # cases (same chunking), so outputs should agree closely.
    np.testing.assert_allclose(p_sharded, p_plain, rtol=1e-3, atol=0.5)


def test_estimate_stream_sharded_over_mesh(rng):
    """estimate_poses_stream on a mesh-constructed estimator must shard the
    frame-batch axis over 'data' (not silently run unsharded) and match the
    unsharded stream results."""
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])

    def crop_fn(state, c, k, v):
        return model.apply(state, c, k, train=False, sample_valid=v)

    mesh = mesh_mod.make_mesh(n_data=8, n_model=1)
    est_sharded = PoseEstimator(crop_fn, H36M_17, CFG,
                                crop_model_state=params, mesh=mesh)
    est_plain = PoseEstimator(crop_fn, H36M_17, CFG, crop_model_state=params)

    images = rng.integers(0, 255, size=(2, 8, 96, 128, 3), dtype=np.uint8)
    boxes = np.tile(
        np.array([[[[20, 10, 60, 80], [50, 5, 40, 70]]]], np.float32),
        (2, 8, 1, 1))
    with mesh:
        out_sharded = est_sharded.estimate_poses_stream(
            images, boxes, num_aug=2, internal_batch_size=64)
    out_plain = est_plain.estimate_poses_stream(
        images, boxes, num_aug=2, internal_batch_size=64)
    p_s = np.asarray(out_sharded['poses3d'])
    p_p = np.asarray(out_plain['poses3d'])
    assert p_s.shape == (2, 8, 2, 17, 3)
    np.testing.assert_allclose(p_s, p_p, rtol=1e-3, atol=0.5)


def test_fused_detect_sharded_over_mesh(rng):
    """detect_poses_batched (fused) on a mesh-constructed estimator shards
    the frame batch over 'data' and matches the unsharded result."""
    from metrabs_tpu.detect.yolov4 import PersonDetector, YOLOv4Tiny

    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])

    def crop_fn(state, c, k, v):
        return model.apply(state, c, k, train=False, sample_valid=v)

    det_model = YOLOv4Tiny(num_classes=80, dtype=jnp.float32)
    det_vars = det_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 96, 96, 3), jnp.float32),
                              train=False)

    def make(mesh):
        return PoseEstimator(
            crop_fn, H36M_17, CFG, crop_model_state=params, mesh=mesh,
            detector=PersonDetector(det_model, det_vars, input_size=96,
                                    top_candidates=32))

    mesh = mesh_mod.make_mesh(n_data=8, n_model=1)
    images = rng.integers(0, 255, size=(8, 96, 128, 3), dtype=np.uint8)
    kwargs = dict(num_aug=2, max_detections=4, detector_threshold=0.0,
                  suppress_implausible_poses=True)
    with mesh:
        out_s = make(mesh).detect_poses_batched(images, **kwargs)
    out_p = make(None).detect_poses_batched(images, **kwargs)
    np.testing.assert_array_equal(np.asarray(out_s['valid']),
                                  np.asarray(out_p['valid']))
    valid = np.asarray(out_p['valid'])
    np.testing.assert_allclose(
        np.asarray(out_s['poses3d'])[valid],
        np.asarray(out_p['poses3d'])[valid], rtol=1e-3, atol=0.5)


def test_estimator_tensor_parallel_serving(rng):
    """crop_state_shardings: weights split over the 'model' mesh axis
    (tensor-parallel serving) must match replicated-weight DP results —
    GSPMD only changes placement, not math."""
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])

    def crop_fn(state, c, k, v):
        return model.apply(state, c, k, train=False, sample_valid=v)

    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    state_sh = mesh_mod.tp_shardings(mesh, params, min_size=2048)
    # Non-vacuous: the tiny net's 3x3x16x16 kernels must actually shard.
    import jax as _jax
    assert any('model' in str(s.spec)
               for s in _jax.tree_util.tree_leaves(state_sh))
    est_tp = PoseEstimator(crop_fn, H36M_17, CFG, crop_model_state=params,
                           mesh=mesh, crop_state_shardings=state_sh)
    est_plain = PoseEstimator(crop_fn, H36M_17, CFG, crop_model_state=params)

    images = rng.integers(0, 255, size=(8, 96, 128, 3), dtype=np.uint8)
    boxes = np.tile(np.array([[[20, 10, 60, 80], [50, 5, 40, 70]]], np.float32),
                    (8, 1, 1))
    with mesh:
        out_tp = est_tp.estimate_poses_batched(
            images, boxes, num_aug=2, internal_batch_size=64)
    out_plain = est_plain.estimate_poses_batched(
        images, boxes, num_aug=2, internal_batch_size=64)
    p_tp = np.asarray(out_tp['poses3d'])
    p_plain = np.asarray(out_plain['poses3d'])
    assert p_tp.shape == (8, 2, 17, 3)
    np.testing.assert_allclose(p_tp, p_plain, rtol=1e-3, atol=0.5)
