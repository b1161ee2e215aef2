"""detect_poses end-to-end: tiny YOLO + tiny crop model through the full
fused pipeline (detector glue, plausibility filter, NMS, world transform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.detect.yolov4 import PersonDetector, YOLOv4
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import H36M_17

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'


CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')


@pytest.fixture(scope='module')
def full_estimator():
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])

    def crop_model_fn(crops, intrinsics, valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=valid)

    yolo = YOLOv4(num_classes=80, dtype=jnp.float32)
    det_vars = yolo.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 96, 96, 3)), train=False)
    detector = PersonDetector(yolo, det_vars, input_size=96, top_candidates=32)
    return PoseEstimator(crop_model_fn, H36M_17, CFG, detector=detector)


def test_detect_poses_batched_shapes(full_estimator, rng):
    images = rng.integers(0, 255, size=(2, 120, 160, 3), dtype=np.uint8)
    out = full_estimator.detect_poses_batched(
        images, num_aug=2, max_detections=4, detector_threshold=0.0,
        suppress_implausible_poses=True)
    assert np.asarray(out['poses3d']).shape == (2, 4, 17, 3)
    assert np.asarray(out['boxes']).shape == (2, 4, 5)
    assert np.asarray(out['valid']).shape == (2, 4)
    p3 = np.asarray(out['poses3d'])
    valid = np.asarray(out['valid'])
    if valid.any():
        assert np.all(np.isfinite(p3[valid]))


def test_detect_poses_single_image(full_estimator, rng):
    image = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    out = full_estimator.detect_poses(
        image, num_aug=1, max_detections=4, detector_threshold=0.0,
        suppress_implausible_poses=False)
    # Compacted to valid rows only.
    n = out['poses3d'].shape[0]
    assert out['poses3d'].shape == (n, 17, 3)
    assert out['boxes'].shape == (n, 5)


def test_detect_with_flip_aug(full_estimator, rng):
    images = rng.integers(0, 255, size=(1, 96, 96, 3), dtype=np.uint8)
    out = full_estimator.detect_poses_batched(
        images, num_aug=1, max_detections=4, detector_threshold=0.0,
        detector_flip_aug=True, suppress_implausible_poses=False)
    assert np.asarray(out['poses3d']).shape == (1, 4, 17, 3)


def test_fused_matches_unfused(full_estimator, rng):
    """The single-program fused detect+estimate must equal the two-dispatch
    path (same detector, same chunking)."""
    images = rng.integers(0, 255, size=(1, 120, 160, 3), dtype=np.uint8)
    kwargs = dict(num_aug=2, max_detections=4, detector_threshold=0.0,
                  suppress_implausible_poses=True)
    out_f = full_estimator.detect_poses_batched(images, fused=True, **kwargs)
    out_u = full_estimator.detect_poses_batched(images, fused=False, **kwargs)
    np.testing.assert_array_equal(np.asarray(out_f['valid']),
                                  np.asarray(out_u['valid']))
    np.testing.assert_allclose(np.asarray(out_f['poses3d']),
                               np.asarray(out_u['poses3d']),
                               rtol=1e-4, atol=0.1)


def test_detect_poses_stream_matches_batched(full_estimator, rng):
    """ONE-dispatch streamed serving (lax.map over K frame-batches) must
    match K independent detect_poses_batched calls."""
    images_k = rng.integers(0, 255, size=(2, 2, 120, 160, 3), dtype=np.uint8)
    kwargs = dict(num_aug=2, max_detections=4, detector_threshold=0.0,
                  suppress_implausible_poses=True)
    out_s = full_estimator.detect_poses_stream(images_k, **kwargs)
    assert np.asarray(out_s['poses3d']).shape == (2, 2, 4, 17, 3)
    assert np.asarray(out_s['valid']).shape == (2, 2, 4)
    for k in range(2):
        out_b = full_estimator.detect_poses_batched(images_k[k], **kwargs)
        np.testing.assert_array_equal(np.asarray(out_s['valid'])[k],
                                      np.asarray(out_b['valid']))
        np.testing.assert_allclose(
            np.asarray(out_s['boxes'])[k], np.asarray(out_b['boxes']),
            rtol=1e-5, atol=1e-4)
        valid = np.asarray(out_b['valid'])
        np.testing.assert_allclose(
            np.asarray(out_s['poses3d'])[k][valid],
            np.asarray(out_b['poses3d'])[valid], rtol=1e-4, atol=0.5)


def test_detect_poses_stream_rejects_4d(full_estimator, rng):
    images = rng.integers(0, 255, size=(2, 120, 160, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        full_estimator.detect_poses_stream(images)


def test_detect_with_joint_transform_and_suppression(full_estimator, rng):
    """A joint-count-changing joint_transform_matrix must compose with the
    plausibility filter: the bone check slices to the model joints
    (reference `plausibility_check.py:18`)."""
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    # 17 model joints -> 20 output joints (first 17 passthrough + 3 blends).
    jt = np.zeros((17, 20), np.float32)
    jt[:17, :17] = np.eye(17)
    jt[:, 17] = 1 / 17
    jt[1, 18] = 0.5
    jt[2, 18] = 0.5
    jt[3, 19] = 1.0
    est = PoseEstimator(
        full_estimator.crop_model_fn_with_state, H36M_17, CFG,
        detector=full_estimator.detector, joint_transform_matrix=jt)
    images = rng.integers(0, 255, size=(1, 120, 160, 3), dtype=np.uint8)
    out = est.detect_poses_batched(
        images, num_aug=2, max_detections=4, detector_threshold=0.0,
        suppress_implausible_poses=True)
    # The default skeleton ('') gathers the 17 registry joints back out of
    # the 20 transformed ones; the point of this test is that the
    # plausibility bone check SLICED the 20-joint poses to the 17 model
    # joints instead of crashing at trace time (pre-fix behavior).
    p3 = np.asarray(out['poses3d'])
    assert p3.shape == (1, 4, 17, 3)
    valid = np.asarray(out['valid'])
    if valid.any():
        assert np.all(np.isfinite(p3[valid]))


def test_detect_poses_pipelined_matches_batched(full_estimator, rng):
    """The overlapped-dispatch generator must be semantically identical to
    per-batch detect_poses_batched, for both in_flight depths and both the
    unfused and fused underlying paths."""
    batches = [rng.integers(0, 255, size=(2, 120, 160, 3), dtype=np.uint8)
               for _ in range(3)]
    kwargs = dict(num_aug=2, max_detections=4, detector_threshold=0.0,
                  suppress_implausible_poses=True)
    want = [full_estimator.detect_poses_batched(b, fused=False, **kwargs)
            for b in batches]
    for fused in (False, True):
        for in_flight in (1, 2):
            got = list(full_estimator.detect_poses_pipelined(
                iter(batches), in_flight=in_flight, fused=fused, **kwargs))
            assert len(got) == len(batches)
            for g, w in zip(got, want):
                assert set(g) == set(w)
                for k in g:
                    np.testing.assert_allclose(
                        g[k], np.asarray(w[k]), atol=1e-5, err_msg=k)


def test_detect_poses_pipelined_validates_args(full_estimator, rng):
    with pytest.raises(ValueError, match='in_flight'):
        list(full_estimator.detect_poses_pipelined([], in_flight=0))
