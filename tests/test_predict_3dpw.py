"""3DPW prediction driver test: fake dataset layout + stub estimator
(`apps/predict_3dpw.py` mirrors `inference_scripts/predict_tdpw.py`)."""

import os
import pickle

import numpy as np
import pytest

from metrabs_tpu.apps import predict_3dpw
from metrabs_tpu.eval.association import pose_to_mask
from metrabs_tpu.pipeline.skeletons import SMPL_24

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'


N_FRAMES = 3
H, W = 128, 160


def make_pose2d(rng, center):
    return (rng.normal(size=(24, 2)) * 12 + center).astype(np.float32)


class StubEstimator:
    """Returns two fixed detections per frame, in swapped track order."""

    def __init__(self, pose_a, pose_b):
        self.pose_a = pose_a
        self.pose_b = pose_b
        self.calls = []

    def detect_poses_batched(self, images, **kwargs):
        self.calls.append(kwargs)
        b = len(images)
        poses2d = np.stack([np.stack([self.pose_b, self.pose_a])] * b)
        poses3d = np.concatenate([
            np.full((b, 1, 24, 3), 2000.0, np.float32),
            np.full((b, 1, 24, 3), 1000.0, np.float32)], axis=1)
        return dict(
            poses3d=poses3d, poses2d=poses2d,
            boxes=np.zeros((b, 2, 5), np.float32),
            valid=np.ones((b, 2), bool))


@pytest.fixture
def fake_3dpw(tmp_path, rng):
    import cv2
    root = tmp_path / '3dpw'
    seq_dir = root / 'sequenceFiles' / 'test'
    img_dir = root / 'imageFiles' / 'seqA'
    masks_dir = tmp_path / 'stcn-pred'
    for d in (seq_dir, img_dir, masks_dir):
        os.makedirs(d)

    pose_a = make_pose2d(rng, [45, 45])
    pose_b = make_pose2d(rng, [110, 70])
    # 3DPW raw layout: poses2d is [T, F, 3, J2] (COCO-18 with confidence).
    poses2d_raw = rng.uniform(10, 100, size=(2, N_FRAMES, 3, 18)).astype(
        np.float32)
    seq = dict(poses2d=poses2d_raw,
               cam_intrinsics=np.array(
                   [[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                   np.float32))
    with open(seq_dir / 'seqA.pkl', 'wb') as f:
        pickle.dump(seq, f)
    for i in range(N_FRAMES):
        cv2.imwrite(str(img_dir / f'image_{i:05d}.jpg'),
                    rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    # Per-frame per-track masks in (a, b) order, drawn from the true poses.
    masks = [[pose_to_mask(p, (H, W), SMPL_24, thickness=8)
              for p in (pose_a, pose_b)] for _ in range(N_FRAMES)]
    with open(masks_dir / 'seqA.pkl', 'wb') as f:
        pickle.dump(masks, f)
    return root, masks_dir, pose_a, pose_b


def test_predict_3dpw_mask_association(fake_3dpw, tmp_path, monkeypatch):
    root, masks_dir, pose_a, pose_b = fake_3dpw
    out_dir = tmp_path / 'preds'
    stub = StubEstimator(pose_a, pose_b)
    monkeypatch.setattr(
        'metrabs_tpu.io.packaging.load_pose_estimator', lambda p: stub)
    viz_dir = tmp_path / 'viz'
    predict_3dpw.main([
        '--package', 'stub', '--root', str(root),
        '--output-path', str(out_dir), '--masks-dir', str(masks_dir),
        '--real-intrinsics', '--num-aug', '2', '--batch-size', '2',
        '--viz-dir', str(viz_dir), '--viz-step', '2'])
    assert (viz_dir / 'seqA_00000.jpg').exists()
    assert (viz_dir / 'seqA_00002.jpg').exists()

    with open(out_dir / 'test' / 'seqA.pkl', 'rb') as f:
        result = pickle.load(f)
    coords = result['jointPositions']
    assert coords.shape == (2, N_FRAMES, 24, 3)
    # Track 0 (mask of pose_a) must get the pose worth 1000mm -> 1.0m,
    # despite the stub returning detections in swapped order.
    np.testing.assert_allclose(coords[0], 1.0)
    np.testing.assert_allclose(coords[1], 2.0)
    # The driver passed the reference's detection kwargs.
    kw = stub.calls[0]
    assert kw['detector_threshold'] == 0.2
    assert kw['suppress_implausible_poses'] is False
    assert kw['skeleton'] == 'smpl_24'
    assert kw['intrinsic_matrix'].shape == (2, 3, 3)
    # Rerun skips completed sequences.
    n_calls = len(stub.calls)
    predict_3dpw.main([
        '--package', 'stub', '--root', str(root),
        '--output-path', str(out_dir), '--masks-dir', str(masks_dir)])
    assert len(stub.calls) == n_calls


def test_predict_3dpw_with_real_estimator(fake_3dpw, tmp_path, monkeypatch):
    """Drives the driver through a REAL (tiny) PoseEstimator on CPU — the
    stub tests accept **kwargs and would hide kwarg-name drift between the
    drivers and the PoseEstimator API."""
    import jax
    import jax.numpy as jnp

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.detect.yolov4 import PersonDetector, YOLOv4Tiny
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.estimator import PoseEstimator

    cfg = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                      n_joints=24, dtype='float32')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=16,
                                                   dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])

    def crop_model_fn(crops, intrinsics, valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=valid)

    det_model = YOLOv4Tiny(num_classes=80, dtype=jnp.float32)
    det_vars = det_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 96, 96, 3)), train=False)
    est = PoseEstimator(
        crop_model_fn, SMPL_24, cfg,
        detector=PersonDetector(det_model, det_vars, input_size=96,
                                top_candidates=32))
    monkeypatch.setattr(
        'metrabs_tpu.io.packaging.load_pose_estimator', lambda p: est)

    root, masks_dir, _, _ = fake_3dpw
    out_dir = tmp_path / 'preds_real'
    predict_3dpw.main([
        '--package', 'real', '--root', str(root),
        '--output-path', str(out_dir), '--masks-dir', str(masks_dir),
        '--num-aug', '1', '--batch-size', '2', '--max-detections', '4'])
    with open(out_dir / 'test' / 'seqA.pkl', 'rb') as f:
        coords = pickle.load(f)['jointPositions']
    assert coords.shape == (2, N_FRAMES, 24, 3)
