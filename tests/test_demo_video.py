"""E2E test of the video demo: letterboxing + trailing-batch padding keep
every device call at one canonical (batch, height, width) — one compiled
program per run regardless of source size or frame count."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from metrabs_tpu.apps import demo_video
from metrabs_tpu.config import ModelConfig
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import H36M_17

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'


CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')


class RecordingEstimator(PoseEstimator):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.call_shapes = []

    def estimate_poses_batched(self, images, boxes, **kwargs):
        self.call_shapes.append(tuple(np.asarray(images).shape))
        return super().estimate_poses_batched(images, boxes, **kwargs)


def _tiny_estimator():
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        jnp.eye(3)[jnp.newaxis])

    def crop_model_fn(crops, intrinsics, sample_valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    return RecordingEstimator(crop_model_fn, H36M_17, CFG)


def _write_video(path, n_frames, w, h):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 10, (w, h))
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        writer.write(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
    writer.release()


def test_letterbox_and_partial_batch(tmp_path, monkeypatch, capsys):
    video = os.path.join(str(tmp_path), 'in.mp4')
    out = os.path.join(str(tmp_path), 'out.mp4')
    _write_video(video, n_frames=7, w=100, h=76)  # odd size, 7 = 4 + 3

    est = _tiny_estimator()
    monkeypatch.setattr(
        'metrabs_tpu.apps.demo_image.build_default_estimator', lambda: est)
    demo_video.main(['--video', video, '--out', out, '--num-aug', '1',
                     '--frame-batch', '4', '--letterbox', '96x128'])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result['frames'] == 7
    # Both device calls (4 full + 3 padded-to-4) at the canonical size.
    assert est.call_shapes == [(4, 96, 128, 3), (4, 96, 128, 3)]
    # Overlay video is written at the ORIGINAL source resolution.
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 100
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 76
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    cap.release()


def test_letterbox_intrinsics_geometry():
    # The letterboxed K must project like the original K composed with the
    # resize+pad: K' = S @ K.
    rgb = np.zeros((76, 100, 3), np.uint8)
    canvas, s, ox, oy = demo_video.letterbox_frame(rgb, 96, 128)
    assert canvas.shape == (96, 128, 3)
    k = demo_video.fov_intrinsics(55.0, 76, 100)
    k2 = (np.array([[s, 0, ox], [0, s, oy], [0, 0, 1]], np.float32) @ k)
    pt = np.array([30.0, 40.0, 1.0])  # original pixel (homogeneous)
    ray = np.linalg.inv(k) @ pt
    mapped = k2 @ ray
    mapped = mapped[:2] / mapped[2]
    np.testing.assert_allclose(
        mapped, [30.0 * s + ox, 40.0 * s + oy], rtol=1e-5)


def test_stream_mode(tmp_path, monkeypatch, capsys):
    """--stream K: batches are queued and dispatched K-at-a-time through
    detect_poses_stream, with the trailing partial K padded (results for
    pad batches discarded). Frame count and call pattern must match."""
    from metrabs_tpu.detect.yolov4 import PersonDetector, YOLOv4Tiny

    calls = {'stream': [], 'batched': 0}

    class StreamRecordingEstimator(PoseEstimator):
        def detect_poses_stream(self, images, **kwargs):
            calls['stream'].append(tuple(np.asarray(images).shape))
            return super().detect_poses_stream(images, **kwargs)

        def detect_poses_batched(self, images, **kwargs):
            calls['batched'] += 1
            return super().detect_poses_batched(images, **kwargs)

    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16,
                                                   dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        jnp.eye(3)[jnp.newaxis])

    def crop_model_fn(crops, intrinsics, sample_valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    det_model = YOLOv4Tiny(num_classes=80, dtype=jnp.float32)
    det_vars = det_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 96, 96, 3), jnp.float32),
                              train=False)
    est = StreamRecordingEstimator(
        crop_model_fn, H36M_17, CFG,
        detector=PersonDetector(det_model, det_vars, input_size=96,
                                top_candidates=32))
    monkeypatch.setattr(
        'metrabs_tpu.apps.demo_image.build_default_estimator', lambda: est)

    video = os.path.join(str(tmp_path), 'in.mp4')
    _write_video(video, n_frames=10, w=100, h=76)
    demo_video.main(['--video', video, '--num-aug', '1', '--frame-batch',
                     '2', '--stream', '2', '--letterbox', '96x128',
                     '--max-boxes', '2'])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result['frames'] == 10
    # 5 batches of 2 frames -> stream flushes [2, 2, 1->padded to 2].
    assert calls['batched'] == 0
    assert calls['stream'] == [(2, 2, 96, 128, 3)] * 3
