"""MuPoTS prediction driver test: fake dataset layout + stub estimator
(`apps/predict_mupots.py` mirrors `inference_scripts/predict_mupots.py`)."""

import json
import os

import numpy as np
import scipy.io

from metrabs_tpu.apps import predict_mupots

N_FRAMES = 3
H, W = 96, 128


class StubEstimator:
    def __init__(self):
        self.calls = []

    def detect_poses_batched(self, images, **kwargs):
        self.calls.append(kwargs)
        b = len(images)
        # Two detection slots; only the first is valid.
        valid = np.zeros((b, 2), bool)
        valid[:, 0] = True
        return dict(
            poses3d=np.full((b, 2, 17, 3), 1500.0, np.float32),
            poses2d=np.zeros((b, 2, 17, 2), np.float32),
            boxes=np.zeros((b, 2, 5), np.float32),
            valid=valid)


def test_predict_mupots(tmp_path, rng, monkeypatch):
    import cv2
    root = tmp_path / 'mupots'
    for i_seq in (1, 2):
        os.makedirs(root / f'TS{i_seq}')
        ann = np.empty((N_FRAMES, 2), object)
        for i in range(N_FRAMES):
            for j in range(2):
                ann[i, j] = np.zeros((2, 2), np.float32)
        scipy.io.savemat(str(root / f'TS{i_seq}' / 'annot.mat'),
                         {'annotations': ann})
        for i in range(N_FRAMES):
            cv2.imwrite(str(root / f'TS{i_seq}' / f'img_{i:06d}.jpg'),
                        rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8))
    with open(root / 'camera_intrinsics.json', 'w') as f:
        json.dump({f'TS{i}': [[500.0, 0, W / 2], [0, 500.0, H / 2],
                              [0, 0, 1]] for i in (1, 2)}, f)

    stub = StubEstimator()
    monkeypatch.setattr(
        'metrabs_tpu.io.packaging.load_pose_estimator', lambda p: stub)
    out_path = tmp_path / 'mupots_preds.npz'
    predict_mupots.main([
        '--package', 'stub', '--root', str(root),
        '--output-path', str(out_path), '--batch-size', '2',
        '--sequences', '1', '2'])

    result = np.load(out_path)
    # One valid pose per frame, 2 sequences x 3 frames.
    assert result['coords3d_pred_world'].shape == (6, 17, 3)
    np.testing.assert_allclose(result['coords3d_pred_world'], 1500.0)
    assert result['image_path'][0] == 'mupots/TS1/img_000000.jpg'
    kw = stub.calls[0]
    assert kw['skeleton'] == 'mpi_inf_3dhp_17'
    assert kw['detector_threshold'] == 0.2
    assert kw['suppress_implausible_poses'] is False
    assert kw['intrinsic_matrix'].shape == (2, 3, 3)
