"""MuPoTS prediction driver test: fake dataset layout + stub estimator
(`apps/predict_mupots.py` mirrors `inference_scripts/predict_mupots.py`)."""

import json
import os

import numpy as np
import scipy.io

from metrabs_tpu.apps import predict_mupots

import pytest

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'


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


def test_eval_mupots(tmp_path, rng):
    import scipy.io

    from metrabs_tpu.apps import eval_mupots

    root = tmp_path / 'mupots'
    os.makedirs(root / 'TS1')
    n_frames = 2
    gt_poses = rng.normal(size=(n_frames, 17, 3)).astype(np.float32) * 200 \
        + np.array([0, 0, 3000], np.float32)
    ann = np.empty((n_frames, 1), object)
    for i in range(n_frames):
        ann[i, 0] = {'annot3': gt_poses[i].T, 'isValidFrame': 1}
    scipy.io.savemat(str(root / 'TS1' / 'annot.mat'), {'annotations': ann})

    # Perfect root-relative predictions, 400mm depth offset -> PCK perfect,
    # APCK zero (every joint off by 400 > 150), recall 1.
    preds = gt_poses + np.array([0, 0, 400], np.float32)
    pred_path = tmp_path / 'preds.npz'
    np.savez(pred_path,
             image_path=np.array([f'mupots/TS1/img_{i:06d}.jpg'
                                  for i in range(n_frames)]),
             coords3d_pred_world=preds)
    out = eval_mupots.main(['--pred-path', str(pred_path),
                            '--root', str(root)])
    assert out['pck'] == 100.0
    assert out['apck'] == 0.0
    assert out['recall'] == 100.0

    # Exact predictions -> all three perfect.
    np.savez(pred_path,
             image_path=np.array([f'mupots/TS1/img_{i:06d}.jpg'
                                  for i in range(n_frames)]),
             coords3d_pred_world=gt_poses)
    out = eval_mupots.main(['--pred-path', str(pred_path),
                            '--root', str(root)])
    assert out['pck'] == 100.0
    assert out['apck'] == 100.0


def test_eval_mupots_pelvis_root_alignment(tmp_path, rng):
    """Official protocol: alignment at the pelvis (index 14), not the mean.
    A prediction whose ONLY error is a 400mm pelvis offset scores pck 0
    under root alignment (every scored joint shifts by the root error),
    while mean-centering would dilute the offset to ~24mm and score 100."""
    import scipy.io

    from metrabs_tpu.apps import eval_mupots

    root = tmp_path / 'mupots'
    os.makedirs(root / 'TS1')
    gt = rng.normal(size=(1, 17, 3)).astype(np.float32) * 200 \
        + np.array([0, 0, 3000], np.float32)
    ann = np.empty((1, 1), object)
    ann[0, 0] = {'annot3': gt[0].T, 'isValidFrame': 1}
    scipy.io.savemat(str(root / 'TS1' / 'annot.mat'), {'annotations': ann})

    preds = gt.copy()
    preds[0, 14] += np.array([0, 0, 400], np.float32)  # pelvis only
    pred_path = tmp_path / 'preds.npz'
    np.savez(pred_path,
             image_path=np.array(['mupots/TS1/img_000000.jpg']),
             coords3d_pred_world=preds)
    out = eval_mupots.main(['--pred-path', str(pred_path),
                            '--root', str(root)])
    assert out['pck'] == 0.0
    assert out['apck'] == 100.0  # absolute positions of scored joints exact
    assert out['recall'] == 100.0
