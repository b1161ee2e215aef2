"""3DPW evaluation CLI test with synthetic GT/pred sequence pickles."""

import os
import pickle

import numpy as np

from metrabs_tpu.apps import eval_3dpw


def rotation_z(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def make_fake_3dpw(tmp_path, rng, pred_offset_mm=0.0):
    n_frames, n_tracks = 4, 2
    root = tmp_path / '3dpw'
    seq_dir = root / 'sequenceFiles' / 'test'
    os.makedirs(seq_dir, exist_ok=True)
    gt_world = rng.normal(size=(n_tracks, n_frames, 24, 3)) * 0.3 \
        + np.array([0, 0, 4.0])  # meters
    cam_poses = np.tile(np.eye(4)[None], (n_frames, 1, 1))
    for i in range(n_frames):
        cam_poses[i, :3, :3] = rotation_z(0.1 * i)
        cam_poses[i, :3, 3] = [0.01 * i, 0, 0.2]
    valid = np.ones((n_tracks, n_frames), bool)
    valid[1, 0] = False
    seq = dict(
        sequence='seqA',
        jointPositions=[t.reshape(n_frames, 72) for t in gt_world],
        cam_poses=cam_poses, campose_valid=valid,
        cam_intrinsics=np.eye(3))
    with open(seq_dir / 'seqA.pkl', 'wb') as f:
        pickle.dump(seq, f)

    # Predictions: exact camera-space GT (+ optional offset), meters.
    preds = np.empty((n_tracks, n_frames, 24, 3))
    for t in range(n_tracks):
        for i in range(n_frames):
            g_cam = (cam_poses[i, :3, :3] @ gt_world[t, i].T
                     + cam_poses[i, :3, 3:4]).T
            preds[t, i] = g_cam + pred_offset_mm / 1000.0
    pred_dir = tmp_path / 'preds'
    os.makedirs(pred_dir / 'test', exist_ok=True)
    with open(pred_dir / 'test' / 'seqA.pkl', 'wb') as f:
        pickle.dump(dict(jointPositions=preds), f)
    return root, pred_dir


def test_eval_3dpw_exact(tmp_path, rng):
    root, pred_dir = make_fake_3dpw(tmp_path, rng)
    out = eval_3dpw.main(['--pred-path', str(pred_dir),
                          '--root', str(root)])
    assert out['mpjpe'] < 1e-3
    assert out['pa_mpjpe'] < 0.1  # float32 Procrustes round-trip
    assert out['pck@50'] == 100.0
    # 2 tracks x 4 frames - 1 invalid.
    assert out['n_poses'] == 7


def test_eval_3dpw_uniform_offset_cancels(tmp_path, rng):
    # A constant offset on every joint cancels in pelvis-relative MPJPE.
    root, pred_dir = make_fake_3dpw(tmp_path, rng, pred_offset_mm=300.0)
    out = eval_3dpw.main(['--pred-path', str(pred_dir),
                          '--root', str(root)])
    assert out['mpjpe'] < 1e-3
    assert out['pck@50'] == 100.0
