"""Stub-estimator e2e tests for the remaining benchmark prediction drivers
(H36M / 3DHP / 3DOH / ASPset), exercising the real dataset adapters and CLI
plumbing wherever the annotation format is fakeable in-image (3DOH JSON,
3DHP HDF5+JSON, ASPset CSV+JSON+mkv); H36M's CDF annotations are not, so its
loader is stubbed and the driver plumbing is tested around it."""

import json
import os
import pickle
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'


H, W = 96, 128


class StubSkeletons:
    skeleton_names = ('', 'lsp_14', 'mpi_inf_3dhp_17', 'aspset_17',
                      'h36m_17', 'smpl_24')


class StubEstimator:
    def __init__(self, n_joints=17):
        self.n_joints = n_joints
        self.skeletons = StubSkeletons()
        self.detector = object()
        self.estimate_calls = []
        self.detect_calls = []

    def estimate_poses_batched(self, images, boxes, **kwargs):
        self.estimate_calls.append(kwargs)
        b = len(images)
        return dict(poses3d=np.full(
            (b, boxes.shape[1], self.n_joints, 3), 1234.0, np.float32))

    def detect_poses_batched(self, images, **kwargs):
        self.detect_calls.append(kwargs)
        b = len(images)
        d = kwargs.get('max_detections', 1)
        return dict(
            poses3d=np.full((b, d, self.n_joints, 3), 1234.0, np.float32),
            poses2d=np.zeros((b, d, self.n_joints, 2), np.float32),
            boxes=np.zeros((b, d, 5), np.float32),
            valid=np.ones((b, d), bool))


@pytest.fixture
def stub(monkeypatch):
    est = StubEstimator()
    monkeypatch.setattr(
        'metrabs_tpu.io.packaging.load_pose_estimator', lambda p: est)
    return est


def write_jpg(rng, path):
    import cv2
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    cv2.imwrite(str(path), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))


def test_predict_3doh(tmp_path, rng, stub):
    from metrabs_tpu.apps import predict_3doh
    root = tmp_path / '3doh'
    annots = {}
    for image_id in ('00001', '00002'):
        annots[image_id] = dict(
            intri=[[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
            extri=np.eye(4).tolist(),
            bbox=[[10, 10], [100, 90]],
            lsp_joints_3d=(rng.normal(size=(14, 3)) * 0.2 + [0, 0, 3]).tolist())
        write_jpg(rng, root / 'testset' / 'images' / f'{image_id}.jpg')
    os.makedirs(root / 'testset', exist_ok=True)
    with open(root / 'testset' / 'annots.json', 'w') as f:
        json.dump(annots, f)

    out = tmp_path / '3doh.npz'
    predict_3doh.main(['--package', 'stub', '--root', str(root),
                       '--output-path', str(out)])
    result = np.load(out)
    assert result['coords3d_pred_cam'].shape == (2, 17, 3)
    assert set(result['image_id']) == {'00001', '00002'}
    np.testing.assert_allclose(result['coords3d_pred_cam'], 1234.0)


def test_predict_3dhp(tmp_path, rng, stub):
    import h5py

    from metrabs_tpu.apps import predict_3dhp
    root = tmp_path / '3dhp'
    n_frames = 4
    for subj in (1, 6):
        os.makedirs(root / f'TS{subj}' / 'imageSequence')
        valid = np.ones((n_frames, 1), np.float64)
        valid[2, 0] = 0  # one invalid frame
        with h5py.File(root / f'TS{subj}' / 'annot_data.mat', 'w') as m:
            m.create_dataset('valid_frame', data=valid)
        for i in range(n_frames):
            write_jpg(rng, root / f'TS{subj}' / 'imageSequence'
                      / f'img_{i + 1:06d}.jpg')
    cam_json = tmp_path / 'cams.json'
    with open(cam_json, 'w') as f:
        json.dump({
            'subj1_4': dict(intrinsic_matrix=[[1500.0, 0, 1024],
                                              [0, 1500.0, 1024], [0, 0, 1]]),
            'subj5_6': dict(intrinsic_matrix=[[1600.0, 0, 960],
                                              [0, 1600.0, 540], [0, 0, 1]])},
            f)
    out = tmp_path / '3dhp.npz'
    predict_3dhp.main(['--package', 'stub', '--root', str(root),
                       '--cameras-json', str(cam_json),
                       '--output-path', str(out), '--batch-size', '2'])
    result = np.load(out)
    # 2 sequences x 3 valid frames each.
    assert result['coords3d_pred_world'].shape == (6, 17, 3)
    kw = stub.detect_calls[0]
    assert kw['max_detections'] == 1
    assert kw['detector_threshold'] == 0.0
    assert kw['skeleton'] == 'mpi_inf_3dhp_17'


def test_predict_h36m(tmp_path, rng, stub, monkeypatch):
    from metrabs_tpu.apps import predict_h36m
    from metrabs_tpu.data.camera import Camera
    from metrabs_tpu.data.loading import Example3D

    img_paths = [tmp_path / f'frame_{i}.jpg' for i in range(3)]
    for p in img_paths:
        write_jpg(rng, p)
    cam = Camera(intrinsic_matrix=np.array(
        [[1100.0, 0, 500], [0, 1100.0, 500], [0, 0, 1]], np.float32),
        world_up=(0, 0, 1))
    fake_examples = [
        Example3D(image_path=str(p), camera=cam,
                  bbox=np.array([10, 10, 80, 80], np.float32),
                  world_coords=np.zeros((17, 3), np.float32))
        for p in img_paths]
    monkeypatch.setattr(
        'metrabs_tpu.data.datasets.load_h36m_examples',
        lambda root, cameras_json, frame_step: fake_examples)
    out = tmp_path / 'h36m.npz'
    predict_h36m.main(['--package', 'stub', '--h36m-root', str(tmp_path),
                       '--cameras-json', 'unused.json',
                       '--output-path', str(out)])
    result = np.load(out)
    assert result['coords3d_pred_world'].shape == (3, 17, 3)
    assert len(result['image_path']) == 3
    kw = stub.estimate_calls[0]
    assert kw['skeleton'] == 'h36m_17'
    assert tuple(kw['world_up_vector']) == (0, 0, 1)


def test_predict_aspset(tmp_path, rng, stub):
    import cv2

    from metrabs_tpu.apps import predict_aspset
    root = tmp_path / 'aspset'
    n_frames = 3
    subj, vid, view = '1e2f', '0001', 'left'
    os.makedirs(root)
    with open(root / 'splits.csv', 'w') as f:
        f.write('subject,video,view,split\n')
        f.write(f'{subj},{vid},{view},test\n')
    os.makedirs(root / 'test' / 'boxes' / subj)
    os.makedirs(root / 'test' / 'cameras' / subj)
    os.makedirs(root / 'test' / 'videos' / subj)
    with open(root / 'test' / 'boxes' / subj / f'{subj}-{vid}-{view}.csv',
              'w') as f:
        f.write('x1,y1,x2,y2\n')
        for _ in range(n_frames):
            f.write('10,10,100,90\n')
    with open(root / 'test' / 'cameras' / subj / f'{subj}-{view}.json',
              'w') as f:
        json.dump(dict(intrinsic_matrix=[
            [900.0, 0, W / 2, 0], [0, 900.0, H / 2, 0], [0, 0, 1, 0]]), f)
    vw = cv2.VideoWriter(
        str(root / 'test' / 'videos' / subj / f'{subj}-{vid}-{view}.mkv'),
        cv2.VideoWriter_fourcc(*'mp4v'), 25, (W, H))
    assert vw.isOpened()
    for _ in range(n_frames):
        vw.write(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    vw.release()

    out_dir = tmp_path / 'aspset_preds'
    predict_aspset.main(['--package', 'stub', '--root', str(root),
                         '--output-dir', str(out_dir)])
    result = np.load(out_dir / f'{subj}-{vid}-{view}.npz')
    assert result['coords3d_pred_world'].shape == (n_frames, 17, 3)
    assert stub.estimate_calls[0]['skeleton'] == 'aspset_17'


def test_eval_3dhp(tmp_path, rng):
    import h5py

    from metrabs_tpu.apps import eval_3dhp

    root = tmp_path / '3dhp'
    n_frames = 4
    gt = rng.normal(size=(n_frames, 17, 3)).astype(np.float32) * 200 \
        + np.array([0, 0, 3500], np.float32)
    os.makedirs(root / 'TS1')
    valid = np.ones((n_frames, 1))
    valid[1, 0] = 0
    with h5py.File(root / 'TS1' / 'annot_data.mat', 'w') as m:
        m.create_dataset('valid_frame', data=valid)
        m.create_dataset('annot3', data=gt[:, None])  # [F, 1, 17, 3]

    # Predictions for valid frames 0, 2 exact (+ uniform offset that cancels
    # under pelvis alignment); frame 3 missing -> counted as all-wrong.
    paths, poses = [], []
    for i in (0, 2):
        paths.append(f'TS1/imageSequence/img_{i + 1:06d}.jpg')
        poses.append(gt[i] + np.array([100, 0, 0], np.float32))
    pred_path = tmp_path / '3dhp.npz'
    np.savez(pred_path, image_path=np.array(paths),
             coords3d_pred_world=np.stack(poses))
    out = eval_3dhp.main(['--pred-path', str(pred_path),
                          '--root', str(root)])
    # 3 valid frames, 2 perfect, 1 missed: PCK = 2/3.
    assert abs(out['pck'] - 100 * 2 / 3) < 1e-6
    assert out['n_frames'] == 3
    assert out['mpjpe'] < 1e-3
    assert abs(out['per_seq_pck']['TS1'] - 100 * 2 / 3) < 1e-6

    # Zero overlap between predictions and GT (wrong path format) must fail
    # loudly instead of printing NaN mpjpe.
    np.savez(tmp_path / 'wrong.npz',
             image_path=np.array(['TSX/imageSequence/img_000001.jpg']),
             coords3d_pred_world=gt[:1])
    import pytest
    with pytest.raises(SystemExit, match='No prediction matched'):
        eval_3dhp.main(['--pred-path', str(tmp_path / 'wrong.npz'),
                        '--root', str(root)])
