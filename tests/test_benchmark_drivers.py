"""Per-benchmark dataset adapters, CDF reader, and skeleton conventions."""

import json
import os

import numpy as np
import pytest

from metrabs_tpu.utils import cdf as cdf_mod

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'



class TestCdf:

    def test_roundtrip_uncompressed(self, rng, tmp_path):
        pose = rng.normal(size=(1, 40, 96)).astype(np.float64)
        path = str(tmp_path / 'a.cdf')
        cdf_mod.write_cdf(path, {'Pose': pose})
        np.testing.assert_array_equal(cdf_mod.load_cdf(path)['Pose'], pose)

    def test_roundtrip_compressed_vvr(self, rng, tmp_path):
        pose = rng.normal(size=(3, 8, 6)).astype(np.float32)
        path = str(tmp_path / 'b.cdf')
        cdf_mod.write_cdf(path, {'Pose': pose}, compress_vvr=True)
        np.testing.assert_array_equal(cdf_mod.load_cdf(path)['Pose'], pose)

    def test_roundtrip_column_major(self, rng, tmp_path):
        pose = rng.normal(size=(2, 5, 3)).astype(np.float64)
        path = str(tmp_path / 'c.cdf')
        cdf_mod.write_cdf(path, {'Pose': pose}, column_major=True)
        np.testing.assert_array_equal(cdf_mod.load_cdf(path)['Pose'], pose)

    def test_rejects_garbage(self, tmp_path):
        path = tmp_path / 'junk.cdf'
        path.write_bytes(b'\x01' * 64)
        with pytest.raises(ValueError):
            cdf_mod.CdfFile(path.read_bytes())


def _write_h36m_fixture(root, rng, n_frames=130, frame_step=64):
    from metrabs_tpu.data.datasets import H36M_CAMERA_IDS
    cameras = dict(intrinsics={}, extrinsics={'S9': {}})
    for cam_id in H36M_CAMERA_IDS:
        cameras['intrinsics'][cam_id] = dict(
            calibration_matrix=[[1145.0, 0, 512.0], [0, 1143.0, 515.0],
                                [0, 0, 1]],
            distortion=[-0.2, 0.24, -0.002, -0.0009, 0.0])
        cameras['extrinsics']['S9'][cam_id] = dict(
            R=np.eye(3).tolist(), t=[0.0, 0.0, 5000.0])
    cam_json = os.path.join(root, 'cameras.json')
    with open(cam_json, 'w') as f:
        json.dump(cameras, f)

    subj = os.path.join(root, 'S9')
    coords = rng.normal(size=(1, n_frames, 96)).astype(np.float64) * 100
    os.makedirs(os.path.join(subj, 'MyPoseFeatures', 'D3_Positions'))
    cdf_mod.write_cdf(
        os.path.join(subj, 'MyPoseFeatures', 'D3_Positions', 'Walking.cdf'),
        {'Pose': coords})
    os.makedirs(os.path.join(subj, 'BBoxes'))
    n_out = len(range(0, n_frames, frame_step))
    for cam_id in H36M_CAMERA_IDS:
        np.save(os.path.join(subj, 'BBoxes', f'Walking.{cam_id}.npy'),
                rng.uniform(0, 200, size=(n_frames // 1, 4))
                .astype(np.float32))
    return cam_json, coords, n_out


class TestH36MAdapter:

    def test_per_sequence_protocol(self, rng, tmp_path):
        from metrabs_tpu.data.datasets import (
            H36M_RELEVANT_JOINTS, load_h36m_examples)
        root = str(tmp_path)
        cam_json, coords, n_out = _write_h36m_fixture(root, rng)
        examples = load_h36m_examples(root, cam_json, subjects=(9,),
                                      frame_step=64)
        # 4 cameras x every-64th of 130 frames (0, 64, 128).
        assert len(examples) == 4 * 3
        ex = examples[0]
        assert 'S9/Images/Walking.54138969/frame_000000.jpg' in \
            ex.image_path.replace(os.sep, '/')
        expected = coords[0, 0].reshape(-1, 3)[list(H36M_RELEVANT_JOINTS)]
        np.testing.assert_allclose(ex.world_coords, expected, rtol=1e-6)
        # Second frame of the same camera is frame 64.
        assert 'frame_000064' in examples[1].image_path
        assert ex.camera.intrinsic_matrix[0, 0] == pytest.approx(1145.0)


class TestH36MMetadataXml:
    """Round-trips a synthetic metadata.xml (official w0 packing) and checks
    agreement with the JSON loader through the cross-validator. This pins the
    plumbing (packing indices, t = -R @ T, OpenCV coefficient order); the
    Euler-composition constant itself needs real data to verify (docstring of
    `load_h36m_metadata_xml`)."""

    def _make_w0(self, rng):
        from metrabs_tpu.data.datasets import (
            H36M_CAMERA_IDS, H36M_METADATA_SUBJECTS)
        extr = np.zeros((4, 11, 6))
        extr[..., :3] = rng.uniform(-np.pi, np.pi, size=(4, 11, 3))
        extr[..., 3:] = rng.uniform(-4000, 4000, size=(4, 11, 3))
        intr = np.zeros((4, 9))
        intr[:, 0:2] = rng.uniform(1100, 1160, size=(4, 2))   # fx fy
        intr[:, 2:4] = rng.uniform(500, 520, size=(4, 2))     # cx cy
        intr[:, 4:7] = rng.uniform(-0.3, 0.3, size=(4, 3))    # k1 k2 k3
        intr[:, 7:9] = rng.uniform(-0.003, 0.003, size=(4, 2))  # p1 p2
        return np.concatenate([extr.reshape(-1), intr.reshape(-1)])

    def _write_xml(self, path, w0):
        with open(path, 'w') as f:
            f.write('<metadata><dbcameras><w0>[%s]</w0></dbcameras>'
                    '</metadata>' % ' '.join(f'{v:.10g}' for v in w0))

    def test_parse_and_cross_validate(self, rng, tmp_path):
        from metrabs_tpu.data.datasets import (
            H36M_CAMERA_IDS, H36M_METADATA_SUBJECTS,
            h36m_rotation_from_angles, load_h36m_metadata_xml,
            validate_h36m_metadata_against_json)
        w0 = self._make_w0(rng)
        xml_path = os.path.join(str(tmp_path), 'metadata.xml')
        self._write_xml(xml_path, w0)
        cams = load_h36m_metadata_xml(xml_path)
        assert len(cams) == 4 * 11
        # Spot-check one entry against hand-unpacked values.
        i_cam, i_sub = 2, 5
        key = (H36M_METADATA_SUBJECTS[i_sub], H36M_CAMERA_IDS[i_cam])
        cam = cams[key]
        ext6 = w0[(i_cam * 11 + i_sub) * 6:(i_cam * 11 + i_sub + 1) * 6]
        R = h36m_rotation_from_angles(ext6[:3])
        np.testing.assert_allclose(cam.extrinsic_matrix[:3, :3], R, atol=1e-6)
        np.testing.assert_allclose(
            cam.extrinsic_matrix[:3, 3], -R @ ext6[3:], rtol=1e-5)
        intr9 = w0[264 + i_cam * 9:264 + (i_cam + 1) * 9]
        assert cam.intrinsic_matrix[0, 0] == pytest.approx(intr9[0])
        assert cam.intrinsic_matrix[1, 2] == pytest.approx(intr9[3])
        np.testing.assert_allclose(
            cam.distortion_coeffs,
            [intr9[4], intr9[5], intr9[7], intr9[8], intr9[6]], rtol=1e-6)
        # JSON export built from the same ground truth must cross-validate.
        raw = dict(intrinsics={}, extrinsics={})
        for key, cam in cams.items():
            subject, cam_id = key
            raw['intrinsics'][cam_id] = dict(
                calibration_matrix=cam.intrinsic_matrix.tolist(),
                distortion=cam.distortion_coeffs.tolist())
            raw['extrinsics'].setdefault(subject, {})[cam_id] = dict(
                R=cam.extrinsic_matrix[:3, :3].tolist(),
                t=cam.extrinsic_matrix[:3, 3].tolist())
        json_path = os.path.join(str(tmp_path), 'cameras.json')
        with open(json_path, 'w') as f:
            json.dump(raw, f)
        validate_h36m_metadata_against_json(xml_path, json_path)


class Test3DOHAdapter:

    def test_annots_json(self, rng, tmp_path):
        from metrabs_tpu.data.datasets import load_3doh_examples
        root = str(tmp_path)
        os.makedirs(os.path.join(root, 'testset', 'images'))
        annots = {
            '00001': dict(
                intri=[[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]],
                bbox=[[10, 20], [110, 220]],
                lsp_joints_3d=rng.normal(size=(14, 3)).tolist()),
            '00002': dict(
                intri=[[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]],
                bbox=[[0, 0], [50, 60]]),
        }
        with open(os.path.join(root, 'testset', 'annots.json'), 'w') as f:
            json.dump(annots, f)
        examples = load_3doh_examples(root)
        assert len(examples) == 2
        np.testing.assert_allclose(examples[0].bbox, [10, 20, 100, 200])
        assert examples[0].world_coords.shape == (14, 3)
        assert np.all(np.isnan(examples[1].world_coords))


class TestAspsetAdapter:

    def test_split_and_boxes(self, tmp_path):
        from metrabs_tpu.data.datasets import load_aspset_examples
        root = str(tmp_path)
        with open(os.path.join(root, 'splits.csv'), 'w') as f:
            f.write('1e2f, 0f5a, right, test\n1e2f, 0f5a, left, train\n')
        os.makedirs(os.path.join(root, 'test', 'boxes', '1e2f'))
        os.makedirs(os.path.join(root, 'test', 'cameras', '1e2f'))
        with open(os.path.join(root, 'test', 'boxes', '1e2f',
                               '1e2f-0f5a-right.csv'), 'w') as f:
            f.write('x1,y1,x2,y2\n100,50,300,400\n110,55,310,410\n')
        with open(os.path.join(root, 'test', 'cameras', '1e2f',
                               '1e2f-right.json'), 'w') as f:
            json.dump(dict(
                intrinsic_matrix=[[2000.0, 0, 1920, 0], [0, 2000.0, 1080, 0],
                                  [0, 0, 1, 0]],
                extrinsic_matrix=np.eye(4).tolist()), f)
        examples = load_aspset_examples(root, split='test')
        assert len(examples) == 2
        np.testing.assert_allclose(examples[0].bbox, [100, 50, 200, 350])
        assert '#frame=0' in examples[0].image_path
        assert '#frame=1' in examples[1].image_path
        assert examples[0].camera.intrinsic_matrix.shape == (3, 3)


class TestNewSkeletons:

    def test_conventions_registered_for_superset_model(self):
        from metrabs_tpu.pipeline.skeletons import (
            BUILTIN_SKELETONS, SkeletonRegistry)
        from metrabs_tpu.utils.joint_info import make_joint_info
        # A model joint set that covers every builtin convention.
        all_names = []
        for ji in BUILTIN_SKELETONS.values():
            for n in ji.names:
                if n not in all_names:
                    all_names.append(n)
        model_ji = make_joint_info(all_names, [])
        reg = SkeletonRegistry(model_ji)
        for name in ('h36m_17', 'h36m_25', 'kinectv2_25', 'mpi_inf_3dhp_28',
                     'aspset_17', 'coco_19', 'smpl_24', 'lsp_14'):
            assert name in reg.skeleton_names, name
            idx = reg.indices(name)
            assert len(idx) == len(reg.joint_names(name))
            assert len(set(map(int, idx))) == len(idx)  # distinct joints

    def test_unsupported_convention_skipped_not_crashing(self):
        from metrabs_tpu.pipeline.skeletons import H36M_17, SkeletonRegistry
        reg = SkeletonRegistry(H36M_17)
        assert 'kinectv2_25' not in reg.skeleton_names  # needs hands/feet
        assert 'h36m_17' in reg.skeleton_names


class Test3DHPAdapter:

    def test_valid_frames_and_cameras(self, rng, tmp_path):
        import h5py
        from metrabs_tpu.data.datasets import load_3dhp_test_frames
        root = str(tmp_path)
        for subj, n in ((1, 10), (5, 6)):
            os.makedirs(os.path.join(root, f'TS{subj}'))
            valid = np.zeros((n, 1), np.float64)
            valid[::2] = 1
            with h5py.File(os.path.join(root, f'TS{subj}',
                                        'annot_data.mat'), 'w') as m:
                m['valid_frame'] = valid
        cams = dict(
            subj1_4=dict(intrinsic_matrix=[[1500.0, 0, 1024], [0, 1500.0, 1024],
                                           [0, 0, 1]]),
            subj5_6=dict(intrinsic_matrix=[[1600.0, 0, 960], [0, 1600.0, 540],
                                           [0, 0, 1]],
                         extrinsic_matrix=np.eye(4).tolist()))
        cam_path = os.path.join(root, 'cams.json')
        with open(cam_path, 'w') as f:
            json.dump(cams, f)
        seqs = load_3dhp_test_frames(root, cam_path)
        assert [s[0] for s in seqs] == ['TS1', 'TS5']
        assert len(seqs[0][1]) == 5 and len(seqs[1][1]) == 3
        assert seqs[0][1][0].endswith('img_000001.jpg')
        assert seqs[0][1][1].endswith('img_000003.jpg')  # 1-based, valid only
        assert seqs[0][2].intrinsic_matrix[0, 0] == 1500.0
        assert seqs[1][2].intrinsic_matrix[0, 0] == 1600.0
