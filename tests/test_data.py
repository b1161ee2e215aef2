"""Host-side camera model, data loading and pipeline tests."""

import numpy as np
import pytest

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.data import boxes as boxlib
from metrabs_tpu.data.camera import Camera, reproject_image, reproject_image_points
from metrabs_tpu.data.loading import (
    Example2D, Example3D, LoadConfig, load_and_transform2d, load_and_transform3d)
from metrabs_tpu.data.pipeline import (
    ParallelBatchLoader, batch_dicts, roundrobin_iterate)
from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14

CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, n_joints=17)


def make_camera():
    return Camera(
        optical_center=np.array([0, 0, 0], np.float32),
        intrinsic_matrix=np.array(
            [[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32),
        world_up=(0, -1, 0))


def test_camera_world_image_roundtrip(rng):
    cam = make_camera()
    cam.rotate(yaw=0.3, pitch=-0.1, roll=0.05)
    pts_world = rng.normal(size=(10, 3)).astype(np.float32) * 300 + [0, 0, 4000]
    depths = cam.world_to_camera(pts_world)[:, 2]
    im_pts = cam.world_to_image(pts_world)
    recovered = cam.image_to_world(im_pts, camera_depth=depths[:, None])
    np.testing.assert_allclose(recovered, pts_world, atol=0.5)


def test_camera_distortion_roundtrip(rng):
    cam = make_camera()
    cam.distortion_coeffs = np.array([-0.2, 0.05, 1e-3, -1e-3, 0.001], np.float32)
    pts_cam = np.concatenate([
        rng.uniform(-0.3, 0.3, (10, 2)), np.ones((10, 1))], axis=1).astype(np.float32)
    im = cam.camera_to_image(pts_cam)
    back = cam.image_to_camera(im)
    np.testing.assert_allclose(back[:, :2], pts_cam[:, :2], atol=1e-3)


def test_turn_towards_centers_target():
    cam = make_camera()
    target = np.array([500.0, 300.0], np.float32)
    world_target = cam.image_to_world(target, camera_depth=3000.0)
    cam.turn_towards(target_image_point=target)
    # After turning, the target must project to the principal point.
    reprojected = cam.world_to_image(world_target)
    np.testing.assert_allclose(reprojected, [320, 240], atol=0.5)


def test_reproject_image_identity(rng):
    cam = make_camera()
    im = rng.uniform(0, 255, size=(48, 64, 3)).astype(np.uint8)
    out = reproject_image(im, cam, cam.copy(), (48, 64))
    np.testing.assert_allclose(out, im, atol=1)


def test_reproject_points_roundtrip(rng):
    cam1 = make_camera()
    cam2 = cam1.copy()
    cam2.rotate(roll=0.4)
    cam2.zoom(1.3)
    pts = rng.uniform(100, 400, size=(8, 2)).astype(np.float32)
    pts2 = reproject_image_points(pts, cam1, cam2)
    back = reproject_image_points(pts2, cam2, cam1)
    np.testing.assert_allclose(back, pts, atol=1e-2)


def make_example3d(rng):
    cam = make_camera()
    pose_world = (rng.normal(size=(17, 3)) * 250 + [0, 0, 4000]).astype(np.float32)
    im_pts = cam.world_to_image(pose_world)
    x0, y0 = im_pts.min(0) - 20
    x1, y1 = im_pts.max(0) + 20
    image = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    return Example3D(
        image_path='synthetic/h36m_test.jpg', camera=cam,
        bbox=np.array([x0, y0, x1 - x0, y1 - y0], np.float32),
        world_coords=pose_world, image=image)


def test_load3d_output_contract(rng):
    ex = make_example3d(rng)
    out = load_and_transform3d(ex, H36M_17, True, rng, CFG)
    assert out['image'].shape == (64, 64, 3)
    assert out['image'].dtype == np.float32
    assert 0 <= out['image'].min() and out['image'].max() <= 1.0
    assert out['coords3d_true'].shape == (17, 3)
    assert out['intrinsics'].shape == (3, 3)
    assert out['joint_validity_mask'].all()
    # Principal point must be centered (crop-model contract).
    np.testing.assert_allclose(out['intrinsics'][:2, 2], [32, 32], atol=1e-4)


def test_load3d_geometric_consistency(rng):
    """Without augmentation, the returned intrinsics must project
    coords3d_true onto coords2d_true."""
    ex = make_example3d(rng)
    lcfg = LoadConfig(geom_aug=False, occlude_aug_prob=0, color_aug=False,
                      background_aug_prob=0)
    out = load_and_transform3d(ex, H36M_17, False, rng, CFG, lcfg)
    cam3d = out['coords3d_true']
    projected = (cam3d / cam3d[:, 2:]) @ out['intrinsics'].T
    np.testing.assert_allclose(projected[:, :2], out['coords2d_true'], atol=0.1)


def test_load3d_rot_to_orig_cam(rng):
    """rot_to_orig_cam must map crop-camera coords back to original camera."""
    ex = make_example3d(rng)
    lcfg = LoadConfig(geom_aug=False, occlude_aug_prob=0, color_aug=False,
                      background_aug_prob=0)
    out = load_and_transform3d(ex, H36M_17, False, rng, CFG, lcfg)
    orig_camcoords = ex.camera.world_to_camera(ex.world_coords)
    mapped = out['coords3d_true'] @ out['rot_to_orig_cam'].T
    np.testing.assert_allclose(mapped, orig_camcoords, atol=0.5)


def test_load2d_output_contract(rng):
    image = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    coords = rng.uniform(100, 300, size=(14, 2)).astype(np.float32)
    coords[3] = np.nan
    ex = Example2D(
        image_path='synthetic/mpii_test.jpg',
        bbox=np.array([100, 100, 200, 200], np.float32),
        coords=coords, image=image)
    out = load_and_transform2d(ex, LSP_14, True, rng, CFG)
    assert out['image'].shape == (64, 64, 3)
    assert out['coords2d_true'].shape == (14, 2)
    # The NaN joint is invalid (it may move index under the flip-augmentation
    # mirror permutation, so check the count).
    assert out['joint_validity_mask'].sum() == 13


def test_roundrobin_sections():
    a = [f'a{i}' for i in range(5)]
    b = [f'b{i}' for i in range(3)]
    it = roundrobin_iterate([a, b], [2, 1], np.random.default_rng(0))
    batch = [next(it) for _ in range(9)]
    # Every block of 3 has 2 a's and 1 b.
    for i in range(0, 9, 3):
        block = batch[i:i + 3]
        assert sum(x.startswith('a') for x in block) == 2
        assert sum(x.startswith('b') for x in block) == 1


def test_parallel_batch_loader(rng):
    def load_fn(ex, rng_):
        return dict(x=np.full((2,), float(ex), np.float32))

    examples = iter(range(100))
    loader = ParallelBatchLoader(load_fn, examples, batch_size=4, n_workers=2)
    batch = next(loader)
    assert batch['x'].shape == (4, 2)
    loader.close()


class TestImproc:
    """Golden tests for CPU improc against reference semantics
    (`metrabs_tf/improc.py`)."""

    def test_white_balance_golden(self):
        # Golden values computed by a literal transcription of the reference
        # LAB-space formula (`improc.py:246-253`): chroma channels pulled
        # toward 128 proportionally to luminance with gain 1.1, written back
        # through the uint8 LAB array (truncating cast), cv2 LAB<->RGB.
        from metrabs_tpu.data import improc
        img = np.array([[[200, 120, 80], [30, 60, 200]],
                        [[128, 128, 128], [255, 255, 0]]], np.uint8)
        g_3dhp = np.array([[[212, 112, 101], [19, 55, 213]],
                           [[137, 123, 147], [255, 245, 90]]], np.uint8)
        g_panoptic = np.array([[[205, 117, 93], [11, 59, 207]],
                               [[131, 127, 139], [255, 251, 65]]], np.uint8)
        g_auto = np.array([[[185, 127, 96], [0, 66, 211]],
                           [[103, 133, 143], [226, 255, 75]]], np.uint8)
        np.testing.assert_array_equal(improc.white_balance(img, 110, 145), g_3dhp)
        np.testing.assert_array_equal(improc.white_balance(img, 120, 138), g_panoptic)
        np.testing.assert_array_equal(improc.white_balance(img), g_auto)

    def test_white_balance_neutral_on_gray(self):
        # A gray image with channel means already at 128 must pass through
        # (up to LAB round-trip quantization).
        from metrabs_tpu.data import improc
        img = np.full((4, 4, 3), 90, np.uint8)
        out = improc.white_balance(img)
        assert np.abs(out.astype(int) - 90).max() <= 2

    def test_adjust_gamma_matches_lut_semantics(self):
        # Reference LUT: (linspace(0,1,256)**gamma * 255).astype(uint8)
        # (`improc.py:216-220`) — truncating, not rounding.
        from metrabs_tpu.data import improc
        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        expected = (np.linspace(0, 1, 256) ** 0.67 * 255).astype(np.uint8)[img]
        np.testing.assert_array_equal(improc.adjust_gamma(img, 0.67), expected)


class TestViz:

    def test_draw_and_plot(self, rng, tmp_path):
        from metrabs_tpu.pipeline.skeletons import H36M_17
        from metrabs_tpu.utils.viz import draw_poses_2d, plot_poses_3d
        image = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        poses2d = rng.uniform(0, 120, size=(2, 17, 2)).astype(np.float32)
        poses3d = rng.normal(size=(2, 17, 3)).astype(np.float32) * 200
        poses2d[1, 3] = np.nan  # NaN joints must be skipped, not crash
        out = draw_poses_2d(image, poses2d, H36M_17.edges)
        assert out.shape == image.shape and out.dtype == np.uint8
        path = str(tmp_path / 'scene.png')
        plot_poses_3d(poses3d, H36M_17.edges, out_path=path,
                      image=image, poses2d=poses2d)
        import os
        assert os.path.getsize(path) > 1000
