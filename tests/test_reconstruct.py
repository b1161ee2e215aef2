import numpy as np
import jax.numpy as jnp

from metrabs_tpu.ops import reconstruct
from metrabs_tpu.ops.camera import intrinsics_from_fov

PROC_SIDE = 256
STRIDE = 32


def make_synthetic_pose(rng, batch=4, n_joints=17, depth_mm=4000.0):
    """Absolute camera-space poses centered near the optical axis at depth_mm."""
    rel = rng.normal(size=(batch, n_joints, 3)).astype(np.float32) * 250.0
    rel -= rel.mean(axis=1, keepdims=True)
    center = np.zeros((batch, 1, 3), np.float32)
    center[..., 2] = depth_mm
    center[..., 0] = rng.uniform(-200, 200, size=(batch, 1))
    center[..., 1] = rng.uniform(-200, 200, size=(batch, 1))
    return center + rel, rel


def project_np(pose_abs, K):
    proj = pose_abs[..., :2] / pose_abs[..., 2:]
    return np.einsum('bjc,nc->bjn', np.concatenate(
        [proj, np.ones_like(proj[..., :1])], axis=-1), K[:2, :])


def test_fullpersp_recovers_consistent_pose(rng):
    pose_abs, rel = make_synthetic_pose(rng)
    K = np.asarray(intrinsics_from_fov(55.0, (PROC_SIDE, PROC_SIDE)))[0]
    coords2d = project_np(pose_abs, K).astype(np.float32)
    # All joints should project within the crop for this geometry.
    assert coords2d.min() > 24 and coords2d.max() < 232

    got = reconstruct.reconstruct_absolute(
        jnp.array(coords2d), jnp.array(rel),
        jnp.tile(jnp.array(K)[None], (4, 1, 1)),
        proc_side=PROC_SIDE, stride=STRIDE, mix_3d_inside_fov=0.5,
        weak_perspective=False)
    # The 1e-2 Tikhonov regularizer (same as the reference's tf.linalg.lstsq
    # l2_regularizer) biases the depth solve by a few mm at 4m range.
    np.testing.assert_allclose(np.asarray(got), pose_abs, atol=5.0)


def test_weakpersp_recovers_distant_pose(rng):
    # Weak perspective is only an approximation; it gets good for far subjects.
    pose_abs, rel = make_synthetic_pose(rng, depth_mm=12000.0)
    K = np.asarray(intrinsics_from_fov(25.0, (PROC_SIDE, PROC_SIDE)))[0]
    coords2d = project_np(pose_abs, K).astype(np.float32)
    got = reconstruct.reconstruct_absolute(
        jnp.array(coords2d), jnp.array(rel),
        jnp.tile(jnp.array(K)[None], (4, 1, 1)),
        proc_side=PROC_SIDE, stride=STRIDE, mix_3d_inside_fov=None,
        weak_perspective=True)
    err = np.linalg.norm(np.asarray(got) - pose_abs, axis=-1)
    assert err.mean() < 350.0  # within ~3% of 12m depth


def test_out_of_fov_joints_use_3d_branch(rng):
    pose_abs, rel = make_synthetic_pose(rng, batch=1)
    K = np.asarray(intrinsics_from_fov(55.0, (PROC_SIDE, PROC_SIDE)))[0]
    coords2d = project_np(pose_abs, K).astype(np.float32)
    # Push one joint's 2D prediction just outside the FOV band (the band is
    # [24, 232] for stride 32); since the 3D branch is consistent, the
    # reconstruction should still be near-perfect for that joint (it switches
    # to the 3D-based estimate, whose reference point comes from the other,
    # FOV-valid joints).
    coords2d_corrupt = coords2d.copy()
    coords2d_corrupt[0, 0] = [10.0, 10.0]
    got = reconstruct.reconstruct_absolute(
        jnp.array(coords2d_corrupt), jnp.array(rel), jnp.array(K)[None],
        proc_side=PROC_SIDE, stride=STRIDE, mix_3d_inside_fov=0.5,
        weak_perspective=False)
    err0 = np.linalg.norm(np.asarray(got)[0, 0] - pose_abs[0, 0])
    assert err0 < 10.0


def test_is_within_fov_band():
    # stride 32, centered stride: band is [24, 232] for a 256 crop.
    pts = jnp.array([[[25.0, 25.0], [23.0, 128.0], [128.0, 233.0], [231.9, 24.1]]])
    got = np.asarray(reconstruct.is_within_fov(
        pts, proc_side=PROC_SIDE, stride=STRIDE, centered_stride=True))
    np.testing.assert_array_equal(got[0], [True, False, False, True])


def test_project_pose_clamps_z():
    coords = jnp.array([[[100.0, 50.0, 0.25]]])  # z below the 1mm clamp
    K = jnp.eye(3)[None]
    got = np.asarray(reconstruct.project_pose(coords, K))
    np.testing.assert_allclose(got[0, 0], [100.0, 50.0], rtol=1e-6)
