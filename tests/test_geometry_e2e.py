"""End-to-end geometric consistency of the fused estimator.

A bright dot is rendered at a known 3D point; an 'oracle' crop model locates
the dot in the ACTUAL warped crops (brightness soft-argmax) and reconstructs
it through the crop intrinsics K_new (direction x known range). If the
pipeline's crop construction (look-at rotation, per-aug rotation/flip/scale,
K_new = scaled intrinsics with centered principal point, warp resampling,
mirror unswap, poses @ R back-rotation) is self-consistent, the estimator's
camera-space output equals the true point for EVERY augmentation — this is
the bit-accuracy check SURVEY §7 step 4 calls for, with the oracle replacing
reference SavedModel outputs (unavailable without weights).
"""

import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import H36M_17

RES = 128
CFG = ModelConfig(proc_side=RES, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')

TRUE_POINT_CAM = np.array([120.0, -80.0, 4000.0], np.float32)
RANGE = float(np.linalg.norm(TRUE_POINT_CAM))


def render_dot_image(K, imshape=(480, 640)):
    img = np.zeros(imshape + (3,), np.uint8)
    uv = (K[:2, :2] @ (TRUE_POINT_CAM[:2] / TRUE_POINT_CAM[2]) + K[:2, 2])
    import cv2
    cv2.circle(img, tuple(np.round(uv).astype(int)), 4, (255, 255, 255), -1)
    return img, uv


def oracle_crop_model(state, crops, intrinsics, sample_valid):
    """Finds the dot via brightness soft-argmax and reconstructs
    ray(K_new^-1) * RANGE — the true point in the virtual camera frame."""
    brightness = jnp.mean(crops.astype(jnp.float32), axis=-1)  # [N, R, R]
    w = brightness ** 4
    norm = jnp.sum(w, axis=(1, 2), keepdims=True) + 1e-12
    xs = jnp.arange(RES, dtype=jnp.float32)
    u = jnp.sum(w * xs[None, None, :], axis=(1, 2)) / norm[:, 0, 0]
    v = jnp.sum(w * xs[None, :, None], axis=(1, 2)) / norm[:, 0, 0]
    ones = jnp.ones_like(u)
    pix = jnp.stack([u, v, ones], axis=1)  # [N, 3]
    rays = jnp.einsum('nij,nj->ni', jnp.linalg.inv(intrinsics), pix)
    rays = rays / jnp.linalg.norm(rays, axis=1, keepdims=True)
    point = rays * RANGE  # [N, 3] virtual-camera frame
    return jnp.tile(point[:, None, :], (1, 17, 1))


def test_estimator_geometry_consistency():
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    img, uv = render_dot_image(K)
    est = PoseEstimator(oracle_crop_model, H36M_17, CFG)
    # Box roughly centered on the dot.
    box = np.array([[uv[0] - 110, uv[1] - 130, 220, 260]], np.float32)

    out = est.estimate_poses_batched(
        img[None], box[None], intrinsic_matrix=K[None],
        num_aug=5, average_aug=False, internal_batch_size=64)
    poses = np.asarray(out['poses3d'])[0, 0]  # [num_aug, 17, 3]
    assert np.asarray(out['valid'])[0, 0]
    # Every augmentation (rotations, flips, scales, gammas) must recover the
    # SAME camera-space point after the pipeline's back-rotation.
    err = np.linalg.norm(poses - TRUE_POINT_CAM, axis=-1)
    assert err.max() < 30.0, (err, poses[:, 0])


def test_estimator_geometry_consistency_with_distortion():
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    d = np.array([-0.15, 0.03, 1e-3, -1e-3, 0.0], np.float32)
    # Render the dot where the DISTORTED projection puts it.
    from metrabs_tpu.data.camera import distort_points_np
    norm_xy = TRUE_POINT_CAM[:2] / TRUE_POINT_CAM[2]
    dist_xy = distort_points_np(norm_xy[None], d)[0]
    uv = K[:2, :2] @ dist_xy + K[:2, 2]
    img = np.zeros((480, 640, 3), np.uint8)
    import cv2
    cv2.circle(img, tuple(np.round(uv).astype(int)), 4, (255, 255, 255), -1)

    est = PoseEstimator(oracle_crop_model, H36M_17, CFG)
    box = np.array([[uv[0] - 110, uv[1] - 130, 220, 260]], np.float32)
    out = est.estimate_poses_batched(
        img[None], box[None], intrinsic_matrix=K[None],
        distortion_coeffs=d[None], num_aug=3, average_aug=False)
    poses = np.asarray(out['poses3d'])[0, 0]
    # The crop warp must UNDISTORT: the virtual camera is distortion-free, so
    # reconstruction through K_new recovers the true point.
    err = np.linalg.norm(poses - TRUE_POINT_CAM, axis=-1)
    assert err.max() < 30.0, (err, poses[:, 0])
    # And the 2D output path must RE-APPLY the distortion
    # (`multiperson_model.py:181-185`): poses2d lands on the rendered pixel.
    poses2d = np.asarray(out['poses2d'])[0, 0]
    err2d = np.linalg.norm(poses2d - uv, axis=-1)
    assert err2d.max() < 4.0, (err2d, poses2d[:, 0], uv)
