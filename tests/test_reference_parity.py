"""Parity tests against the EXECUTED reference implementation.

TensorFlow 2.21 is installed in this environment, so instead of hand-derived
goldens these tests run the actual reference code (`/root/reference/metrabs_tf`,
imported via tests/_reference_oracle.py with its external deps stubbed) on
randomized inputs and assert our JAX ops reproduce it within float32 tolerance.

Covered reference surfaces (file:line cites for the audit):
  - tfu.softmax / soft_argmax / decode_heatmap / linspace / auc
    (`metrabs_tf/tfu.py:209-260,236-243`)
  - tfu.reduce_mean_masked / reduce_sum_masked / mean_stdev_masked
    (`tfu.py:27-88`)
  - tfu3d: procrustes_tf, rigid_align, center_relative_pose,
    reconstruct_ref_fullpersp/weakpersp, reconstruct_absolute, is_within_fov,
    back_project, project, project_pose, intrinsic_matrix_from_field_of_view,
    get_new_rotation_matrix, rotation_mat (`tfu3d.py:10-319`)
  - multiperson/warping.py distortion formulas + corner_aligned_scale_mat
    (`warping.py:94-165`)
  - multiperson/plausibility_check.py — all five checks + NMS
    (`plausibility_check.py:9-96`)
  - models/util.py heatmap_to_image/25d/metric (`models/util.py:8-29`)
  - models/eval_metrics.py compute_pose3d_metrics (`eval_metrics.py:10-62`)
  - procrustes.py numpy procrustes (`metrabs_tf/procrustes.py`)
"""

from __future__ import annotations

import types

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

pytestmark = pytest.mark.oracle

import jax.numpy as jnp

from tests import _reference_oracle

from metrabs_tpu.eval import metrics as our_metrics
from metrabs_tpu.ops import camera as our_camera
from metrabs_tpu.ops import distortion as our_distortion
from metrabs_tpu.ops import heatmap as our_heatmap
from metrabs_tpu.ops import heatmap_decode as our_decode
from metrabs_tpu.ops import masked as our_masked
from metrabs_tpu.ops import procrustes as our_procrustes
from metrabs_tpu.ops import reconstruct as our_reconstruct
from metrabs_tpu.ops import rotation as our_rotation
from metrabs_tpu.pipeline import plausibility as our_plausibility
from metrabs_tpu.pipeline.tta import linspace_midpoint
from metrabs_tpu.utils.joint_info import JointInfo


@pytest.fixture(scope='module')
def ref():
    o = _reference_oracle.load_reference()
    f = o.flags
    f.proc_side = 256
    f.stride_train = 32
    f.stride_test = 32
    f.centered_stride = True
    f.box_size_mm = 2200.0
    f.weak_perspective = False
    f.mean_relative = True
    f.bone_length_dataset = ''
    f.dataset3d = 'testset'
    return o


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# tfu: softmax / heatmap decode / linspace / auc


def test_softmax_matches(ref, rng):
    x = rng.normal(size=(2, 3, 7, 5)).astype(np.float32) * 4
    for axis in (-1, 1, [1, 2], [2, 3]):
        got = _np(our_decode.softmax_multi_axis(jnp.asarray(x), axis))
        want = _np(ref.tfu.softmax(tf.constant(x), axis=axis))
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize('axes', [[2, 1], [1, 2], [2, 1, 3], [3, 2, 1]])
def test_decode_heatmap_matches(ref, rng, axes):
    x = np.abs(rng.normal(size=(2, 6, 8, 7, 4)).astype(np.float32))
    x = x / x.sum(axis=tuple(axes), keepdims=True)
    got = _np(our_decode.decode_heatmap(jnp.asarray(x), axes))
    want = _np(ref.tfu.decode_heatmap(tf.constant(x), axis=axes))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_decode_heatmap_output_axis_matches(ref, rng):
    x = np.abs(rng.normal(size=(2, 6, 8, 4)).astype(np.float32))
    x = x / x.sum(axis=(1, 2), keepdims=True)
    got = _np(our_decode.decode_heatmap(jnp.asarray(x), [2, 1], output_coord_axis=1))
    want = _np(ref.tfu.decode_heatmap(tf.constant(x), axis=[2, 1], output_coord_axis=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_soft_argmax_matches(ref, rng):
    logits = rng.normal(size=(3, 12, 16, 16, 8)).astype(np.float32) * 3
    got = _np(our_decode.soft_argmax(jnp.asarray(logits), [3, 2, 4]))
    want = _np(ref.tfu.soft_argmax(tf.constant(logits), axis=[3, 2, 4]))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize('num', [1, 2, 3, 5, 7])
@pytest.mark.parametrize('endpoint', [True, False])
def test_linspace_matches(ref, num, endpoint):
    got = linspace_midpoint(-0.4, 1.7, num, endpoint=endpoint)
    want = _np(ref.tfu.linspace(
        tf.constant(-0.4, tf.float32), tf.constant(1.7, tf.float32), num,
        endpoint=endpoint))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_auc_matches(ref, rng):
    x = (rng.uniform(size=(64,)) * 300).astype(np.float32)
    got = _np(our_metrics.auc_score(jnp.asarray(x), 0.0, 150.0))
    want = _np(ref.tfu.auc(tf.constant(x), 0.0, 150.0))
    np.testing.assert_allclose(got, want, atol=1e-6)
    got = _np(our_metrics.auc_score(jnp.asarray(x), 50.0, 150.0))
    want = _np(ref.tfu.auc(tf.constant(x), 50.0, 150.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# tfu masked reductions


def test_reduce_mean_masked_matches(ref, rng):
    x = rng.normal(size=(4, 9, 3)).astype(np.float32)
    mask = rng.uniform(size=(4, 9)) > 0.3
    mask[0] = True  # one fully valid row
    for axis, keepdims in [(None, False), (1, False), (1, True)]:
        got = _np(our_masked.reduce_mean_masked(
            jnp.asarray(x), jnp.asarray(mask), axis=axis, keepdims=keepdims))
        want = _np(ref.tfu.reduce_mean_masked(
            tf.constant(x), tf.constant(mask), axis=axis, keepdims=keepdims))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f'axis={axis}')


def test_reduce_mean_masked_broadcast_axis_divergence(ref, rng):
    """INTENTIONAL divergence, pinned: when the reduction axes extend past the
    mask's rank, the reference divides the (broadcast) sum by the UNbroadcast
    valid count (`tfu.py:46-52` expands the mask with singleton dims but
    `count_nonzero` never broadcasts it) — i.e. a 3-vector entry sums 3
    elements but counts as 1. No reference call site exercises this mode
    (tfu3d.py:36-41,155 use axis within mask rank; the losses use axis=None,
    which boolean_masks and takes a true mean), so we implement the true
    broadcast-counted mean instead of reproducing the latent bug."""
    x = rng.normal(size=(4, 9, 3)).astype(np.float32)
    mask = rng.uniform(size=(4, 9)) > 0.3
    got = _np(our_masked.reduce_mean_masked(
        jnp.asarray(x), jnp.asarray(mask), axis=(1, 2)))
    want = _np(ref.tfu.reduce_mean_masked(
        tf.constant(x), tf.constant(mask), axis=(1, 2)))
    np.testing.assert_allclose(got * 3.0, want, atol=1e-6)
    # Ours equals the true mean of the valid entries.
    expected = np.stack([x[i][mask[i]].mean() for i in range(4)])
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_reduce_sum_masked_matches(ref, rng):
    x = rng.normal(size=(4, 9, 3)).astype(np.float32)
    mask = rng.uniform(size=(4, 9)) > 0.3
    for axis, keepdims in [(None, False), (1, False), ((1, 2), True)]:
        got = _np(our_masked.reduce_sum_masked(
            jnp.asarray(x), jnp.asarray(mask), axis=axis, keepdims=keepdims))
        want = _np(ref.tfu.reduce_sum_masked(
            tf.constant(x), tf.constant(mask), axis=axis, keepdims=keepdims))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f'axis={axis}')


def test_mean_stdev_masked_matches(ref, rng):
    x = rng.normal(size=(4, 9, 2)).astype(np.float32)
    mask = rng.uniform(size=(4, 9)) > 0.3
    mask[:, :3] = True
    got_mean, got_stdev = our_masked.mean_stdev_masked(
        jnp.asarray(x), jnp.asarray(mask), items_axis=1, dimensions_axis=2)
    want_mean, want_stdev = ref.tfu.mean_stdev_masked(
        tf.constant(x), tf.constant(mask), items_axis=1, dimensions_axis=2)
    np.testing.assert_allclose(_np(got_mean), _np(want_mean), atol=1e-6)
    np.testing.assert_allclose(_np(got_stdev), _np(want_stdev), atol=1e-6)


# ---------------------------------------------------------------------------
# tfu3d: center_relative / procrustes / rigid_align


def test_center_relative_pose_matches(ref, rng):
    x = (rng.normal(size=(4, 17, 3)) * 300).astype(np.float32)
    mask = rng.uniform(size=(4, 17)) > 0.2
    mask[:, :4] = True
    got = _np(our_metrics.center_relative(
        jnp.asarray(x), jnp.asarray(mask), center_is_mean=True))
    want = _np(ref.tfu3d.center_relative_pose(
        tf.constant(x), tf.constant(mask), center_is_mean=True))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # center_is_mean=False: last-joint centering, mask ignored
    got = _np(our_metrics.center_relative(jnp.asarray(x), None, center_is_mean=False))
    want = _np(ref.tfu3d.center_relative_pose(tf.constant(x), None, center_is_mean=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _make_procrustes_pair(rng, batch=5, n_points=17, noise=80.0):
    """Ground truth + noisy rigid transform of it, in mm scale. The noise
    makes the optimal rotation well-conditioned so the reference's float32
    SVD and our Horn quaternion method agree to float32 accuracy."""
    X = (rng.normal(size=(batch, n_points, 3)) * 350).astype(np.float32)
    angles = rng.uniform(0, 2 * np.pi, size=batch)
    R = np.stack([
        np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        for a in angles]).astype(np.float32)
    t = (rng.normal(size=(batch, 1, 3)) * 500).astype(np.float32)
    scale = rng.uniform(0.7, 1.4, size=(batch, 1, 1)).astype(np.float32)
    Y = (X @ R) * scale + t + rng.normal(size=X.shape).astype(np.float32) * noise
    mask = rng.uniform(size=(batch, n_points)) > 0.15
    mask[:, :5] = True
    return X, Y.astype(np.float32), mask


@pytest.mark.parametrize('allow_scaling', [False, True])
@pytest.mark.parametrize('allow_reflection', [False, True])
def test_procrustes_matches(ref, rng, allow_scaling, allow_reflection):
    X, Y, mask = _make_procrustes_pair(rng)
    got = _np(our_procrustes.procrustes_align(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(mask),
        allow_scaling=allow_scaling, allow_reflection=allow_reflection))
    want = _np(ref.tfu3d.procrustes_tf(
        tf.constant(X), tf.constant(Y), tf.constant(mask),
        allow_scaling=allow_scaling, allow_reflection=allow_reflection))
    # Different float32 algorithms (Horn eigendecomposition vs SVD); the
    # optimum is shared — compare in mm with a 0.05 mm tolerance.
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_rigid_align_matches(ref, rng):
    X, Y, mask = _make_procrustes_pair(rng)
    got = _np(our_procrustes.rigid_align(
        jnp.asarray(Y), jnp.asarray(X), joint_validity_mask=jnp.asarray(mask),
        scale_align=True))
    want = _np(ref.tfu3d.rigid_align(
        tf.constant(Y), tf.constant(X), joint_validity_mask=tf.constant(mask),
        scale_align=True))
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_numpy_procrustes_oracle(ref, rng):
    """Our batched rigid_align vs the reference's MATLAB-port numpy procrustes
    (used by its eval scripts) on a single unmasked pose."""
    X, Y, _ = _make_procrustes_pair(rng, batch=1)
    _, Z, _ = ref.procrustes_np.procrustes(
        X[0].astype(np.float64), Y[0].astype(np.float64),
        scaling=True, reflection='best')
    got = _np(our_procrustes.rigid_align(
        jnp.asarray(Y), jnp.asarray(X), scale_align=True, reflection_align=True))[0]
    np.testing.assert_allclose(got, Z, atol=5e-2)


# ---------------------------------------------------------------------------
# tfu3d: absolute reconstruction


def _make_reconstruction_inputs(rng, batch=6, n_joints=24):
    intrinsics = np.array(
        [[[1200.0, 0, 128.0], [0, 1200.0, 128.0], [0, 0, 1]]], np.float32)
    intrinsics = np.tile(intrinsics, (batch, 1, 1))
    coords3d_rel = (rng.normal(size=(batch, n_joints, 3)) * 350).astype(np.float32)
    coords3d_rel -= coords3d_rel.mean(axis=1, keepdims=True)
    root = np.stack([
        rng.uniform(-300, 300, size=batch),
        rng.uniform(-300, 300, size=batch),
        rng.uniform(2500, 4500, size=batch)], axis=-1).astype(np.float32)
    coords3d_abs = coords3d_rel + root[:, None, :]
    proj = coords3d_abs[..., :2] / coords3d_abs[..., 2:]
    coords2d = (proj @ intrinsics[:, :2, :2].transpose(0, 2, 1)
                + intrinsics[:, None, :2, 2])
    coords2d = coords2d + rng.normal(size=coords2d.shape) * 2.0
    # Push a few joints far outside the FOV band to exercise both branches.
    coords2d[:, 0] = -40.0
    coords2d[:, 1] = 300.0
    return (coords2d.astype(np.float32), coords3d_rel, intrinsics)


def test_is_within_fov_matches(ref, rng):
    coords2d = rng.uniform(-20, 280, size=(4, 19, 2)).astype(np.float32)
    for centered in (True, False):
        ref.flags.centered_stride = centered
        got = _np(our_reconstruct.is_within_fov(
            jnp.asarray(coords2d), proc_side=256, stride=32, centered_stride=centered))
        want = _np(ref.tfu3d.is_within_fov(tf.constant(coords2d)))
        np.testing.assert_array_equal(got, want)
    ref.flags.centered_stride = True


def test_reconstruct_ref_fullpersp_matches(ref, rng):
    coords2d, coords3d_rel, intrinsics = _make_reconstruction_inputs(rng)
    inv = np.linalg.inv(intrinsics)
    homog = np.concatenate([coords2d, np.ones_like(coords2d[..., :1])], axis=-1)
    normalized_2d = (homog @ inv.transpose(0, 2, 1))[..., :2].astype(np.float32)
    validity = rng.uniform(size=coords2d.shape[:2]) > 0.2
    validity[:, :6] = True
    got = _np(our_reconstruct.reconstruct_ref_fullpersp(
        jnp.asarray(normalized_2d), jnp.asarray(coords3d_rel), jnp.asarray(validity)))
    want = _np(ref.tfu3d.reconstruct_ref_fullpersp(
        tf.constant(normalized_2d), tf.constant(coords3d_rel), tf.constant(validity)))
    # ~3000 mm reference depths; assert to 0.5 mm (different but equivalent
    # solvers: tf.linalg.lstsq(fast=True) normal equations vs our explicit
    # 3x3 normal equations).
    np.testing.assert_allclose(got, want, atol=0.5)


def test_reconstruct_ref_weakpersp_matches(ref, rng):
    coords2d, coords3d_rel, intrinsics = _make_reconstruction_inputs(rng)
    inv = np.linalg.inv(intrinsics)
    homog = np.concatenate([coords2d, np.ones_like(coords2d[..., :1])], axis=-1)
    normalized_2d = (homog @ inv.transpose(0, 2, 1))[..., :2].astype(np.float32)
    validity = rng.uniform(size=coords2d.shape[:2]) > 0.2
    validity[:, :6] = True
    got = _np(our_reconstruct.reconstruct_ref_weakpersp(
        jnp.asarray(normalized_2d), jnp.asarray(coords3d_rel), jnp.asarray(validity)))
    want = _np(ref.tfu3d.reconstruct_ref_weakpersp(
        tf.constant(normalized_2d), tf.constant(coords3d_rel), tf.constant(validity)))
    np.testing.assert_allclose(got, want, atol=0.5)


@pytest.mark.parametrize('weak_perspective', [False, True])
@pytest.mark.parametrize('mix_3d_inside_fov', [None, 0.4])
def test_reconstruct_absolute_matches(ref, rng, weak_perspective, mix_3d_inside_fov):
    coords2d, coords3d_rel, intrinsics = _make_reconstruction_inputs(rng)
    got = _np(our_reconstruct.reconstruct_absolute(
        jnp.asarray(coords2d), jnp.asarray(coords3d_rel), jnp.asarray(intrinsics),
        proc_side=256, stride=32, centered_stride=True,
        mix_3d_inside_fov=mix_3d_inside_fov, weak_perspective=weak_perspective))
    want = _np(ref.tfu3d.reconstruct_absolute(
        tf.constant(coords2d), tf.constant(coords3d_rel), tf.constant(intrinsics),
        mix_3d_inside_fov=mix_3d_inside_fov, weak_perspective=weak_perspective))
    np.testing.assert_allclose(got, want, atol=0.75)


def test_back_project_and_project_match(ref, rng):
    cam2d = rng.normal(size=(3, 17, 2)).astype(np.float32) * 0.2
    delta_z = rng.normal(size=(3, 17)).astype(np.float32) * 300
    z_offset = rng.uniform(2000, 4000, size=(3,)).astype(np.float32)
    got = _np(our_reconstruct.back_project(
        jnp.asarray(cam2d), jnp.asarray(delta_z), jnp.asarray(z_offset)))
    want = _np(ref.tfu3d.back_project(
        tf.constant(cam2d), tf.constant(delta_z), tf.constant(z_offset)))
    np.testing.assert_allclose(got, want, atol=1e-3)

    pts = got + np.float32(1.0)
    np.testing.assert_allclose(
        _np(our_camera.project(jnp.asarray(pts))),
        _np(ref.tfu3d.project(tf.constant(pts))), atol=1e-5)


def test_project_pose_matches(ref, rng):
    coords3d = (rng.normal(size=(3, 17, 3)) * 400).astype(np.float32)
    coords3d[..., 2] += 3000
    coords3d[0, 0, 2] = -5.0  # exercises the z>=1 clamp
    intr = np.array([[[1100.0, 0, 120], [0, 1150.0, 130], [0, 0, 1]]], np.float32)
    intr = np.tile(intr, (3, 1, 1))
    got = _np(our_reconstruct.project_pose(jnp.asarray(coords3d), jnp.asarray(intr)))
    want = _np(ref.tfu3d.project_pose(tf.constant(coords3d), tf.constant(intr)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_intrinsics_from_fov_matches(ref):
    for imshape in ((480, 640), (720, 576)):
        got = _np(our_camera.intrinsics_from_fov(55.0, imshape))
        want = _np(ref.tfu3d.intrinsic_matrix_from_field_of_view(
            tf.constant(55.0), tf.constant(imshape)))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lookat_rotation_matches(ref, rng):
    forward = rng.normal(size=(6, 3)).astype(np.float32)
    forward[0] = [0.0, -1.0, 0.0]  # parallel to up: degenerate-cross fallback
    up = np.array([0.0, -1.0, 0.0], np.float32)
    got = _np(our_rotation.lookat_rotation_matrix(jnp.asarray(forward), jnp.asarray(up)))
    want = _np(ref.tfu3d.get_new_rotation_matrix(
        tf.constant(forward), tf.constant(np.tile(up, (6, 1)))))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize('axis', ['x', 'y', 'z'])
def test_rotation_mat_matches(ref, rng, axis):
    angles = rng.uniform(-np.pi, np.pi, size=(5,)).astype(np.float32)
    got = _np(our_rotation.rotation_mat(jnp.asarray(angles), axis))
    want = _np(ref.tfu3d.rotation_mat(tf.constant(angles), axis))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# warping.py distortion formulas


@pytest.mark.parametrize('n_coeffs', [4, 5, 8, 12])
def test_distort_points_matches(ref, rng, n_coeffs):
    pts = rng.normal(size=(7, 2)).astype(np.float32) * 0.3
    coeffs = (rng.normal(size=(n_coeffs,)) * 0.05).astype(np.float32)
    got = _np(our_distortion.distort_points(jnp.asarray(pts), jnp.asarray(coeffs)))
    want = _np(ref.warping.distort_points(tf.constant(pts), tf.constant(coeffs)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_distort_points_batched_coeffs_matches(ref, rng):
    pts = rng.normal(size=(3, 7, 2)).astype(np.float32) * 0.3
    coeffs = (rng.normal(size=(3, 5)) * 0.05).astype(np.float32)
    got = _np(our_distortion.distort_points(jnp.asarray(pts), jnp.asarray(coeffs)))
    want = _np(ref.warping.distort_points(tf.constant(pts), tf.constant(coeffs)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_undistort_points_matches(ref, rng):
    pts = rng.normal(size=(9, 2)).astype(np.float32) * 0.3
    coeffs = (rng.normal(size=(8,)) * 0.03).astype(np.float32)
    dist = _np(ref.warping.distort_points(tf.constant(pts), tf.constant(coeffs)))
    got = _np(our_distortion.undistort_points(jnp.asarray(dist), jnp.asarray(coeffs)))
    want = _np(ref.warping.undistort_points(tf.constant(dist), tf.constant(coeffs)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_zero_coeffs_identity_matches(ref, rng):
    """The reference takes a graph-level shortcut for all-zero coefficients;
    our branch-free form must be the exact identity there too."""
    pts = rng.normal(size=(5, 2)).astype(np.float32)
    coeffs = np.zeros((5,), np.float32)
    got = _np(our_distortion.distort_points(jnp.asarray(pts), jnp.asarray(coeffs)))
    want = _np(ref.warping.distort_points(tf.constant(pts), tf.constant(coeffs)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, pts)


def test_corner_aligned_scale_mat_matches(ref):
    for factor in (0.5, 1.0, 1.6180339887):
        got = _np(our_camera.corner_aligned_scale_mat(factor))
        want = _np(ref.warping.corner_aligned_scale_mat(tf.constant(factor, tf.float32)))
        np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# models/util.py heatmap coordinate mappings


@pytest.mark.parametrize('centered', [True, False])
@pytest.mark.parametrize('stride', [32, 16])
def test_heatmap_to_image_matches(ref, rng, centered, stride):
    ref.flags.centered_stride = centered
    ref.flags.stride_train = stride
    ref.flags.stride_test = stride
    coords = rng.uniform(size=(4, 17, 2)).astype(np.float32)
    for is_training in (True, False):
        got = _np(our_heatmap.heatmap_to_image(
            jnp.asarray(coords), proc_side=256, stride=stride, centered_stride=centered))
        want = _np(ref.models_util.heatmap_to_image(tf.constant(coords), is_training))
        np.testing.assert_allclose(got, want, atol=1e-5)
    ref.flags.centered_stride = True
    ref.flags.stride_train = 32
    ref.flags.stride_test = 32


def test_heatmap_to_25d_and_metric_match(ref, rng):
    coords = rng.uniform(size=(4, 17, 3)).astype(np.float32)
    got = _np(our_heatmap.heatmap_to_25d(
        jnp.asarray(coords), proc_side=256, stride=32, box_size_mm=2200.0))
    want = _np(ref.models_util.heatmap_to_25d(tf.constant(coords), True))
    np.testing.assert_allclose(got, want, atol=1e-3)

    got = _np(our_heatmap.heatmap_to_metric(
        jnp.asarray(coords), proc_side=256, stride=32, box_size_mm=2200.0))
    want = _np(ref.models_util.heatmap_to_metric(tf.constant(coords), True))
    np.testing.assert_allclose(got, want, atol=1e-3)


# ---------------------------------------------------------------------------
# plausibility_check.py


_TEST_EDGES = [(1, 0), (2, 1), (3, 2), (5, 4), (6, 5), (8, 7), (10, 9),
               (12, 11), (13, 12), (15, 14), (16, 15)]


def _ref_joint_info(n_joints=17):
    return types.SimpleNamespace(
        n_joints=n_joints, stick_figure_edges=_TEST_EDGES,
        names=[f'j{i}' for i in range(n_joints)])


def _make_poses(rng, n=8, n_joints=17, scale=900.0):
    poses = (rng.normal(size=(n, n_joints, 3)) * scale / 4).astype(np.float32)
    poses[..., 2] += 3000
    return poses


def test_is_pose_plausible_matches(ref, rng):
    ji = _ref_joint_info()
    mean_bones = rng.uniform(120, 500, size=(len(_TEST_EDGES),)).astype(np.float32)
    _reference_oracle.BONE_MEANS[0] = mean_bones
    poses = _make_poses(rng)
    poses[0] *= 4.0   # absurdly long bones
    poses[1] *= 0.01  # collapsed pose
    j2b = JointInfo(
        names=tuple(f'j{i}' for i in range(17)), edges=tuple(_TEST_EDGES)
    ).joint2bone_matrix()
    got = _np(our_plausibility.is_pose_plausible(
        jnp.asarray(poses), jnp.asarray(j2b), jnp.asarray(mean_bones)))
    want = _np(ref.plausibility_check.is_pose_plausible(tf.constant(poses), ji))
    np.testing.assert_array_equal(got, want)


def test_scale_align_and_point_stdev_match(ref, rng):
    poses = _make_poses(rng, n=6)[np.newaxis]  # [1, 6, J, 3]
    got = _np(our_plausibility.scale_align(jnp.asarray(poses)))
    want = _np(ref.plausibility_check.scale_align(tf.constant(poses)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)

    got = _np(our_plausibility.point_stdev(
        jnp.asarray(poses), item_axis=1, coord_axis=-1))
    want = _np(ref.plausibility_check.point_stdev(
        tf.constant(poses), item_axis=1, coord_axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_aug_consistency_matches(ref, rng):
    # [n_poses, n_aug, J, 3]: pose 0 has consistent TTA copies, pose 1 wild
    base = _make_poses(rng, n=4)
    poses = np.stack([base + rng.normal(size=base.shape).astype(np.float32) * s
                      for s in (20, 25, 30, 22, 28)], axis=1)
    poses[1] = rng.normal(size=poses[1].shape).astype(np.float32) * 1500
    got = _np(our_plausibility.are_augmentation_results_consistent(jnp.asarray(poses)))
    want = _np(ref.plausibility_check.are_augmentation_results_consistent(
        tf.constant(poses)))
    np.testing.assert_array_equal(got, want)


def test_box_consistency_matches(ref, rng):
    pose2d = (rng.uniform(0, 256, size=(6, 17, 2))).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0, 100, size=6), rng.uniform(0, 100, size=6),
        rng.uniform(50, 250, size=6), rng.uniform(50, 250, size=6)],
        axis=-1).astype(np.float32)
    got = _np(our_plausibility.is_pose_consistent_with_box(
        jnp.asarray(pose2d), jnp.asarray(boxes)))
    want = _np(ref.plausibility_check.is_pose_consistent_with_box(
        tf.constant(pose2d), tf.constant(boxes)))
    np.testing.assert_array_equal(got, want)


def test_pose_similarity_matches(ref, rng):
    poses = _make_poses(rng, n=7)
    poses[3] = poses[0] + rng.normal(size=poses[0].shape).astype(np.float32) * 15
    got = _np(our_plausibility.compute_pose_similarity(jnp.asarray(poses)))
    want = _np(ref.plausibility_check.compute_pose_similarity(tf.constant(poses)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pose_nms_matches(ref, rng):
    poses = _make_poses(rng, n=10)
    # Near-duplicates with lower scores must be suppressed in both impls.
    poses[4] = poses[1] + rng.normal(size=poses[1].shape).astype(np.float32) * 10
    poses[7] = poses[2] + rng.normal(size=poses[2].shape).astype(np.float32) * 10
    scores = np.linspace(0.95, 0.35, 10).astype(np.float32)
    valid = np.ones(10, bool)
    valid[5] = False
    got_mask = _np(our_plausibility.pose_non_max_suppression(
        jnp.asarray(poses), jnp.asarray(scores), jnp.asarray(valid)))
    want_idx = _np(ref.plausibility_check.pose_non_max_suppression(
        tf.constant(poses), tf.constant(scores), tf.constant(valid)))
    np.testing.assert_array_equal(np.flatnonzero(got_mask), np.sort(want_idx))


# ---------------------------------------------------------------------------
# TTA schedule (multiperson_model.py:138-170)


@pytest.mark.parametrize('mode', ['normal', '360', '360_half'])
@pytest.mark.parametrize('num_aug', [1, 2, 3, 5, 7])
def test_tta_schedule_matches_reference_composition(ref, mode, num_aug):
    """make_tta_params vs the reference's TTA setup, composed from the
    reference's OWN executed primitives with the exact call structure of
    `multiperson_model.py:138-170` (gammas/angles/scales linspaces, the
    sorted half-360 concat, the alternating flip pattern and the
    flip @ Rz(-angle) matrices)."""
    from metrabs_tpu.config import AugConfig
    from metrabs_tpu.pipeline.tta import make_tta_params

    rot_aug = 25.0
    cfg = AugConfig(rot_aug_degrees=rot_aug,
                    rot_aug_360=(mode == '360'),
                    rot_aug_360_half=(mode == '360_half'))
    ours = make_tta_params(num_aug, cfg)

    tfu, tfu3d = ref.tfu, ref.tfu3d
    want_gammas = _np(tf.cast(tfu.linspace(0.6, 1.0, num_aug), tf.float32))
    if mode == '360_half':
        n_norm = num_aug // 2
        rng_norm = np.float32(np.deg2rad(rot_aug))
        a_norm = tfu.linspace(-rng_norm, rng_norm, n_norm)
        n_360 = num_aug - n_norm
        rng_360 = tf.cast(np.pi, tf.float32) * (1 - 1 / tf.cast(n_360, tf.float32))
        a_360 = tfu.linspace(-rng_360, rng_360, n_360)
        want_angles = _np(tf.sort(tf.concat([a_norm, a_360], axis=0)))
    elif mode == '360':
        rng_360 = tf.cast(np.pi, tf.float32) * (1 - 1 / tf.cast(num_aug, tf.float32))
        want_angles = _np(tfu.linspace(-rng_360, rng_360, num_aug))
    else:
        rng_norm = np.float32(np.deg2rad(rot_aug))
        want_angles = _np(tfu.linspace(-rng_norm, rng_norm, num_aug))
    want_scales = _np(tf.concat([
        tfu.linspace(0.8, 1.0, num_aug // 2, endpoint=False),
        tfu.linspace(1.0, 1.1, num_aug - num_aug // 2)], axis=0))
    want_flip = _np((tf.range(num_aug) - num_aug // 2) % 2 != 0)
    flipmat = tf.constant([[-1, 0, 0], [0, 1, 0], [0, 0, 1]], tf.float32)
    maybe_flip = tf.where(
        tf.constant(want_flip)[:, None, None], flipmat, tf.eye(3))
    want_rotflip = _np(maybe_flip @ ref.tfu3d.rotation_mat(
        tf.constant(-want_angles), rot_axis='z'))
    del tfu3d

    np.testing.assert_allclose(ours.gammas, want_gammas, atol=1e-6)
    np.testing.assert_allclose(ours.angles, want_angles, atol=1e-6)
    np.testing.assert_allclose(ours.scales, want_scales, atol=1e-6)
    np.testing.assert_array_equal(ours.should_flip, want_flip)
    np.testing.assert_allclose(ours.rotflip_mats, want_rotflip, atol=1e-6)


# ---------------------------------------------------------------------------
# training losses (models/metrabs.py:227-318, via the stubbed-fleras import)


@pytest.fixture(scope='module')
def ref_trainer(ref):
    o = _reference_oracle.load_reference_models()
    T = o.models_metrabs.MetrabsTrainer
    trainer = T.__new__(T)  # the loss methods need no initialized state
    return trainer


def _loss_inputs(rng, batch=5, n_joints=19):
    intr = np.array([[[1100.0, 0, 128], [0, 1100.0, 128], [0, 0, 1]]],
                    np.float32)
    intr = np.tile(intr, (batch, 1, 1))
    true3d = (rng.normal(size=(batch, n_joints, 3)) * 350).astype(np.float32)
    true3d[..., 2] += 3000
    true3d[0, :3, 2] = 150.0      # closer than the 300mm far gate
    pred3d = true3d + rng.normal(size=true3d.shape).astype(np.float32) * 80
    pred3d[1, 4, :] = [5000.0, 5000.0, 3000.0]   # far outside the FOV
    validity = rng.uniform(size=(batch, n_joints)) > 0.15
    validity[:, :4] = True
    return pred3d, true3d, intr, validity


@pytest.mark.parametrize('step', [0, 99999])
def test_loss_with_3d_gt_matches(ref, ref_trainer, rng, step):
    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.train import losses as our_losses

    pred3d, true3d, intr, validity = _loss_inputs(rng)
    ref.flags.absloss_factor = 0.1
    ref.flags.absloss_start_step = 5000
    ref_trainer.train_counter = step
    want = _np(ref_trainer.compute_loss_with_3d_gt(
        tf.constant(pred3d), tf.constant(true3d), tf.constant(intr),
        tf.constant(validity)))

    cfg = ModelConfig(proc_side=256, stride_train=32, stride_test=32,
                      depth=8, n_joints=19, dtype='float32')
    tcfg = TrainConfig(absloss_factor=0.1, absloss_start_step=5000)
    got = _np(our_losses.compute_loss_with_3d_gt(
        jnp.asarray(pred3d), jnp.asarray(true3d), jnp.asarray(intr),
        jnp.asarray(validity), cfg=cfg, tcfg=tcfg, step=jnp.int32(step)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_loss_with_2d_gt_matches(ref, ref_trainer, rng):
    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.train import losses as our_losses
    from metrabs_tpu.utils.joint_info import JointInfo

    # 3D joint names with suffixed variants so the startswith grouping in
    # get_2dlike_joints (`metrabs.py:396-405`) averages real groups.
    names3d = ['nose', 'neck', 'lsho', 'lsho_smpl', 'rsho', 'rsho_smpl',
               'lhip', 'rhip', 'pelv', 'pelv_smpl']
    names2d = ['nose', 'neck', 'lsho', 'rsho', 'lhip', 'rhip', 'pelv']
    ji3d = types.SimpleNamespace(
        names=names3d, ids={n: i for i, n in enumerate(names3d)})
    ji2d = types.SimpleNamespace(names=names2d)
    ref_trainer.joint_info = ji3d
    ref_trainer.joint_info_2d = ji2d

    batch, n3d = 4, len(names3d)
    intr = np.tile(np.array(
        [[[1100.0, 0, 128], [0, 1100.0, 128], [0, 0, 1]]], np.float32),
        (batch, 1, 1))
    pred3d = (rng.normal(size=(batch, n3d, 3)) * 300).astype(np.float32)
    pred3d[..., 2] += 3000
    true2d = rng.uniform(10, 246, size=(batch, len(names2d), 2)).astype(np.float32)
    validity2d = rng.uniform(size=(batch, len(names2d))) > 0.2
    validity2d[:, :2] = True

    want = _np(ref_trainer.compte_loss_with_2d_gt(
        tf.constant(pred3d), tf.constant(true2d), tf.constant(intr),
        tf.constant(validity2d)))

    our_ji3d = JointInfo(names=tuple(names3d), edges=())
    our_ji2d = JointInfo(names=tuple(names2d), edges=())
    groups = our_losses.get_2d_joint_index_groups(our_ji3d, our_ji2d)
    cfg = ModelConfig(proc_side=256, stride_train=32, stride_test=32,
                      depth=8, n_joints=n3d, dtype='float32')
    got = _np(our_losses.compute_loss_with_2d_gt(
        jnp.asarray(pred3d), jnp.asarray(true2d), jnp.asarray(intr),
        jnp.asarray(validity2d), groups, cfg=cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_align_2d_skeletons_matches(ref, rng):
    from metrabs_tpu.models.metro import align_2d_skeletons

    pred = rng.uniform(0, 256, size=(4, 12, 2)).astype(np.float32)
    true = rng.uniform(0, 256, size=(4, 12, 2)).astype(np.float32)
    mask = rng.uniform(size=(4, 12)) > 0.2
    mask[:, :3] = True
    got = _np(align_2d_skeletons(
        jnp.asarray(pred), jnp.asarray(true), jnp.asarray(mask)))
    want = _np(ref.models_util.align_2d_skeletons(
        tf.constant(pred), tf.constant(true), tf.constant(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def _group_mean_2d(coords, groups):
    return np.stack(
        [coords[:, list(g), :2].mean(axis=1) for g in groups], axis=1)


def test_metro_losses_match(ref, rng):
    from attrdict import AttrDict
    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.models import metro as our_metro
    from metrabs_tpu.train import losses as our_losses
    from metrabs_tpu.utils.joint_info import JointInfo

    o = _reference_oracle.load_reference_models()
    T = o.models_metro.MetroTrainer
    trainer = T.__new__(T)

    names3d = ['nose', 'neck', 'lsho', 'lsho_smpl', 'rsho', 'rsho_smpl']
    names2d = ['nose', 'neck', 'lsho', 'rsho']
    batch, n3d, n2d = 4, len(names3d), len(names2d)
    true3d = (rng.normal(size=(batch, n3d, 3)) * 300).astype(np.float32)
    pred3d = true3d + rng.normal(size=true3d.shape).astype(np.float32) * 70
    mask3d = rng.uniform(size=(batch, n3d)) > 0.2
    mask3d[:, :2] = True
    pred3d_2dbatch = (rng.normal(size=(batch, n3d, 3)) * 300).astype(np.float32)
    pred3d_2dbatch[..., :2] += 128
    true2d_2d = rng.uniform(10, 246, size=(batch, n2d, 2)).astype(np.float32)
    mask2d = rng.uniform(size=(batch, n2d)) > 0.2
    mask2d[:, :2] = True

    our_ji3d = JointInfo(names=tuple(names3d), edges=())
    our_ji2d = JointInfo(names=tuple(names2d), edges=())
    groups = our_losses.get_2d_joint_index_groups(our_ji3d, our_ji2d)

    # The reference's forward_train feeds compute_losses an already-grouped
    # 2D prediction (`metro.py:60-80`); replicate that grouping host-side.
    pred2d_grouped = _group_mean_2d(pred3d_2dbatch, groups).astype(np.float32)
    inps = AttrDict(
        coords3d_true=tf.constant(true3d),
        joint_validity_mask=tf.constant(mask3d),
        coords2d_true_2d=tf.constant(true2d_2d),
        joint_validity_mask_2d=tf.constant(mask2d))
    preds = AttrDict(coords3d_rel_pred=tf.constant(pred3d),
                     coords2d_pred_2d=tf.constant(pred2d_grouped))
    want = trainer.compute_losses(inps, preds)

    cfg = ModelConfig(proc_side=256, stride_train=32, stride_test=32,
                      depth=8, n_joints=n3d, dtype='float32')
    tcfg = TrainConfig()
    got = our_metro.compute_metro_losses(
        jnp.asarray(pred3d), jnp.asarray(pred3d_2dbatch),
        dict(coords3d_true=jnp.asarray(true3d),
             joint_validity_mask=jnp.asarray(mask3d)),
        dict(coords2d_true=jnp.asarray(true2d_2d),
             joint_validity_mask=jnp.asarray(mask2d)),
        groups, cfg=cfg, tcfg=tcfg)
    for key in ('loss3d', 'loss2d', 'loss'):
        np.testing.assert_allclose(
            _np(got[key]), _np(want[key]), rtol=2e-4, atol=1e-6, err_msg=key)


def test_model25d_losses_match(ref, rng):
    from attrdict import AttrDict
    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.models import model25d as our_25d
    from metrabs_tpu.train import losses as our_losses
    from metrabs_tpu.utils.joint_info import JointInfo

    o = _reference_oracle.load_reference_models()
    T = o.models_twofive.Model25DTrainer
    trainer = T.__new__(T)

    names3d = ['nose', 'neck', 'lsho', 'lsho_smpl', 'rsho', 'rsho_smpl']
    names2d = ['nose', 'neck', 'lsho', 'rsho']
    batch, n3d, n2d = 4, len(names3d), len(names2d)
    box = 2200.0
    true3d = (rng.normal(size=(batch, n3d, 3)) * 300).astype(np.float32)
    true2d = rng.uniform(10, 246, size=(batch, n3d, 2)).astype(np.float32)
    pred25d = np.concatenate([
        rng.uniform(10, 246, size=(batch, n3d, 2)),
        rng.uniform(0.3 * box, 0.7 * box, size=(batch, n3d, 1))],
        axis=-1).astype(np.float32)
    pred25d_2dbatch = np.concatenate([
        rng.uniform(10, 246, size=(batch, n3d, 2)),
        rng.uniform(0.3 * box, 0.7 * box, size=(batch, n3d, 1))],
        axis=-1).astype(np.float32)
    mask3d = rng.uniform(size=(batch, n3d)) > 0.2
    mask3d[:, :2] = True
    true2d_2d = rng.uniform(10, 246, size=(batch, n2d, 2)).astype(np.float32)
    mask2d = rng.uniform(size=(batch, n2d)) > 0.2
    mask2d[:, :2] = True

    our_ji3d = JointInfo(names=tuple(names3d), edges=())
    our_ji2d = JointInfo(names=tuple(names2d), edges=())
    groups = our_losses.get_2d_joint_index_groups(our_ji3d, our_ji2d)
    pred2d_grouped = _group_mean_2d(pred25d_2dbatch, groups).astype(np.float32)

    inps = AttrDict(
        coords2d_true=tf.constant(true2d),
        coords3d_true=tf.constant(true3d),
        joint_validity_mask=tf.constant(mask3d),
        coords2d_true_2d=tf.constant(true2d_2d),
        joint_validity_mask_2d=tf.constant(mask2d))
    preds = AttrDict(
        coords2d_pred=tf.constant(pred25d[..., :2]),
        coords25d_pred=tf.constant(pred25d),
        coords2d_pred_2d=tf.constant(pred2d_grouped))
    ref.flags.box_size_mm = box
    want = trainer.compute_losses(inps, preds)

    cfg = ModelConfig(proc_side=256, stride_train=32, stride_test=32,
                      depth=8, n_joints=n3d, dtype='float32',
                      box_size_mm=box)
    got = our_25d.compute_model25d_losses(
        jnp.asarray(pred25d), jnp.asarray(pred25d_2dbatch),
        dict(coords3d_true=jnp.asarray(true3d),
             coords2d_true=jnp.asarray(true2d),
             joint_validity_mask=jnp.asarray(mask3d)),
        dict(coords2d_true=jnp.asarray(true2d_2d),
             joint_validity_mask=jnp.asarray(mask2d)),
        groups, cfg=cfg, tcfg=TrainConfig())
    for key in ('loss23d', 'loss_z', 'loss2d', 'loss3d', 'loss'):
        np.testing.assert_allclose(
            _np(got[key]), _np(want[key]), rtol=2e-4, atol=1e-6, err_msg=key)


# ---------------------------------------------------------------------------
# eval_metrics.py


def test_compute_pose3d_metrics_matches(ref, rng):
    batch, n_joints = 6, 17
    names = [f'j{i}' for i in range(n_joints)]
    names[5], names[11] = 'lwri', 'rwri'
    _reference_oracle.JOINT_INFO[0] = types.SimpleNamespace(
        ids={n: i for i, n in enumerate(names)})

    true3d = (rng.normal(size=(batch, n_joints, 3)) * 350).astype(np.float32)
    true3d[..., 2] += 3000
    pred3d = true3d + rng.normal(size=true3d.shape).astype(np.float32) * 60
    true2d = (rng.uniform(0, 256, size=(batch, n_joints, 2))).astype(np.float32)
    pred2d = true2d + rng.normal(size=true2d.shape).astype(np.float32) * 5
    validity = rng.uniform(size=(batch, n_joints)) > 0.15
    validity[:, :5] = True

    from attrdict import AttrDict  # the oracle harness's stub
    inps = AttrDict(coords3d_true=tf.constant(true3d),
                    coords2d_true=tf.constant(true2d),
                    joint_validity_mask=tf.constant(validity))
    preds = AttrDict(coords3d_pred_abs=tf.constant(pred3d),
                     coords2d_pred=tf.constant(pred2d))
    want = ref.eval_metrics.compute_pose3d_metrics(inps, preds)

    ji = JointInfo(names=tuple(names), edges=tuple(_TEST_EDGES))
    got = our_metrics.compute_pose3d_metrics(
        jnp.asarray(pred3d), jnp.asarray(true3d), jnp.asarray(validity),
        coords3d_pred_is_abs=True, coords2d_true=jnp.asarray(true2d),
        coords2d_pred=jnp.asarray(pred2d), joint_info=ji, mean_relative=True)

    for key in ('mean_error', 'mean_error_abs', 'mean_error_2d',
                'mean_error_procrustes', 'mean_auc', 'mean_pck',
                'pck_wrists', 'auc_wrists', 'ncps_auc', 'ncps'):
        np.testing.assert_allclose(
            _np(got[key]), _np(want[key]), atol=2e-3, err_msg=key)
