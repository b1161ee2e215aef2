"""Integration tests of the fused multi-person pipeline with a tiny backbone.

The reference has no tests at all (SURVEY.md §4); these check the pipeline
invariants that don't require trained weights: shape/dtype contracts, masking
semantics, internal-batch chunking equivalence, TTA axis handling, skeleton
selection and the num_aug=1 midpoint quirk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.config import AugConfig, ModelConfig
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.pipeline import tta
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import H36M_17, SkeletonRegistry

CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')


@pytest.fixture(scope='module')
def estimator():
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.eye(3)[jnp.newaxis])

    def crop_model_fn(crops, intrinsics, sample_valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    return PoseEstimator(crop_model_fn, H36M_17, CFG)


@pytest.fixture(scope='module')
def test_data():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    boxes = np.array([
        [[10, 10, 50, 70], [60, 5, 40, 80], [0, 0, 0, 0]],
        [[20, 20, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32)
    box_valid = np.array([[True, True, False], [True, False, False]])
    return images, boxes, box_valid


def test_output_shapes_averaged(estimator, test_data):
    images, boxes, box_valid = test_data
    out = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=2, average_aug=True)
    assert out['poses3d'].shape == (2, 3, 17, 3)
    assert out['poses2d'].shape == (2, 3, 17, 2)
    assert out['boxes'].shape == (2, 3, 5)
    assert out['valid'].shape == (2, 3)
    p3 = np.asarray(out['poses3d'])
    valid = np.asarray(out['valid'])
    assert np.all(np.isfinite(p3[valid]))


def test_output_shapes_unaveraged(estimator, test_data):
    images, boxes, box_valid = test_data
    out = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=3, average_aug=False)
    assert out['poses3d'].shape == (2, 3, 3, 17, 3)
    assert out['poses2d'].shape == (2, 3, 3, 17, 2)


def test_chunking_equivalence(estimator, test_data):
    """internal_batch_size must not change results beyond float-level noise
    (`multiperson_model.py:241-290` chunking is a memory knob). Exact
    equality is not expected: the absolute-reconstruction RMS normalization
    pools over the chunk batch — in the reference too (`tfu3d.py:180-183`,
    pooled over the ragged internal batch) — so regrouping shifts results
    at the ~1e-3 relative level."""
    images, boxes, box_valid = test_data
    out_big = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=2, internal_batch_size=64)
    out_small = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=2, internal_batch_size=2)
    # Only VALID slots carry defined results: padding slots may hold either
    # masked garbage (computed chunk) or the skip placeholder (all-invalid
    # chunk skipped at runtime).
    np.testing.assert_allclose(
        np.asarray(out_big['poses3d'])[box_valid],
        np.asarray(out_small['poses3d'])[box_valid],
        rtol=2e-3, atol=1.0)


def test_invalid_boxes_do_not_affect_valid(estimator, test_data):
    """Padding boxes must not change valid results (mask discipline)."""
    images, boxes, box_valid = test_data
    out1 = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1)
    boxes_alt = boxes.copy()
    boxes_alt[0, 2] = [999, 999, 5, 5]  # garbage in an invalid slot
    boxes_alt[1, 1] = [-50, -50, 1, 1]
    out2 = estimator.estimate_poses_batched(
        images, boxes_alt, box_valid, num_aug=1)
    p1, p2 = np.asarray(out1['poses3d']), np.asarray(out2['poses3d'])
    valid = np.asarray(out1['valid'])
    np.testing.assert_allclose(p1[valid], p2[valid], rtol=1e-5, atol=1e-3)


def test_skeleton_selection(estimator, test_data):
    images, boxes, box_valid = test_data
    out_full = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1, skeleton='')
    out_h36m = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1, skeleton='h36m_17')
    # Model joints ARE h36m_17 here, so selection is identity.
    np.testing.assert_allclose(
        np.asarray(out_full['poses3d']), np.asarray(out_h36m['poses3d']), atol=1e-6)
    assert estimator.per_skeleton_joint_names['h36m_17'][0] == 'pelv'
    # The reference docs name the edge attribute `per_skeleton_edges`
    # (docs/API.md "Attributes"); both spellings must resolve.
    assert estimator.per_skeleton_edges == estimator.per_skeleton_joint_edges


def test_antialias_factor(estimator, test_data):
    """antialias_factor=2 supersamples the crop 2x then average-pools back
    (`multiperson_model.py` antialias_factor semantics). The pose output
    must keep its shape/finiteness, and on natural images stay close to the
    factor-1 result (the crop changes only at aliasing-level detail)."""
    images, boxes, box_valid = test_data
    out1 = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1, antialias_factor=1)
    out2 = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1, antialias_factor=2)
    p1, p2 = np.asarray(out1['poses3d']), np.asarray(out2['poses3d'])
    assert p2.shape == p1.shape
    assert np.all(np.isfinite(p2[box_valid]))
    # Same model, same geometry: only the resample detail differs. With a
    # random tiny net the mapping crop->pose is chaotic in absolute terms,
    # so compare on a generous tolerance relative to the pose scale.
    scale = np.abs(p1[box_valid]).mean()
    assert np.abs(p1[box_valid] - p2[box_valid]).mean() < 0.5 * scale


def test_single_image_wrapper_compacts(estimator, test_data):
    images, boxes, box_valid = test_data
    out = estimator.estimate_poses(images[0], boxes[0][:2], num_aug=1)
    assert out['poses3d'].shape == (2, 17, 3)
    assert out['poses2d'].shape == (2, 17, 2)


def test_world_space_output(estimator, test_data):
    """A camera 2m up looking the same way shifts world poses by +2000mm in y
    (with y-down camera convention and default up)."""
    images, boxes, box_valid = test_data
    extr = np.eye(4, dtype=np.float32)
    extr[1, 3] = -2000.0  # world point (0, 2000, 0) -> camera origin
    out_cam = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1)
    out_world = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1,
        extrinsic_matrix=np.tile(extr[None], (2, 1, 1)))
    p_cam = np.asarray(out_cam['poses3d'])
    p_world = np.asarray(out_world['poses3d'])
    valid = np.asarray(out_cam['valid'])
    np.testing.assert_allclose(
        p_world[valid][..., 1], p_cam[valid][..., 1] + 2000.0, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(
        p_world[valid][..., 0], p_cam[valid][..., 0], rtol=1e-4, atol=1e-2)


def test_num_aug_one_midpoint_quirk():
    """num_aug=1 uses the midpoints: gamma 0.8, angle 0, scale 1.05, no flip
    (SURVEY.md §8.2)."""
    params = tta.make_tta_params(1, AugConfig())
    np.testing.assert_allclose(params.gammas, [0.8], atol=1e-6)
    np.testing.assert_allclose(params.angles, [0.0], atol=1e-6)
    np.testing.assert_allclose(params.scales, [1.05], atol=1e-6)
    assert not params.should_flip[0]


def test_tta_five_aug_schedule():
    params = tta.make_tta_params(5, AugConfig(rot_aug_degrees=25))
    np.testing.assert_allclose(params.gammas, np.linspace(0.6, 1.0, 5), atol=1e-6)
    np.testing.assert_allclose(
        params.angles, np.deg2rad(np.linspace(-25, 25, 5)), atol=1e-6)
    # scales: [0.8, 0.9] (endpoint=False) + [1.0, 1.05, 1.1]
    np.testing.assert_allclose(params.scales, [0.8, 0.9, 1.0, 1.05, 1.1], atol=1e-6)
    # flips alternate: (i - 2) % 2 != 0 -> [False, True, False, True, False]
    # (the center aug is unflipped, `multiperson_model.py:164`)
    np.testing.assert_array_equal(
        params.should_flip, [False, True, False, True, False])


def test_tiled_warp_backend_matches_gather(estimator, test_data):
    """The Pallas tiled-warp pipeline (interpret mode on CPU) must reproduce
    the gather-backend pipeline end to end."""
    images, boxes, box_valid = test_data
    cfg_tiled = ModelConfig(
        proc_side=64, stride_train=32, stride_test=32, depth=4, n_joints=17,
        dtype='float32', warp_backend='tiled-interpret')
    model = Metrabs(cfg=cfg_tiled,
                    backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.eye(3)[jnp.newaxis])

    def crop_model_fn(crops, intrinsics, sample_valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    est_tiled = PoseEstimator(crop_model_fn, H36M_17, cfg_tiled)
    out_t = est_tiled.estimate_poses_batched(
        images, boxes, box_valid, num_aug=2, average_aug=True)
    out_g = estimator.estimate_poses_batched(
        images, boxes, box_valid, num_aug=2, average_aug=True)
    valid = np.asarray(out_g['valid'])
    p_t = np.asarray(out_t['poses3d'])[valid]
    p_g = np.asarray(out_g['poses3d'])[valid]
    np.testing.assert_allclose(p_t, p_g, atol=0.5)  # mm-scale agreement
    p2_t = np.asarray(out_t['poses2d'])[valid]
    p2_g = np.asarray(out_g['poses2d'])[valid]
    np.testing.assert_allclose(p2_t, p2_g, atol=0.05)


def test_padding_chunks_are_skipped_cheaply(estimator, test_data):
    """With valid-first compaction, an almost-empty box set produces valid
    results identical to a dense computation of the same boxes (the skip
    branch must never run for a chunk containing any valid box)."""
    images, boxes, box_valid = test_data
    sparse_valid = np.zeros_like(box_valid)
    sparse_valid[0, 1] = True  # a single valid box in a non-first slot
    out = estimator.estimate_poses_batched(
        images, boxes, sparse_valid, num_aug=2, internal_batch_size=2)
    p = np.asarray(out['poses3d'])
    assert np.all(np.isfinite(p[sparse_valid]))
    # Same single box alone must give the same pose (chunk = exactly it).
    out_single = estimator.estimate_poses_batched(
        images[:1], boxes[:1, 1:2], sparse_valid[:1, 1:2],
        num_aug=2, internal_batch_size=2)
    np.testing.assert_allclose(
        p[0, 1], np.asarray(out_single['poses3d'])[0, 0], rtol=1e-4, atol=0.1)


def test_estimate_poses_stream_matches_batched(estimator, rng):
    """estimate_poses_stream (one-dispatch lax.map over K batches) must
    match K independent estimate_poses_batched calls."""
    images_k = rng.integers(0, 255, size=(2, 2, 100, 120, 3), dtype=np.uint8)
    boxes_k = np.asarray(
        [[[[10, 10, 60, 80], [30, 5, 50, 90]]] * 2] * 2, np.float32)
    out_s = estimator.estimate_poses_stream(images_k, boxes_k, num_aug=2)
    assert np.asarray(out_s['poses3d']).shape == (2, 2, 2, 17, 3)
    for k in range(2):
        out_b = estimator.estimate_poses_batched(
            images_k[k], boxes_k[k], num_aug=2)
        np.testing.assert_allclose(
            np.asarray(out_s['poses3d'])[k], np.asarray(out_b['poses3d']),
            rtol=1e-4, atol=0.5)


def test_partially_padded_tail_chunk_stays_finite(estimator):
    """Valid boxes sharing a chunk with zero-pad entries must stay finite:
    pad entries have singular warp homographies whose NaN crops used to
    poison the chunk-pooled RMS scale inside reconstruct_ref_fullpersp
    (NaN * 0 = NaN), silently NaN-ing REAL detections in the tail chunk.
    Repro: 6 valid boxes, num_aug=2, internal_batch_size=8 -> 4 boxes per
    chunk, last chunk = 2 valid + 2 pad."""
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, size=(1, 96, 128, 3), dtype=np.uint8)
    boxes = np.array([[[10, 10, 40, 70], [30, 5, 50, 80], [60, 20, 40, 60],
                       [5, 15, 30, 70], [40, 10, 45, 75], [70, 8, 35, 65]]],
                     np.float32)
    out_chunked = estimator.estimate_poses_batched(
        images, boxes, num_aug=2, internal_batch_size=8)
    out_whole = estimator.estimate_poses_batched(
        images, boxes, num_aug=2, internal_batch_size=64)
    p_chunked = np.asarray(out_chunked['poses3d'])
    assert np.all(np.isfinite(p_chunked)), 'tail-chunk poses went non-finite'
    np.testing.assert_allclose(
        p_chunked, np.asarray(out_whole['poses3d']), rtol=2e-3, atol=1.0)


def test_masking_fuzz_random_validity_patterns(estimator):
    """Randomized sweep of box/validity patterns under ONE static config
    (shapes fixed -> one compiled program): valid-slot results must be
    finite and independent of garbage in invalid slots, chunked or not."""
    rng = np.random.default_rng(11)
    images = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    for trial in range(4):
        boxes = np.stack([
            np.stack([np.array([
                rng.uniform(0, 100), rng.uniform(0, 60),
                rng.uniform(10, 60), rng.uniform(20, 70)], np.float32)
                for _ in range(5)])
            for _ in range(2)])
        valid = rng.random((2, 5)) < 0.6
        valid[0, 0] = True  # at least one valid box
        out = estimator.estimate_poses_batched(
            images, boxes, valid, num_aug=2, internal_batch_size=6)
        p = np.asarray(out['poses3d'])
        assert np.all(np.isfinite(p[valid])), f'trial {trial} non-finite'
        # garbage in invalid slots must not change valid results
        boxes_alt = boxes.copy()
        boxes_alt[~valid] = [[-1e6, 1e6, 0, 0]][0]
        out_alt = estimator.estimate_poses_batched(
            images, boxes_alt, valid, num_aug=2, internal_batch_size=6)
        np.testing.assert_allclose(
            p[valid], np.asarray(out_alt['poses3d'])[valid],
            rtol=1e-4, atol=0.5, err_msg=f'trial {trial}')
