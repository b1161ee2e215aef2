import numpy as np
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
