"""Pose plausibility filtering and 3D-pose non-maximum suppression.

Masked fixed-shape re-design of `metrabs_tf/multiperson/plausibility_check.py`.
Where the reference gathers plausible indices into ragged tensors and calls
the C++ `tf.image.non_max_suppression_overlaps`, everything here operates on
padded [n_poses] batches with validity masks and a fori_loop greedy NMS —
static shapes throughout, so the whole filter fuses into the estimation graph
with no recompilation as detection counts vary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.ops.nms import greedy_nms


def is_pose_plausible(
        poses: jnp.ndarray, joint2bone_mat: jnp.ndarray,
        mean_bones: jnp.ndarray) -> jnp.ndarray:
    """Bone-length sanity check (`plausibility_check.py:9-28`).

    A pose is implausible if any bone is simultaneously way off relative
    (<0.1x or >3x the dataset mean) AND absolutely (>300mm difference).
    poses: [..., J, 3]; joint2bone_mat: [n_bones, J_model]; mean_bones:
    [n_bones]. When a joint_transform_matrix extended the pose beyond the
    model joints, only the first J_model joints feed the bone check — the
    reference's `poses[..., :joint_info.n_joints, :]` slice
    (`plausibility_check.py:18`).
    """
    n_joints_bones = joint2bone_mat.shape[-1]
    bones = jnp.einsum('bj,...jc->...bc', joint2bone_mat,
                       poses[..., :n_joints_bones, :], precision='highest')
    bone_lengths = jnp.linalg.norm(bones, axis=-1)
    relative = bone_lengths / mean_bones
    absdiff = jnp.abs(bone_lengths - mean_bones)
    relsmall = relative < 0.1
    relbig = relative > 3.0
    absdiffbig = absdiff > 300.0
    implausible = jnp.any(jnp.logical_and(jnp.logical_or(relbig, relsmall), absdiffbig),
                          axis=-1)
    return jnp.logical_not(implausible)


def scale_align(poses: jnp.ndarray) -> jnp.ndarray:
    """Rescales each pose to the group's mean RMS scale
    (`plausibility_check.py:87-90`); poses: [..., n_items, J, 3]."""
    square_scales = jnp.mean(jnp.square(poses), axis=(-2, -1), keepdims=True)
    mean_square = jnp.mean(square_scales, axis=-3, keepdims=True)
    return poses * jnp.sqrt(mean_square / square_scales)


def point_stdev(poses: jnp.ndarray, item_axis: int, coord_axis: int) -> jnp.ndarray:
    """Mean-over-items stdev per point (`plausibility_check.py:93-96`)."""
    mean = jnp.mean(poses, axis=item_axis, keepdims=True)
    var = jnp.mean(jnp.square(poses - mean), axis=item_axis, keepdims=True)
    avg_stdev = jnp.sqrt(jnp.sum(var, axis=coord_axis, keepdims=True))
    return jnp.squeeze(avg_stdev, (item_axis, coord_axis))


def are_augmentation_results_consistent(poses3d: jnp.ndarray) -> jnp.ndarray:
    """At least a quarter of joints have TTA stdev < 200mm
    (`plausibility_check.py:42-46`). poses3d: [n_poses, num_aug, J, 3]."""
    n_joints = poses3d.shape[-2]
    stdevs = point_stdev(scale_align(poses3d), item_axis=-3, coord_axis=-1)
    return jnp.sum((stdevs < 200).astype(jnp.int32), axis=-1) > (n_joints // 4)


def is_pose_consistent_with_box(pose2d: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Intersection(pose bbox, detection box) > half the detection box area
    (`plausibility_check.py:66-84`). pose2d: [..., J, 2]; box: [..., 4+]."""
    posebox_start = jnp.min(pose2d, axis=-2)
    posebox_end = jnp.max(pose2d, axis=-2)
    box_start = box[..., :2]
    box_end = box[..., :2] + box[..., 2:4]
    box_area = jnp.prod(box[..., 2:4], axis=-1)
    inter_start = jnp.maximum(box_start, posebox_start)
    inter_end = jnp.minimum(box_end, posebox_end)
    inter_area = jnp.prod(jax.nn.relu(inter_end - inter_start), axis=-1)
    return inter_area > 0.5 * box_area


def compute_pose_similarity(poses: jnp.ndarray) -> jnp.ndarray:
    """Pairwise scale-aligned pose similarity in [0, 1]
    (`plausibility_check.py:49-63`): mean over the FARTHEST quarter of joints
    of relu(1 - dist/300mm) — two poses only count as duplicates when even
    their most-different joints are close. poses: [n, J, 3] -> [n, n]."""
    n_joints = poses.shape[-2]
    square_scales = jnp.mean(jnp.square(poses), axis=(-2, -1), keepdims=True)  # [n,1,1]
    s1 = square_scales[jnp.newaxis, :]   # [1, n, 1, 1]
    s2 = square_scales[:, jnp.newaxis]   # [n, 1, 1, 1]
    mean_sq = (s1 + s2) / 2
    f1 = jnp.sqrt(mean_sq / s1)
    f2 = jnp.sqrt(mean_sq / s2)
    p1 = poses[jnp.newaxis, :]
    p2 = poses[:, jnp.newaxis]
    dists = jnp.linalg.norm(f1 * p1 - f2 * p2, axis=-1)  # [n, n, J]
    k = max(n_joints // 4, 1)
    worst, _ = jax.lax.top_k(dists, k)  # farthest quarter
    return jnp.mean(jax.nn.relu(1 - worst / 300.0), axis=-1)


def pose_non_max_suppression(
        poses: jnp.ndarray, scores: jnp.ndarray, is_pose_valid: jnp.ndarray,
        overlap_threshold: float = 0.4, max_output: int = 150) -> jnp.ndarray:
    """Greedy similarity NMS returning a keep mask (`plausibility_check.py:31-39`).

    Fixed-shape equivalent of tf.image.non_max_suppression_overlaps: visit
    candidates in score order; keep a candidate if still unsuppressed, then
    suppress everything with similarity > threshold to it. Invalid poses are
    never kept and never suppress others.
    """
    similarity = compute_pose_similarity(poses)
    return greedy_nms(similarity, scores, is_pose_valid,
                      overlap_threshold, max_output)


def suppress_implausible_poses(
        poses3d: jnp.ndarray, poses2d: jnp.ndarray, boxes: jnp.ndarray,
        box_valid: jnp.ndarray, joint2bone_mat: jnp.ndarray,
        mean_bones: jnp.ndarray, overlap_threshold: float = 0.4,
        max_output: int = 150) -> jnp.ndarray:
    """Full filter of `multiperson_model.py:441-459` on one image's padded
    pose set. poses3d: [n, num_aug, J, 3]; poses2d: [n, num_aug, J, 2];
    boxes: [n, 5]. Returns the final keep mask [n]."""
    poses3d_mean = jnp.mean(poses3d, axis=-3)
    poses2d_mean = jnp.mean(poses2d, axis=-3)
    plausible = jnp.logical_and(
        jnp.logical_and(
            is_pose_plausible(poses3d_mean, joint2bone_mat, mean_bones),
            are_augmentation_results_consistent(poses3d)),
        is_pose_consistent_with_box(poses2d_mean, boxes))
    plausible = jnp.logical_and(plausible, box_valid)
    return pose_non_max_suppression(
        poses3d_mean, boxes[..., 4], plausible, overlap_threshold, max_output)


class BoneLengthStats:
    """Streaming dataset mean-bone-length accumulator (host-side numpy).

    The reference freezes dataset-measured mean bone lengths into the
    SavedModel from a trainval pickle (`plausibility_check.py:12-16`,
    FLAGS.bone_length_file); here the training driver accumulates them from
    the ground-truth 3D batches it already streams, so every exported
    package ships honestly-derived priors instead of invented constants.
    A bone sample counts only when BOTH endpoint joints are valid; the
    final mean uses divide-no-nan semantics (edges never observed report
    NaN and the consumer falls back loudly).
    """

    def __init__(self, edges):
        self.edges = tuple((int(i), int(j)) for i, j in edges)
        self._sum = np.zeros(len(self.edges), np.float64)
        self._count = np.zeros(len(self.edges), np.int64)

    def update(self, coords3d_mm: np.ndarray, validity: np.ndarray) -> None:
        """coords3d_mm: [B, J, 3] ground-truth camera-space mm;
        validity: [B, J] bool."""
        c = np.asarray(coords3d_mm, np.float64)
        v = np.asarray(validity, bool)
        for b, (i, j) in enumerate(self.edges):
            ok = v[:, i] & v[:, j]
            if not ok.any():
                continue
            d = np.linalg.norm(c[ok, i] - c[ok, j], axis=-1)
            ok_finite = np.isfinite(d)
            self._sum[b] += d[ok_finite].sum()
            self._count[b] += int(ok_finite.sum())

    @property
    def n_samples(self) -> int:
        return int(self._count.min()) if len(self.edges) else 0

    def mean_lengths(self) -> np.ndarray:
        """Per-edge mean bone length in mm; NaN for never-observed edges
        (divide-no-nan would hide the missing prior as a 0mm bone, which
        the plausibility ratio check would then always fail)."""
        with np.errstate(invalid='ignore'):
            out = self._sum / np.maximum(self._count, 1)
        return np.where(self._count > 0, out, np.nan).astype(np.float32)


def compute_bone_mean_lengths(coords3d_mm, validity, edges) -> np.ndarray:
    """One-shot wrapper over BoneLengthStats for in-memory datasets."""
    stats = BoneLengthStats(edges)
    stats.update(coords3d_mm, validity)
    return stats.mean_lengths()
