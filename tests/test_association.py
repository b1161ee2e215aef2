import numpy as np

from metrabs_tpu.eval.association import associate_predictions, associate_sequence
from metrabs_tpu.pipeline.skeletons import COCO_19, H36M_17


def make_pose2d(rng, center):
    return (rng.normal(size=(17, 2)) * 30 + center).astype(np.float32)


def test_association_matches_closest(rng):
    # Two annotated tracks far apart; predictions arrive in swapped order.
    pose_a = make_pose2d(rng, [100, 100])
    pose_b = make_pose2d(rng, [500, 400])
    poses2d_pred = np.stack([pose_b, pose_a])
    poses3d_pred = np.stack([
        np.full((17, 3), 2.0, np.float32), np.full((17, 3), 1.0, np.float32)])

    def annotate(p):  # 2D GT with confidence, COCO-like joint count
        out = np.zeros((19, 3), np.float32)
        # put the 8 association joints at matching positions via name mapping
        for name in ('lsho', 'rsho', 'lelb', 'relb', 'lhip', 'rhip', 'lkne', 'rkne'):
            out[COCO_19.ids[name], :2] = p[H36M_17.ids[name]]
            out[COCO_19.ids[name], 2] = 0.9
        return out

    poses2d_true = np.stack([annotate(pose_a), annotate(pose_b)])
    prev = np.zeros((2, 17, 2), np.float32)
    result, prev2 = associate_predictions(
        poses3d_pred, poses2d_pred, poses2d_true, prev, H36M_17, COCO_19)
    # Track 0 (pose_a) must get prediction 1, track 1 gets prediction 0.
    np.testing.assert_allclose(result[0], 1.0)
    np.testing.assert_allclose(result[1], 2.0)
    np.testing.assert_allclose(prev2[0], pose_a)


def test_association_temporal_fallback(rng):
    # Annotations all low-confidence: falls back to previous-frame proximity.
    pose_a = make_pose2d(rng, [100, 100])
    pose_b = make_pose2d(rng, [500, 400])
    poses2d_pred = np.stack([pose_a, pose_b])
    poses3d_pred = np.stack([
        np.full((17, 3), 1.0, np.float32), np.full((17, 3), 2.0, np.float32)])
    poses2d_true = np.zeros((2, 19, 3), np.float32)  # confidence 0 everywhere
    prev = np.stack([pose_b, pose_a])  # tracks previously at swapped spots
    result, _ = associate_predictions(
        poses3d_pred, poses2d_pred, poses2d_true, prev, H36M_17, COCO_19)
    np.testing.assert_allclose(result[0], 2.0)  # track 0 follows pose_b
    np.testing.assert_allclose(result[1], 1.0)


def test_associate_sequence_handles_empty_frames(rng):
    pose_a = make_pose2d(rng, [100, 100])
    frames_p3 = [np.zeros((0, 17, 3), np.float32),
                 np.full((1, 17, 3), 5.0, np.float32)]
    frames_p2 = [np.zeros((0, 17, 2), np.float32), pose_a[None]]
    ann = np.zeros((1, 19, 3), np.float32)
    for name in ('lsho', 'rsho', 'lelb', 'relb', 'lhip', 'rhip', 'lkne', 'rkne'):
        ann[0, COCO_19.ids[name], :2] = pose_a[H36M_17.ids[name]]
        ann[0, COCO_19.ids[name], 2] = 0.9
    out = associate_sequence(
        frames_p3, frames_p2, [ann, ann], H36M_17, COCO_19)
    assert out.shape == (2, 1, 17, 3)
    assert np.all(np.isnan(out[0]))
    np.testing.assert_allclose(out[1, 0], 5.0)
