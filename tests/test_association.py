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


# --- mask-IoU association (`predict_tdpw.py:194-206,238-250`) ---

from metrabs_tpu.eval.association import (
    associate_predictions_to_masks, decode_rle, mask_iou, pose_to_mask)


def _encode_rle_counts(counts):
    """COCO rleToString (test-side inverse of the library decoder)."""
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def _mask_to_counts(mask):
    """Column-major run lengths starting with zeros."""
    flat = np.asarray(mask, np.uint8).flatten(order='F')
    counts, val, run = [], 0, 0
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(run)
            val, run = v, 1
    counts.append(run)
    return counts


def test_decode_rle_uncompressed_and_compressed(rng):
    mask = (rng.uniform(size=(13, 7)) > 0.6).astype(np.uint8)
    counts = _mask_to_counts(mask)
    rle_plain = {'size': list(mask.shape), 'counts': counts}
    np.testing.assert_array_equal(decode_rle(rle_plain), mask)
    rle_comp = {'size': list(mask.shape),
                'counts': _encode_rle_counts(counts)}
    np.testing.assert_array_equal(decode_rle(rle_comp), mask)
    # Dense passthrough.
    np.testing.assert_array_equal(decode_rle(mask), mask)


def test_mask_iou_basic():
    a = np.zeros((4, 4), np.uint8)
    b = np.zeros((4, 4), np.uint8)
    a[:2] = 1
    b[1:3] = 1
    assert mask_iou(a, b) == 4 / 12
    assert mask_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0


def test_pose_to_mask_draws_edges(rng):
    from metrabs_tpu.pipeline.skeletons import H36M_17
    pose = make_pose2d(rng, [50, 50])
    m = pose_to_mask(pose, (100, 100), H36M_17, thickness=3)
    assert m.shape == (100, 100)
    assert m.dtype == np.uint8
    assert m.sum() > 0
    # Confidence gating: all-zero confidence draws nothing.
    pose3 = np.concatenate([pose, np.zeros((17, 1), np.float32)], axis=1)
    assert pose_to_mask(pose3, (100, 100), H36M_17, thickness=3).sum() == 0


def test_pose_to_mask_fills_torso():
    # The torso quad (lhip/rhip/rsho/lsho, `predict_tdpw.py:252-255`) must be
    # FILLED, not just outlined: probe an interior pixel no stick edge
    # crosses. All non-torso joints sit far away so their edges draw there.
    from metrabs_tpu.pipeline.skeletons import H36M_17
    ids = H36M_17.ids
    pose = np.full((17, 2), 220.0, np.float32)
    pose[ids['lhip']] = [20, 80]
    pose[ids['rhip']] = [60, 80]
    pose[ids['rsho']] = [60, 20]
    pose[ids['lsho']] = [20, 20]
    m = pose_to_mask(pose, (256, 256), H36M_17, thickness=1)
    assert m[50, 30] == 1  # interior, off every drawn edge
    # One low-confidence torso corner suppresses the fill.
    conf = np.ones((17, 1), np.float32)
    conf[ids['lhip']] = 0.0
    m2 = pose_to_mask(np.concatenate([pose, conf], 1), (256, 256), H36M_17,
                      thickness=1)
    assert m2[50, 30] == 0


def test_associate_predictions_to_masks_unshuffles(rng):
    from metrabs_tpu.pipeline.skeletons import H36M_17
    pose_a = make_pose2d(rng, [60, 60])
    pose_b = make_pose2d(rng, [200, 180])
    # Annotated masks in order (a, b), rasterized from the true poses.
    masks = [pose_to_mask(p, (256, 256), H36M_17, thickness=10)
             for p in (pose_a, pose_b)]
    # Predictions arrive swapped, at frame resolution 2x the mask resolution.
    poses2d_pred = np.stack([pose_b, pose_a]) * 2.0
    poses3d_pred = np.stack([
        np.full((17, 3), 2.0, np.float32), np.full((17, 3), 1.0, np.float32)])
    result = associate_predictions_to_masks(
        poses3d_pred, poses2d_pred, (512, 512), masks, H36M_17)
    np.testing.assert_allclose(result[0], 1.0)
    np.testing.assert_allclose(result[1], 2.0)
