"""Mask/RLE/video utility tests (`metrabs_tf/improc.py:27-349` parity)."""

import numpy as np
import pytest

import cv2

from metrabs_tpu.data import improc, masks
from metrabs_tpu.utils import rlemask


# ---------------------------------------------------------------------------
# RLE codec


def _random_mask(rng, h, w, p=0.3):
    return (rng.random((h, w)) < p).astype(np.uint8)


def test_rle_roundtrip_random():
    rng = np.random.default_rng(0)
    for h, w in [(1, 1), (7, 5), (64, 48), (31, 97)]:
        m = _random_mask(rng, h, w)
        rle = rlemask.encode(m)
        assert isinstance(rle['counts'], bytes)
        np.testing.assert_array_equal(rlemask.decode(rle), m)
        assert rlemask.area(rle) == int(m.sum())


def test_rle_roundtrip_edge_masks():
    for m in [np.zeros((5, 4), np.uint8), np.ones((5, 4), np.uint8),
              np.eye(6, dtype=np.uint8)]:
        np.testing.assert_array_equal(rlemask.decode(rlemask.encode(m)), m)


def test_rle_golden_counts():
    """Hand-computed wire format: a 2x2 mask with only the top-right pixel
    set flattens column-major to [0, 0, 1, 0] -> runs [2, 1, 1], all below
    the delta-coding start, each a single 5-bit group (+48)."""
    m = np.array([[0, 1], [0, 0]], np.uint8)
    rle = rlemask.encode(m)
    assert rle['size'] == [2, 2]
    assert rle['counts'] == bytes([2 + 48, 1 + 48, 1 + 48])
    np.testing.assert_array_equal(rlemask.decode(rle), m)


def test_rle_long_run_multigroup():
    """A run of 1000 needs two 5-bit groups with the continuation bit; the
    decoder (validated against real COCO data in the association tests) must
    invert the encoder exactly."""
    m = np.zeros((40, 50), np.uint8)
    m.T.reshape(-1)[1000:2000] = 1  # column-major run positions
    np.testing.assert_array_equal(rlemask.decode(rlemask.encode(m)), m)


def test_rle_uncompressed_counts_list():
    rle = {'size': [3, 2], 'counts': [2, 3, 1]}
    expect = np.array([[0, 1], [0, 1], [1, 0]], np.uint8).T
    # column-major: first 2 zeros, then 3 ones, then 1 zero over 3x2
    flat = np.array([0, 0, 1, 1, 1, 0], np.uint8)
    np.testing.assert_array_equal(rlemask.decode(rle),
                                  flat.reshape((2, 3)).T)
    del expect


def test_rle_delta_coding_from_fourth_run():
    """Counts beyond index 2 are delta-coded against counts[-2]; a mask with
    >=5 runs exercises that branch in both directions."""
    m = np.zeros((1, 9), np.uint8)
    m[0, [1, 2, 5, 8]] = 1  # runs: 1,2,2,1,2,1 (column-major == row here)
    rle = rlemask.encode(m)
    np.testing.assert_array_equal(rlemask.decode(rle), m)


# ---------------------------------------------------------------------------
# Morphology / components


def test_erode_dilate_inverse_on_blob():
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 1
    d = masks.dilate(m, 3)
    e = masks.erode(d, 3)
    assert d.sum() > m.sum()
    np.testing.assert_array_equal(e, m)  # square blob: exact closing


def test_outline_and_inline_disjoint_rings():
    m = np.zeros((40, 40), np.uint8)
    cv2.circle(m, (20, 20), 12, 1, -1)
    out_ring = masks.outline(m, 1, 5)
    in_ring = masks.get_inline(m, 1, 5)
    assert out_ring.sum() > 0 and in_ring.sum() > 0
    assert np.count_nonzero(out_ring & m) == 0  # strictly outside
    assert np.all(m[in_ring > 0] == 1)  # strictly inside
    assert masks.get_inline(m.astype(bool), 1, 5).dtype == bool


def test_largest_connected_component():
    m = np.zeros((30, 30), np.uint8)
    m[2:6, 2:6] = 1      # 16 px
    m[10:25, 10:25] = 1  # 225 px
    comp, box = masks.largest_connected_component(m)
    assert comp.sum() == 225
    np.testing.assert_array_equal(box, [10, 10, 15, 15])
    empty, zbox = masks.largest_connected_component(np.zeros((5, 5), np.uint8))
    np.testing.assert_array_equal(zbox, [0, 0, 0, 0])
    assert empty.sum() == 0


def test_masks_to_label_map_overwrite_order():
    a = np.zeros((8, 8), np.float32)
    a[:4] = 1.0
    b = np.zeros((8, 8), np.float32)
    b[2:6] = 1.0
    lm = masks.masks_to_label_map([a, b])
    assert lm.dtype == np.uint8
    assert lm[0, 0] == 1 and lm[3, 0] == 2 and lm[5, 0] == 2 and lm[7, 0] == 0


def test_fill_polygon_and_draw_mask():
    img = np.zeros((20, 20, 3), np.uint8)
    mask = np.zeros((20, 20), np.uint8)
    masks.fill_polygon(mask, np.array([[2.2, 2.0], [17.8, 2.0],
                                       [17.8, 17.6], [2.2, 17.6]]), 1)
    assert mask.sum() > 150
    masks.draw_mask(img, mask, (255, 0, 0))
    assert img[10, 10, 0] > 0  # overlaid
    assert np.all(img[0, 0] == 0)  # untouched background


def test_resize_mask_rle():
    rng = np.random.default_rng(1)
    m = np.zeros((20, 30), np.uint8)
    m[5:15, 8:22] = 1
    resized = masks.resize_mask(rlemask.encode(m), (40, 60))
    dm = rlemask.decode(resized)
    assert dm.shape == (40, 60)
    # area approximately scales by 4 (bilinear + threshold)
    assert abs(dm.sum() - 4 * m.sum()) < 0.25 * 4 * m.sum()
    del rng


def test_mask_iou_values():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b[3:8] = 1
    assert masks.mask_iou(a, b) == pytest.approx(20 / 80)
    assert masks.mask_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0


# ---------------------------------------------------------------------------
# improc file/video helpers


def test_blend_image_uint8_and_float():
    im1 = np.full((4, 4, 3), 100, np.uint8)
    im2 = np.full((4, 4, 3), 200, np.uint8)
    w = np.full((4, 4), 0.25, np.float32)
    out = improc.blend_image(im1, im2, w)
    assert out.dtype == np.uint8
    assert np.all(out == 125)
    outf = improc.blend_image(im1.astype(np.float32), im2.astype(np.float32),
                              0.5 * np.ones((4, 4, 1), np.float32))
    assert outf.dtype == np.float32
    assert np.allclose(outf, 150.0)


def test_image_extents_and_readable(tmp_path):
    p = str(tmp_path / 'im.png')
    cv2.imwrite(p, np.zeros((12, 34, 3), np.uint8))
    np.testing.assert_array_equal(improc.image_extents(p), [34, 12])
    assert improc.is_image_readable(p)
    assert not improc.is_image_readable(str(tmp_path / 'missing.jpg'))


def _write_test_video(path, n_frames=6, w=32, h=24, fps=10.0):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                             (w, h))
    if not writer.isOpened():
        pytest.skip('no mp4v codec in this cv2 build')
    for i in range(n_frames):
        frame = np.full((h, w, 3), i * 30, np.uint8)
        writer.write(frame)
    writer.release()


def test_video_metadata_helpers(tmp_path):
    p = str(tmp_path / 'v.mp4')
    _write_test_video(p, n_frames=6, w=32, h=24, fps=10.0)
    np.testing.assert_array_equal(improc.video_extents(p), [32, 24])
    assert improc.video_fps(p) == pytest.approx(10.0, rel=0.01)
    assert improc.num_frames_of_video(p) == 6
    with pytest.raises(FileNotFoundError):
        improc.video_fps(str(tmp_path / 'nope.mp4'))


def test_transform_video_roundtrip(tmp_path):
    src = str(tmp_path / 'src.mp4')
    dst = str(tmp_path / 'sub' / 'dst.mp4')
    _write_test_video(src, n_frames=5, w=32, h=24)
    calls = []

    def fn(frame):
        calls.append(frame.shape)
        return 255 - frame

    improc.transform_video(src, dst, fn)
    assert len(calls) == 5 and calls[0] == (24, 32, 3)
    assert improc.num_frames_of_video(dst) == 5
    # first source frame is ~0 -> inverted output frame is bright
    cap = cv2.VideoCapture(dst)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.mean() > 200


def test_rounded_int_tuple():
    assert improc.rounded_int_tuple([1.4, 2.6]) == (1, 3)
