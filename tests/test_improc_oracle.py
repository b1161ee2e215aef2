"""Executed-reference parity for the CPU image-processing layer.

Round 2 audited `data/improc.py` / `data/masks.py` / the paste compositor
against `metrabs_tf/improc.py` BY READING; these tests EXECUTE the reference
module (numba stubbed to an identity decorator, so its @njit kernels run as
plain Python with identical semantics — see tests/_reference_oracle.py) and
compare outputs on randomized inputs. Needs no TensorFlow.

Reference cites: `metrabs_tf/improc.py:16-342`.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.oracle

from tests import _reference_oracle

from metrabs_tpu.data import improc as our_improc
from metrabs_tpu.data import masks as our_masks
from metrabs_tpu.data.augment import occlusion as our_occlusion


@pytest.fixture(scope='module')
def ref():
    return _reference_oracle.load_reference_improc()


@pytest.fixture
def img(rng):
    return rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)


@pytest.mark.parametrize('factor', [0.43, 0.5, 1.0, 1.7])
def test_resize_by_factor_matches(ref, rng, img, factor):
    """Same rounded size and INTER_LINEAR/INTER_AREA split
    (`improc.py:16-24`)."""
    want = ref.resize_by_factor(img, factor)
    got = our_improc.resize_by_factor(img, factor)
    np.testing.assert_array_equal(got, want)


def test_rounded_int_tuple_matches(ref):
    pts = [[3.5, -3.5], [2.49999, 2.5], [-0.5, 0.5], [10.7, -10.7]]
    for p in pts:
        assert our_improc.rounded_int_tuple(p) == ref.rounded_int_tuple(p), p


@pytest.mark.parametrize('dtype', [np.uint8, np.float32])
def test_normalize01_matches(ref, rng, dtype):
    if dtype == np.uint8:
        im = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    else:
        im = rng.uniform(-0.2, 1.2, size=(20, 30, 3)).astype(np.float32)
    want = ref.normalize01(im.copy())
    got = our_improc.normalize01(im.copy())
    np.testing.assert_allclose(got, want, atol=1e-7)


@pytest.mark.parametrize('gamma', [0.67, 1.0, 1.5])
def test_adjust_gamma_uint8_matches(ref, img, gamma):
    """Truncating uint8 LUT (`improc.py:210-220`)."""
    want = ref.adjust_gamma(img.copy(), gamma)
    got = our_improc.adjust_gamma(img.copy(), gamma)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('ab', [(None, None), (110.0, 145.0), (120.0, 138.0)])
def test_white_balance_matches(ref, img, ab):
    """LAB luminance-weighted chroma shift incl. the unsafe uint8 write-back
    truncation (`improc.py:246-253`); (110,145)/(120,138) are the 3DHP and
    Panoptic dataset fixes (`data_loading.py:128-130`)."""
    a, b = ab
    want = ref.white_balance(img.copy(), a, b)
    got = our_improc.white_balance(img.copy(), a, b)
    np.testing.assert_array_equal(got, want)


def test_blend_image_float_matches(ref, rng):
    im1 = rng.uniform(0, 1, size=(20, 30, 3)).astype(np.float32)
    im2 = rng.uniform(0, 1, size=(20, 30, 3)).astype(np.float32)
    w = rng.uniform(0, 1, size=(20, 30, 1)).astype(np.float32)
    want = ref.blend_image(im1, im2, w)
    got = our_improc.blend_image(im1, im2, w)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize('center', [(32.0, 24.0), (5.0, 5.0), (60.0, 2.0),
                                    (-10.0, 24.0), (100.0, 70.0)])
def test_paste_over_matches(ref, rng, img, center):
    """Alpha compositing with border clipping at all overlap regimes
    (interior, corner-partial, fully outside), vs the reference's numba
    kernel run as plain Python (`improc.py:158-207`)."""
    src = rng.integers(0, 256, size=(20, 16, 3), dtype=np.uint8)
    alpha = rng.uniform(0, 1, size=(20, 16)).astype(np.float32)
    want = ref.paste_over(src, img.copy(), alpha, np.asarray(center))
    got = our_occlusion.paste_over(src, img.copy(), alpha,
                                   np.asarray(center))
    # The reference numba kernel computes in the input dtypes and truncates
    # on the uint8 write-back; ours blends in float32. Both are within one
    # count of the exact blend.
    np.testing.assert_allclose(got.astype(np.int32), want.astype(np.int32),
                               atol=1)


@pytest.mark.parametrize('op', ['erode', 'dilate'])
def test_morphology_matches(ref, rng, op):
    mask = (rng.uniform(size=(40, 40)) > 0.6).astype(np.uint8)
    for ksize in (3, 5):
        want = getattr(ref, op)(mask.copy(), ksize)
        got = getattr(our_masks, op)(mask.copy(), ksize)
        np.testing.assert_array_equal(got, want, err_msg=f'{op} k={ksize}')


def test_outline_and_inline_match(ref, rng):
    mask = np.zeros((40, 40), np.uint8)
    mask[8:30, 10:35] = 1
    mask[20:25, 0:8] = 1
    np.testing.assert_array_equal(
        our_masks.outline(mask.copy()), ref.outline(mask.copy()))
    np.testing.assert_array_equal(
        our_masks.get_inline(mask.copy()), ref.get_inline(mask.copy()))


def test_largest_connected_component_matches(ref, rng):
    mask = (rng.uniform(size=(40, 40)) > 0.7).astype(np.uint8)
    want_comp, want_box = ref.largest_connected_component(mask.copy())
    got_comp, got_box = our_masks.largest_connected_component(mask.copy())
    np.testing.assert_array_equal(got_comp, want_comp)
    np.testing.assert_array_equal(got_box, want_box)


def test_masks_to_label_map_matches(ref, rng):
    masks = (rng.uniform(size=(4, 24, 24)) > 0.8).astype(np.uint8)
    want = ref.masks_to_label_map(masks)
    got = our_masks.masks_to_label_map(masks)
    np.testing.assert_array_equal(got, want)


def test_fill_polygon_matches(ref, rng):
    pts = rng.uniform(2, 38, size=(6, 2)).astype(np.float32)
    want = np.zeros((40, 40, 3), np.uint8)
    got = np.zeros((40, 40, 3), np.uint8)
    ref.fill_polygon(want, pts.copy(), (255, 30, 10))
    # (tuple color works for fillPoly; draw_mask below needs an array)
    our_masks.fill_polygon(got, pts.copy(), (255, 30, 10))
    np.testing.assert_array_equal(got, want)


def test_mask_iou_matches(ref, rng):
    m1 = rng.uniform(size=(30, 30)) > 0.5
    m2 = rng.uniform(size=(30, 30)) > 0.5
    assert our_masks.mask_iou(m1, m2) == pytest.approx(ref.mask_iou(m1, m2))
    assert our_masks.mask_iou(m1 & ~m1, m2 & ~m2) == 0.0


def test_draw_mask_matches(ref, rng, img):
    mask = np.zeros(img.shape[:2], np.uint8)
    mask[10:30, 20:50] = 1
    want = img.copy()
    got = img.copy()
    # The reference expects an ndarray color (`improc.py:336-342` does
    # mask_color * 0.3 on it); a python tuple raises TypeError there.
    color = np.array([200, 40, 90], np.float64)
    ref.draw_mask(want, mask.copy(), color)
    our_masks.draw_mask(got, mask.copy(), color)
    np.testing.assert_array_equal(got, want)


def test_get_structuring_element_matches(ref):
    import cv2
    for ksize in ((3, 3), (5, 5), (7, 3)):
        want = ref.get_structuring_element(cv2.MORPH_ELLIPSE, ksize)
        got = our_masks.get_structuring_element(cv2.MORPH_ELLIPSE, ksize)
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# color + random-erase augmentation vs the executed reference
# (`metrabs_tf/augmentation/{color,appearance}.py`). Both sides draw from an
# identically-seeded np.random.Generator with the same call sequence, so
# outputs must agree to float tolerance — this pins the op ORDER and the
# rng protocol (shuffle, then per-op uniforms), not just per-op math.


@pytest.fixture(scope='module')
def ref_aug():
    return _reference_oracle.load_reference_augmentation()


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
@pytest.mark.parametrize('dtype', ['uint8', 'float32'])
def test_augment_color_matches(ref_aug, seed, dtype):
    from metrabs_tpu.data.augment import color as our_color

    base = np.random.default_rng(99)
    if dtype == 'uint8':
        im = base.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    else:
        im = base.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    want = ref_aug.color.augment_color(
        im.copy(), np.random.default_rng(seed))
    got = our_color.augment_color(im.copy(), np.random.default_rng(seed))
    assert got.dtype == want.dtype
    if dtype == 'uint8':
        np.testing.assert_allclose(
            got.astype(np.int32), want.astype(np.int32), atol=1)
    else:
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize('seed', [0, 7, 13])
def test_random_erase_matches(ref_aug, seed):
    from metrabs_tpu.data.augment import occlusion as our_occ

    side = 48
    saved = {name: getattr(ref_aug.flags, name, None)
             for name in ('proc_side', 'occlude_aug_scale')}
    ref_aug.flags.proc_side = side  # the reference erases on a proc_side
    ref_aug.flags.occlude_aug_scale = 1.0  # canvas (`appearance.py:62-66`)
    try:
        base = np.random.default_rng(5)
        im = base.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
        want = ref_aug.appearance.random_erase(
            im.copy(), 0, 1 / 3, 0.3, 1.0 / 0.3, np.random.default_rng(seed))
        got = our_occ.random_erase(im.copy(), np.random.default_rng(seed))
    finally:
        for name, value in saved.items():
            setattr(ref_aug.flags, name, value)
    np.testing.assert_array_equal(got, want)
