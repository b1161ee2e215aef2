"""Binary-mask utilities: morphology, connected components, rasterization.

Host-side (cv2/numpy) equivalents of the mask helpers in
`metrabs_tf/improc.py:256-342` that the reference's data preparation and
visualization paths use. These never run on device; keep them numpy-simple.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import cv2
import numpy as np

from metrabs_tpu.utils import rlemask


def get_structuring_element(shape: int, ksize, anchor=None) -> np.ndarray:
    """cv2 structuring element with int-or-tuple kernel size
    (`improc.py:27-30`)."""
    if not isinstance(ksize, tuple):
        ksize = (ksize, ksize)
    return cv2.getStructuringElement(shape, ksize, anchor)


def erode(mask: np.ndarray, kernel_size, iterations: int = 1) -> np.ndarray:
    """Elliptical-kernel erosion (`improc.py:293-295`); bool masks
    round-trip through uint8 (cv2 rejects bool)."""
    if mask.dtype == bool:
        return erode(mask.astype(np.uint8), kernel_size, iterations) > 0
    elem = get_structuring_element(cv2.MORPH_ELLIPSE, kernel_size)
    return cv2.morphologyEx(mask, cv2.MORPH_ERODE, elem, iterations=iterations)


def dilate(mask: np.ndarray, kernel_size, iterations: int = 1) -> np.ndarray:
    """Elliptical-kernel dilation (`improc.py:298-300`); bool masks
    round-trip through uint8 (cv2 rejects bool)."""
    if mask.dtype == bool:
        return dilate(mask.astype(np.uint8), kernel_size, iterations) > 0
    elem = get_structuring_element(cv2.MORPH_ELLIPSE, kernel_size)
    return cv2.morphologyEx(mask, cv2.MORPH_DILATE, elem, iterations=iterations)


def outline(mask: np.ndarray, d1: int = 1, d2: int = 3) -> np.ndarray:
    """Ring just OUTSIDE the mask: dilate(d2) - dilate(d1)
    (`improc.py:313-314`); bool masks round-trip through uint8."""
    if mask.dtype == bool:
        return outline(mask.astype(np.uint8), d1, d2).astype(bool)
    return dilate(mask, d2) - dilate(mask, d1)


def get_inline(mask: np.ndarray, d1: int = 1, d2: int = 3) -> np.ndarray:
    """Ring just INSIDE the mask: erode(d1) - erode(d2) (`improc.py:330-333`);
    bool masks round-trip through uint8."""
    if mask.dtype == bool:
        return get_inline(mask.astype(np.uint8), d1, d2).astype(bool)
    return erode(mask, d1) - erode(mask, d2)


def largest_connected_component(
        mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(largest-component mask, its [x, y, w, h] box); all-empty input
    returns (input, zero box) (`improc.py:256-267`). 4-connectivity."""
    mask = mask.astype(np.uint8)
    n_labels, labels, stats, _ = cv2.connectedComponentsWithStats(
        mask, 4, cv2.CV_32S)
    areas = stats[1:, -1]  # row 0 is background
    if len(areas) < 1:
        return mask, np.array([0, 0, 0, 0])
    largest = 1 + int(np.argmax(areas))
    return np.uint8(labels == largest), np.array(stats[largest, :4])


def masks_to_label_map(masks: Sequence[np.ndarray],
                       imshape=None) -> np.ndarray:
    """Stack of [N, h, w] binary masks -> single [h, w] uint8 label map with
    instance ids 1..N, later instances overwriting earlier ones
    (`improc.py:303-310`). An empty sequence needs `imshape` (h, w) to know
    the output size; without it that case raises instead of returning a
    shapeless scalar."""
    masks = np.asarray(masks)
    if masks.size == 0 and masks.ndim != 3:
        if imshape is None:
            raise ValueError(
                'masks_to_label_map with zero masks needs imshape=(h, w)')
        return np.zeros(tuple(imshape[:2]), np.uint8)
    label_map = np.zeros(masks.shape[1:3], np.uint8)
    for i, mask in enumerate(masks):
        label_map[mask > 0.5] = i + 1
    return label_map


def fill_polygon(img: np.ndarray, pts: np.ndarray, color) -> None:
    """In-place filled polygon from float vertex coords
    (`improc.py:317-320`)."""
    pts = np.round(np.asarray(pts).reshape((-1, 1, 2))).astype(np.int32)
    cv2.fillPoly(img, [pts], color)


def mask_iou(mask1: np.ndarray, mask2: np.ndarray) -> float:
    """IoU of two binary masks; empty union -> 0, not NaN
    (`improc.py:285-290`)."""
    m1 = np.asarray(mask1).astype(bool)
    m2 = np.asarray(mask2).astype(bool)
    union = np.count_nonzero(m1 | m2)
    if union == 0:
        return 0.0
    return float(np.count_nonzero(m1 & m2) / union)


def resize_mask(mask_encoded, new_imshape) -> dict:
    """RLE-encoded mask resized to a new image shape, re-encoded
    (`improc.py:323-328`): decode -> x255 -> bilinear resize -> >127
    threshold -> encode."""
    mask = rlemask.decode(mask_encoded) * 255
    mask = cv2.resize(mask, (new_imshape[1], new_imshape[0]))
    return rlemask.encode((mask > 127).astype(np.uint8))


def draw_mask(img: np.ndarray, mask: np.ndarray, mask_color,
              draw_outline: bool = True) -> None:
    """In-place 30% color overlay of `mask` onto `img`, optionally with a
    solid inner outline (`improc.py:336-342`)."""
    mask_color = np.asarray(mask_color, np.float64)
    region = mask > 0
    img[region] = np.clip(
        mask_color * 0.3 + img[region].astype(np.float64) * 0.7,
        0, 255).astype(np.uint8)
    if draw_outline:
        ring = get_inline(region, 1, 5)
        img[ring.astype(bool)] = mask_color.astype(np.uint8)
