"""CPU image processing helpers (`metrabs_tf/improc.py` equivalents, numpy/cv2
instead of jpeg4py/numba — the hot device path never touches these)."""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np


def imread(path: str) -> np.ndarray:
    """RGB uint8 image load."""
    im = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if im is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


def normalize01(im: np.ndarray) -> np.ndarray:
    if np.issubdtype(im.dtype, np.integer):
        return im.astype(np.float32) / 255.0
    return im.astype(np.float32)


def adjust_gamma(im: np.ndarray, gamma: float, inplace: bool = False) -> np.ndarray:
    """LUT-based gamma adjustment (`improc.py:210-220`)."""
    if np.issubdtype(im.dtype, np.integer):
        lut = (np.clip(np.linspace(0, 1, 256) ** gamma, 0, 1) * 255).astype(im.dtype)
        out = lut[im]
    else:
        out = np.clip(im, 0, 1) ** gamma
    if inplace:
        im[:] = out
        return im
    return out


def white_balance(im: np.ndarray, a: float = 110, b: float = 145) -> np.ndarray:
    """Linear white balance used for 3DHP/Panoptic fixes (`improc.py:246-253`):
    scales the red and blue channels by 255/2 / a and 255/2 / b."""
    scale = np.array([127.5 / a, 1.0, 127.5 / b], np.float32)
    if np.issubdtype(im.dtype, np.integer):
        return np.clip(im.astype(np.float32) * scale, 0, 255).astype(im.dtype)
    return np.clip(im * scale, 0, 1)


def resize_by_factor(im: np.ndarray, factor: float) -> np.ndarray:
    new_size = (max(1, int(round(im.shape[1] * factor))),
                max(1, int(round(im.shape[0] * factor))))
    interp = cv2.INTER_LINEAR if factor > 1 else cv2.INTER_AREA
    return cv2.resize(im, new_size, interpolation=interp)
