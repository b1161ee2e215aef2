"""CPU image processing helpers (`metrabs_tf/improc.py` equivalents, numpy/cv2
instead of jpeg4py/numba — the hot device path never touches these)."""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np


def imread(path: str) -> np.ndarray:
    """RGB uint8 image load. `video.ext#frame=N` reads frame N of a video
    (the ASPset adapter's convention for .mkv sources)."""
    path = str(path)
    if '#frame=' in path:
        video_path, frame_spec = path.split('#frame=')
        cap = cv2.VideoCapture(video_path)
        try:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(frame_spec))
            ok, im = cap.read()
        finally:
            cap.release()
        if not ok or im is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
    im = cv2.imread(path, cv2.IMREAD_COLOR)
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


def white_balance(im: np.ndarray, a: Optional[float] = None,
                  b: Optional[float] = None) -> np.ndarray:
    """LAB-space, luminance-weighted white balance (`improc.py:246-253`).

    Shifts the a/b chroma channels toward neutral (128) in proportion to each
    pixel's luminance, with gain 1.1. `a`/`b` override the measured channel
    means (the 3DHP fix passes 110/145, Panoptic 120/138,
    `data_loading.py:128-130`). Input must be RGB uint8; the chroma update is
    written back into the uint8 LAB array exactly as the reference does (the
    intermediate is truncated by numpy's unsafe cast, not rounded/clipped)."""
    if im.dtype != np.uint8:
        raise ValueError(f'white_balance expects uint8 RGB, got {im.dtype}')
    lab = cv2.cvtColor(im, cv2.COLOR_RGB2LAB)
    avg_a = np.mean(lab[..., 1]) if a is None else a
    avg_b = np.mean(lab[..., 2]) if b is None else b
    lum = lab[..., 0] / 255.0
    lab[..., 1] = lab[..., 1] - (avg_a - 128) * lum * 1.1
    lab[..., 2] = lab[..., 2] - (avg_b - 128) * lum * 1.1
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)


def resize_by_factor(im: np.ndarray, factor: float) -> np.ndarray:
    new_size = (max(1, int(round(im.shape[1] * factor))),
                max(1, int(round(im.shape[0] * factor))))
    interp = cv2.INTER_LINEAR if factor > 1 else cv2.INTER_AREA
    return cv2.resize(im, new_size, interpolation=interp)
