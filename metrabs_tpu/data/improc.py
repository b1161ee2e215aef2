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
    """uint8-range values -> [0,1] float32 (`improc.py:112-119`): /255 and
    clip for EVERY input dtype, exactly as the reference (it never receives
    floats in the pipeline — augmentation is uint8 end-to-end — but the
    executed-oracle test pins the float path too)."""
    return np.clip(im.astype(np.float32) / np.float32(255), 0.0, 1.0)


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


def blend_image(im1: np.ndarray, im2: np.ndarray,
                im2_weight: np.ndarray) -> np.ndarray:
    """Per-pixel lerp `im1*(1-w) + im2*w` with a broadcastable weight map,
    returned in im1's dtype (`improc.py:223-235`; the reference JITs this
    with numba — plain vectorized numpy is equivalent here)."""
    w = np.asarray(im2_weight, np.float32)
    if w.ndim == im1.ndim - 1:
        w = w[..., np.newaxis]
    out = im1.astype(np.float32) * (1 - w) + im2.astype(np.float32) * w
    if np.issubdtype(im1.dtype, np.integer):
        out = np.clip(np.round(out), 0, 255)
    return out.astype(im1.dtype)


def is_image_readable(path: str) -> bool:
    """True iff `imread` succeeds (`improc.py:238-243`) — used to drop
    corrupt files during dataset preparation."""
    try:
        imread(path)
        return True
    except Exception:
        return False


def rounded_int_tuple(p) -> tuple:
    """Rounded int tuple of a float point, for cv2 drawing calls
    (`improc.py:33-34`)."""
    return tuple(np.round(np.asarray(p)).astype(int))


def image_extents(filepath: str) -> np.ndarray:
    """Image (width, height) without decoding pixel data
    (`improc.py:37-41`, via the PIL header reader)."""
    import PIL.Image
    with PIL.Image.open(filepath) as im:
        return np.asarray(im.size)


def video_extents(filepath: str) -> np.ndarray:
    """Video (width, height) without decoding frames (`improc.py:44-48`;
    cv2 capture properties instead of the imageio/ffmpeg metadata the
    reference uses — ffmpeg is not a dependency here)."""
    cap = cv2.VideoCapture(str(filepath))
    try:
        if not cap.isOpened():
            raise FileNotFoundError(filepath)
        return np.asarray([int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                           int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))])
    finally:
        cap.release()


def video_fps(filepath: str) -> float:
    """Frame rate from the container header (`improc.py:51-53`)."""
    cap = cv2.VideoCapture(str(filepath))
    try:
        if not cap.isOpened():
            raise FileNotFoundError(filepath)
        return float(cap.get(cv2.CAP_PROP_FPS))
    finally:
        cap.release()


def num_frames_of_video(path: str) -> int:
    """Frame count from the container header (`improc.py:280-282`)."""
    cap = cv2.VideoCapture(str(path))
    try:
        if not cap.isOpened():
            raise FileNotFoundError(path)
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def transform_video(inp_path: str, out_path: str, process_frame_fn,
                    fourcc: str = 'mp4v') -> None:
    """Reads a video, maps `process_frame_fn` over RGB frames, writes the
    result at the source frame rate (`improc.py:270-277`; cv2 VideoWriter
    instead of imageio/h264 — ffmpeg is not a dependency here). The frame
    function must preserve the frame size (VideoWriter is fixed-size)."""
    import os
    parent = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(parent, exist_ok=True)
    cap = cv2.VideoCapture(str(inp_path))
    if not cap.isOpened():
        raise FileNotFoundError(inp_path)
    writer = None
    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        while True:
            ok, frame_bgr = cap.read()
            if not ok:
                break
            out = process_frame_fn(cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB))
            if writer is None:
                writer = cv2.VideoWriter(
                    str(out_path), cv2.VideoWriter_fourcc(*fourcc), fps,
                    (out.shape[1], out.shape[0]))
                if not writer.isOpened():
                    raise RuntimeError(
                        f'cv2.VideoWriter rejected codec {fourcc!r} for '
                        f'{out_path}')
            writer.write(cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    finally:
        cap.release()
        if writer is not None:
            writer.release()


def video_audio_mux(vidpath_audiosource: str, vidpath_imagesource: str,
                    out_video_path: str) -> None:
    """Copies the audio track of one video onto the frames of another
    (`improc.py:345-349`). Stream copy requires the ffmpeg binary; raises
    RuntimeError when it is not installed (cv2 cannot mux audio)."""
    import shutil
    import subprocess
    ffmpeg = shutil.which('ffmpeg')
    if ffmpeg is None:
        raise RuntimeError(
            'video_audio_mux needs the ffmpeg binary on PATH (audio stream '
            'copy is not expressible through cv2)')
    subprocess.run(
        [ffmpeg, '-y', '-i', str(vidpath_imagesource),
         '-i', str(vidpath_audiosource),
         '-map', '0:v', '-map', '1:a', '-c', 'copy', str(out_video_path)],
        check=True, capture_output=True)
