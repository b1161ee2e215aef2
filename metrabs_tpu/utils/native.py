"""ctypes bindings for the native C++ host image ops (native/improc.cc).

Loads `native/libmetrabs_improc.so` (built by `make -C native`); every
function has a pure-numpy fallback so the package works without the build.
The native warp doubles as an independent oracle for the device warp in
tests (three implementations — numpy, XLA, C++ — cross-check each other).
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'native', 'libmetrabs_improc.so')


@functools.lru_cache()
def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gamma_decode_u8.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_float]
    lib.gamma_encode_f32.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_float]
    lib.paste_over.argtypes = [f32p, f32p, f32p] + [ctypes.c_int] * 5 + \
        [ctypes.c_float] * 2
    lib.box_downsample_2x2.argtypes = [f32p, f32p] + [ctypes.c_int] * 3
    lib.bilinear_warp.argtypes = [f32p] + [ctypes.c_int] * 3 + \
        [f64p, f64p, f64p, f32p, ctypes.c_int, ctypes.c_int]
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def gamma_decode_u8(image_u8: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """uint8 -> linear float32 via LUT; the loader's linearization hot op."""
    lib = _load_lib()
    image_u8 = np.ascontiguousarray(image_u8, np.uint8)
    if lib is None:
        return (image_u8.astype(np.float32) / 255.0) ** gamma
    out = np.empty(image_u8.shape, np.float32)
    lib.gamma_decode_u8(
        image_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _f32p(out),
        image_u8.size, ctypes.c_float(gamma))
    return out


def gamma_encode_f32(image_f32: np.ndarray, gamma: float) -> np.ndarray:
    lib = _load_lib()
    image_f32 = np.ascontiguousarray(image_f32, np.float32)
    if lib is None:
        return np.clip(image_f32, 0, None) ** gamma
    out = np.empty(image_f32.shape, np.float32)
    lib.gamma_encode_f32(_f32p(image_f32), _f32p(out), image_f32.size,
                         ctypes.c_float(gamma))
    return out


def paste_over(src: np.ndarray, alpha: np.ndarray, dst: np.ndarray,
               center) -> np.ndarray:
    """Alpha composite; modifies and returns dst (float32 arrays)."""
    lib = _load_lib()
    if lib is None:
        from metrabs_tpu.data.augment.occlusion import paste_over as np_paste
        return np_paste(src, dst, alpha, np.asarray(center), inplace=True)
    src = np.ascontiguousarray(src, np.float32)
    alpha = np.ascontiguousarray(alpha, np.float32)
    if not dst.flags['C_CONTIGUOUS'] or dst.dtype != np.float32:
        raise ValueError('dst must be contiguous float32')
    hs, ws = src.shape[:2]
    hd, wd = dst.shape[:2]
    c = dst.shape[2]
    lib.paste_over(_f32p(src), _f32p(alpha), _f32p(dst),
                   hs, ws, hd, wd, c,
                   ctypes.c_float(center[0]), ctypes.c_float(center[1]))
    return dst


def box_downsample_2x2(image: np.ndarray) -> np.ndarray:
    lib = _load_lib()
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    if lib is None:
        x = image[:h // 2 * 2, :w // 2 * 2]
        return x.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))
    out = np.empty((h // 2, w // 2, c), np.float32)
    lib.box_downsample_2x2(_f32p(image), _f32p(out), h, w, c)
    return out


def bilinear_warp(image: np.ndarray, invprojmat: np.ndarray,
                  intrinsics: np.ndarray, distortion_coeffs: np.ndarray,
                  output_shape) -> np.ndarray:
    """Dense homography+distortion warp with zero border (device-warp oracle)."""
    lib = _load_lib()
    image = np.ascontiguousarray(image, np.float32)
    d = np.zeros(12, np.float64)
    d[:len(distortion_coeffs)] = np.asarray(distortion_coeffs, np.float64)
    if lib is None:
        from metrabs_tpu.ops import warp as warp_ops
        import jax.numpy as jnp
        out = warp_ops.warp_images(
            jnp.asarray(image)[None], jnp.asarray(intrinsics, jnp.float32)[None],
            jnp.asarray(invprojmat, jnp.float32)[None],
            jnp.asarray(d, jnp.float32)[None], jnp.asarray([0]),
            tuple(output_shape))
        return np.asarray(out[0])
    oh, ow = output_shape
    out = np.empty((oh, ow, image.shape[2]), np.float32)
    m = np.ascontiguousarray(invprojmat, np.float64)
    k = np.ascontiguousarray(intrinsics, np.float64)
    lib.bilinear_warp(_f32p(image), image.shape[0], image.shape[1],
                      image.shape[2], _f64p(m), _f64p(k), _f64p(d),
                      _f32p(out), oh, ow)
    return out
