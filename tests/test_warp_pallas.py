"""Equivalence tests: Pallas tiled warp vs the XLA gather backend.

Runs the kernel in interpret mode (CPU); on TPU the compiled kernel follows
the same code path. Tolerances reflect f32 lerp-vs-matmul reassociation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metrabs_tpu.ops import warp
from metrabs_tpu.ops import warp_pallas


def _random_case(rng, n_img=2, n_crops=5, h=200, w=260, out=(64, 128),
                 scale_range=(0.3, 1.4), distort=False):
    images = jnp.asarray(rng.uniform(size=(n_img, h, w, 3)), jnp.float32)
    scales = rng.uniform(*scale_range, size=n_crops).astype(np.float32)
    angles = rng.uniform(-0.6, 0.6, size=n_crops).astype(np.float32)
    cx = rng.uniform(0, w, size=n_crops).astype(np.float32)
    cy = rng.uniform(0, h, size=n_crops).astype(np.float32)
    image_ids = jnp.asarray(rng.integers(0, n_img, size=n_crops), jnp.int32)
    k_old = np.tile(np.array(
        [[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32),
        (n_crops, 1, 1))
    invproj = np.zeros((n_crops, 3, 3), np.float32)
    for i in range(n_crops):
        c, s = np.cos(angles[i]), np.sin(angles[i])
        a = np.array([[c, -s], [s, c]], np.float32) / scales[i]
        t = np.array([cx[i], cy[i]]) - a @ np.array([out[1] / 2, out[0] / 2])
        m = np.eye(3, dtype=np.float32)
        m[:2, :2] = a
        m[:2, 2] = t
        invproj[i] = np.linalg.inv(k_old[i]) @ m
    if distort:
        dist = np.zeros((n_crops, 12), np.float32)
        dist[:, 0] = rng.uniform(-0.2, 0.2, size=n_crops)   # k1
        dist[:, 1] = rng.uniform(-0.05, 0.05, size=n_crops)  # k2
        dist[:, 2:4] = rng.uniform(-0.01, 0.01, size=(n_crops, 2))  # p1 p2
        dist = jnp.asarray(dist)
    else:
        dist = jnp.zeros((n_crops, 12), jnp.float32)
    return dict(images=images, intrinsic_matrix=jnp.asarray(k_old),
                new_invprojmat=jnp.asarray(invproj), distortion_coeffs=dist,
                crop_scales=jnp.asarray(scales), image_ids=image_ids,
                output_shape=out)


def _compare(case, atol=2e-4):
    ref = np.asarray(warp.warp_images_with_pyramid(**case))
    got = np.asarray(
        warp_pallas.warp_images_with_pyramid_tiled(**case, interpret=True))
    np.testing.assert_allclose(got, ref, atol=atol)


def test_tiled_matches_gather_basic(rng):
    _compare(_random_case(rng))


def test_tiled_matches_gather_distorted(rng):
    _compare(_random_case(rng, distort=True))


def test_tiled_matches_gather_zoom_in(rng):
    # Magnifying crops (scale > 1): level 0, sub-pixel sampling.
    _compare(_random_case(rng, scale_range=(1.5, 3.0)))


def test_tiled_matches_gather_heavy_minification(rng):
    # Deep into the pyramid (levels 1-2) without hitting the clamped regime.
    _compare(_random_case(rng, scale_range=(0.15, 0.3)))


def test_tiled_zero_border_outside(rng):
    # Crops centered far outside the image: everything samples the zero ring.
    case = _random_case(rng)
    invproj = np.array(case['new_invprojmat'])
    invproj[:, :2, 2] += 10.0  # shift source points by ~3000 px via K^-1 t
    case['new_invprojmat'] = jnp.asarray(invproj)
    ref = np.asarray(warp.warp_images_with_pyramid(**case))
    got = np.asarray(
        warp_pallas.warp_images_with_pyramid_tiled(**case, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_precision_bf16x3_is_numerically_f32(rng):
    # The default ('high' -> bf16x3 hi/lo-split dots) must track the f32
    # gather oracle to ~1e-4 like the exact-f32 mode does.
    case = _random_case(rng)
    ref = np.asarray(warp.warp_images_with_pyramid(**case))
    got = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='bf16x3'))
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_precision_bf16_within_u8_quantization(rng):
    # Single-pass bf16: error bounded by ~the u8 source quantization (4e-3).
    case = _random_case(rng)
    ref = np.asarray(warp.warp_images_with_pyramid(**case))
    got = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='bf16'))
    np.testing.assert_allclose(got, ref, atol=8e-3)
    # ...and is genuinely coarser than bf16x3 (guards against the mode
    # strings silently mapping to the same path).
    got3 = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='bf16x3'))
    assert np.max(np.abs(got3 - ref)) < np.max(np.abs(got - ref))


def test_precision_bf16x2_geometry_accurate(rng):
    # 2-pass mode: subpixel hat weights keep their f32-accuracy hi/lo split
    # (geometry), only the pixel-VALUE term drops to single bf16 — error is
    # bounded by ~1 ulp of bf16 on [0,1] pixels, i.e. well inside the bf16
    # crop-model input cast that follows it in the estimator.
    case = _random_case(rng)
    ref = np.asarray(warp.warp_images_with_pyramid(**case))
    got2 = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='bf16x2'))
    np.testing.assert_allclose(got2, ref, atol=4e-3)
    # It must be a genuinely distinct path: coarser than bf16x3, and finer
    # than single-pass bf16 (whose geometry weights are bf16-rounded too).
    got3 = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='bf16x3'))
    got1 = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='bf16'))
    assert np.max(np.abs(got3 - ref)) < np.max(np.abs(got2 - ref))
    assert np.max(np.abs(got2 - ref)) < np.max(np.abs(got1 - ref))


def test_precision_enum_compat(rng):
    # jax.lax.Precision values keep working (HIGHEST == 'f32' mode).
    case = _random_case(rng, n_crops=2)
    a = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='f32'))
    np.testing.assert_array_equal(a, b)


def test_tiled_output_shape_validation(rng):
    case = _random_case(rng, out=(60, 100))
    with pytest.raises(ValueError):
        warp_pallas.warp_images_with_pyramid_tiled(**case, interpret=True)


def test_tiled_256_crop(rng):
    # The production shape: 256x256 crops from a larger image.
    _compare(_random_case(rng, n_img=1, n_crops=2, h=400, w=640,
                          out=(256, 256), scale_range=(0.5, 1.2)))


def test_tiled_worst_case_footprints(rng):
    # The footprint-maximizing regime: in-level scale just above 0.5 with
    # rotations sweeping the span maximum (0, 14, 26, 45, 76, 90 degrees) —
    # the round-2 bug class where 16x64 tiles overflowed their window.
    n_crops = 12
    h, w, out = 300, 400, (64, 64)
    images = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    angles = np.deg2rad([0, 14, 26, 45, 76, 90] * 2).astype(np.float32)
    scales = np.full(n_crops, 0.505, np.float32)
    k_old = np.tile(np.array(
        [[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32),
        (n_crops, 1, 1))
    invproj = np.zeros((n_crops, 3, 3), np.float32)
    for i in range(n_crops):
        c, s = np.cos(angles[i]), np.sin(angles[i])
        a = np.array([[c, -s], [s, c]], np.float32) / scales[i]
        t = np.array([w / 2, h / 2]) - a @ np.array([out[1] / 2, out[0] / 2])
        m = np.eye(3, dtype=np.float32)
        m[:2, :2] = a
        m[:2, 2] = t
        invproj[i] = np.linalg.inv(k_old[i]) @ m
    case = dict(images=images, intrinsic_matrix=jnp.asarray(k_old),
                new_invprojmat=jnp.asarray(invproj),
                distortion_coeffs=jnp.zeros((n_crops, 12), jnp.float32),
                crop_scales=jnp.asarray(scales),
                image_ids=jnp.zeros(n_crops, jnp.int32),
                output_shape=out)
    _compare(case)
