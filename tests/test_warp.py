import numpy as np
import jax.numpy as jnp

from metrabs_tpu.ops import warp
from metrabs_tpu.ops.camera import corner_aligned_scale_mat
from metrabs_tpu.ops.distortion import distort_points


def bilinear_np(image, x, y):
    """Direct numpy bilinear sample with zero border (1px pad + clamp)."""
    h, w = image.shape[:2]
    padded = np.pad(image, ((1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2
    x, y = x + 1, y + 1
    x = np.clip(x, 0, wp - 1)
    y = np.clip(y, 0, hp - 1)
    x0 = int(np.clip(np.floor(x), 0, wp - 2))
    y0 = int(np.clip(np.floor(y), 0, hp - 2))
    fx, fy = x - x0, y - y0
    return ((padded[y0, x0] * (1 - fx) + padded[y0, x0 + 1] * fx) * (1 - fy) +
            (padded[y0 + 1, x0] * (1 - fx) + padded[y0 + 1, x0 + 1] * fx) * fy)


def test_identity_warp(rng):
    img = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    eye = np.eye(3, dtype=np.float32)[None]
    out = np.asarray(warp.warp_images(
        jnp.array(img), jnp.array(eye), jnp.array(eye),
        jnp.zeros((1, 5), np.float32), jnp.array([0]), (16, 16)))
    np.testing.assert_allclose(out[0], img[0], atol=1e-5)


def test_translation_warp(rng):
    img = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    # invprojmat shifting output pixel (x,y) to source (x+3, y+2)
    shift = np.array([[1, 0, 3], [0, 1, 2], [0, 0, 1]], np.float32)[None]
    eye = np.eye(3, dtype=np.float32)[None]
    out = np.asarray(warp.warp_images(
        jnp.array(img), jnp.array(eye), jnp.array(shift),
        jnp.zeros((1, 5), np.float32), jnp.array([0]), (16, 16)))
    np.testing.assert_allclose(out[0, :14, :13], img[0, 2:, 3:], atol=1e-5)
    # Zero border beyond the source extent
    np.testing.assert_allclose(out[0, 15, :], 0, atol=1e-6)


def test_zero_border(rng):
    img = np.ones((1, 8, 8, 3), np.float32)
    shift = np.array([[1, 0, -4], [0, 1, 0], [0, 0, 1]], np.float32)[None]
    eye = np.eye(3, dtype=np.float32)[None]
    out = np.asarray(warp.warp_images(
        jnp.array(img), jnp.array(eye), jnp.array(shift),
        jnp.zeros((1, 5), np.float32), jnp.array([0]), (8, 8)))
    # Columns sampling source x in [-4, -1) are fully outside -> 0;
    # column at source x = -1 is half-in (bilinear with the zero pad) -> 0.
    assert np.all(out[0, :, :3] == 0)
    # Columns sampling inside are 1.
    np.testing.assert_allclose(out[0, :, 5:], 1.0, atol=1e-6)


def test_warp_with_distortion_matches_pointwise(rng):
    img = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    K = np.array([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]], np.float32)
    # A small rotation + the intrinsics inverse as the new inverse projection.
    new_K = np.array([[18.0, 0, 8], [0, 18.0, 8], [0, 0, 1]], np.float32)
    invproj = np.linalg.inv(new_K).astype(np.float32)
    d = np.array([-0.2, 0.05, 1e-3, -1e-3, 0.0], np.float32)

    out = np.asarray(warp.warp_images(
        jnp.array(img), jnp.array(K[None]), jnp.array(invproj[None]),
        jnp.array(d[None]), jnp.array([0]), (16, 16)))

    # Pointwise numpy reference for a handful of output pixels.
    for (oy, ox) in [(0, 0), (7, 3), (15, 15), (4, 11)]:
        ray = invproj @ np.array([ox, oy, 1.0], np.float32)
        p = ray[:2] / ray[2]
        pd = np.asarray(distort_points(jnp.array(p[None]), jnp.array(d)))[0]
        src = K @ np.array([pd[0], pd[1], 1.0], np.float32)
        expected = bilinear_np(img[0], src[0], src[1])
        np.testing.assert_allclose(out[0, oy, ox], expected, atol=1e-4)


def test_multi_image_ids(rng):
    imgs = rng.uniform(size=(3, 8, 8, 3)).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32)[None], (3, 1, 1))
    out = np.asarray(warp.warp_images(
        jnp.array(imgs), jnp.array(eye), jnp.array(eye),
        jnp.zeros((3, 5), np.float32), jnp.array([2, 0, 1]), (8, 8)))
    np.testing.assert_allclose(out[0], imgs[2], atol=1e-5)
    np.testing.assert_allclose(out[1], imgs[0], atol=1e-5)
    np.testing.assert_allclose(out[2], imgs[1], atol=1e-5)


def test_pyramid_level_selection(rng):
    # crop_scale 1.0 -> level 0; 0.4 -> level 1; 0.2 -> level 2
    img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    n = 3
    K = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
    invproj = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
    scales = np.array([1.0, 0.4, 0.2], np.float32)
    out = np.asarray(warp.warp_images_with_pyramid(
        jnp.array(img), jnp.array(K), jnp.array(invproj),
        jnp.zeros((n, 5), np.float32), jnp.array(scales),
        jnp.zeros(n, np.int32), (16, 16)))

    # Level 0: direct sample of the full-res image.
    np.testing.assert_allclose(out[0], img[0, :16, :16], atol=1e-5)

    # Level 1: sample of the 2x boxfiltered image at K' = S(1/2) K, i.e.
    # source coords x' = x/2 - 1/4.
    lvl1 = np.asarray(warp.avg_pool_2x2(jnp.array(img)))[0]
    expected = bilinear_np(lvl1, 0 * 0.5 - 0.25, 0 * 0.5 - 0.25)
    np.testing.assert_allclose(out[1, 0, 0], expected, atol=1e-5)

    lvl2 = np.asarray(warp.avg_pool_2x2(warp.avg_pool_2x2(jnp.array(img))))[0]
    expected2 = bilinear_np(lvl2, 5 * 0.25 - 0.375, 3 * 0.25 - 0.375)
    np.testing.assert_allclose(out[2, 3, 5], expected2, atol=1e-5)


def test_corner_aligned_scale_mat_halving():
    m = np.asarray(corner_aligned_scale_mat(0.5))
    np.testing.assert_allclose(m, [[0.5, 0, -0.25], [0, 0.5, -0.25], [0, 0, 1]], atol=1e-7)
