"""Native C++ image ops vs numpy/XLA cross-checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from metrabs_tpu.utils import native

needs_native = pytest.mark.skipif(
    not native.native_available(), reason='native lib not built')


@needs_native
def test_gamma_decode_matches_numpy(rng):
    img = rng.integers(0, 255, size=(37, 53, 3), dtype=np.uint8)
    got = native.gamma_decode_u8(img, 2.2)
    expected = (img.astype(np.float32) / 255.0) ** 2.2
    np.testing.assert_allclose(got, expected, atol=1e-6)


@needs_native
def test_gamma_encode(rng):
    img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    got = native.gamma_encode_f32(img, 1 / 2.2)
    np.testing.assert_allclose(got, img ** (1 / 2.2), atol=1e-6)


@needs_native
def test_box_downsample(rng):
    img = rng.uniform(size=(10, 14, 3)).astype(np.float32)
    got = native.box_downsample_2x2(img)
    expected = img[:10, :14].reshape(5, 2, 7, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(got, expected, atol=1e-6)


@needs_native
def test_paste_over_matches_numpy(rng):
    from metrabs_tpu.data.augment.occlusion import paste_over as np_paste
    dst1 = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    dst2 = dst1.copy()
    src = rng.uniform(size=(10, 12, 3)).astype(np.float32)
    alpha = rng.uniform(size=(10, 12)).astype(np.float32)
    center = (5.0, 28.0)  # partially clipped at the border
    got = native.paste_over(src, alpha, dst1, center)
    expected = np_paste(src, dst2, alpha, np.asarray(center), inplace=True)
    np.testing.assert_allclose(got, expected, atol=1e-5)


@needs_native
@pytest.mark.parametrize('antialias_factor', [1, 2])
def test_pyramid_warp_3way_all_levels_full_distortion(rng, antialias_factor):
    """3-way native C++ / XLA gather / Pallas-interpret cross-check through
    the FULL antialiased warp path: every pyramid level (crop scales pick
    levels 0, 1, 2), all 12 distortion coefficients active, and both
    antialias supersampling factors the estimator uses
    (`warping.py:8-49,74-110`; estimator composition
    `pipeline/estimator.py:232-259`).

    The native side has no pyramid: each crop is checked against
    `native.bilinear_warp` on the explicitly box-downsampled level image
    with the level-adjusted intrinsics — an independent C++ oracle for the
    level-selection + flattened-gather composition, not just the
    single-level sampler."""
    import jax

    from metrabs_tpu.ops import camera as camera_ops
    from metrabs_tpu.ops import warp as warp_ops
    from metrabs_tpu.ops import warp_pallas

    n_levels = 3
    res = 32
    out_side = res * antialias_factor
    img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    k_old = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]], np.float64)
    # All 12 coefficients nonzero (k1 k2 p1 p2 k3 k4 k5 k6 s1 s2 s3 s4).
    d12 = np.array([-0.15, 0.05, 1e-3, -1e-3, 0.01, 0.02, -0.01, 0.005,
                    1e-3, -5e-4, 2e-4, -1e-4], np.float64)

    # One crop per pyramid level: floor(-log2(scale)) = 0, 1, 2.
    base_scales = np.array([1.0, 0.4, 0.2], np.float32)
    image_ids = np.array([0, 1, 0], np.int32)
    new_invproj = []
    for scale in base_scales:
        f = res * 0.9 * scale  # zoom consistent with the declared crop scale
        new_k = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1]],
                         np.float64)
        m = np.linalg.inv(new_k)
        if antialias_factor > 1:
            m = m @ np.asarray(camera_ops.corner_aligned_scale_mat(
                1.0 / antialias_factor), np.float64)
        new_invproj.append(m)
    new_invproj = np.stack(new_invproj)
    crop_scales = base_scales * antialias_factor

    case = dict(
        images=jnp.asarray(img),
        intrinsic_matrix=jnp.asarray(
            np.tile(k_old[None], (3, 1, 1)), jnp.float32),
        new_invprojmat=jnp.asarray(new_invproj, jnp.float32),
        distortion_coeffs=jnp.asarray(np.tile(d12[None], (3, 1)), jnp.float32),
        crop_scales=jnp.asarray(crop_scales),
        image_ids=jnp.asarray(image_ids),
        output_shape=(out_side, out_side))

    got_xla = np.asarray(warp_ops.warp_images_with_pyramid(**case))

    # Level selection must hit 0, 1, 2 — the supersampled scales select the
    # SAME level as factor 1 only because select_pyramid_level sees
    # scale * antialias_factor; keep the check on the un-supersampled scale.
    i_levels, _ = warp_ops.select_pyramid_level(
        jnp.asarray(crop_scales), case['intrinsic_matrix'], n_levels)
    if antialias_factor == 1:
        np.testing.assert_array_equal(np.asarray(i_levels), [0, 1, 2])

    # Native C++ per crop on the explicit level image.
    level_imgs = [img]
    for _ in range(n_levels - 1):
        cur = level_imgs[-1]
        level_imgs.append(
            cur.reshape(cur.shape[0], cur.shape[1] // 2, 2,
                        cur.shape[2] // 2, 2, 3).mean(axis=(2, 4)))
    for i in range(3):
        lvl = int(np.asarray(i_levels)[i])
        k_l = (np.asarray(camera_ops.corner_aligned_scale_mat(0.5 ** lvl),
                          np.float64) @ k_old)
        got_native = native.bilinear_warp(
            level_imgs[lvl][image_ids[i]], new_invproj[i], k_l, d12,
            (out_side, out_side))
        np.testing.assert_allclose(
            got_native, got_xla[i], atol=5e-4,
            err_msg=f'crop {i} (level {lvl}, antialias {antialias_factor})')

    # Pallas tiled kernel (interpret mode on CPU), f32 precision.
    got_pallas = np.asarray(warp_pallas.warp_images_with_pyramid_tiled(
        **case, interpret=True, precision='f32'))
    np.testing.assert_allclose(got_pallas, got_xla, atol=2e-4)


@needs_native
def test_bilinear_warp_matches_xla(rng):
    """The C++ warp is an independent oracle for the device warp: all three
    implementations (numpy test helper, XLA gather, C++) must agree."""
    from metrabs_tpu.ops import warp as warp_ops
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    K = np.array([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]], np.float64)
    new_K = np.array([[18.0, 0, 8], [0, 18.0, 8], [0, 0, 1]], np.float64)
    invproj = np.linalg.inv(new_K)
    d = np.array([-0.2, 0.05, 1e-3, -1e-3, 0.0], np.float64)

    got_native = native.bilinear_warp(img, invproj, K, d, (16, 16))
    got_xla = np.asarray(warp_ops.warp_images(
        jnp.asarray(img)[None], jnp.asarray(K, jnp.float32)[None],
        jnp.asarray(invproj, jnp.float32)[None],
        jnp.asarray(d, jnp.float32)[None], jnp.asarray([0]), (16, 16)))[0]
    np.testing.assert_allclose(got_native, got_xla, atol=2e-4)
