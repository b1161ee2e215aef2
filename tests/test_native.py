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
