import numpy as np
import jax.numpy as jnp

from metrabs_tpu.ops import distortion


def opencv_distort_np(pts, k1=0., k2=0., p1=0., p2=0., k3=0., k4=0., k5=0., k6=0.,
                      s1=0., s2=0., s3=0., s4=0.):
    """Independent numpy spelling of the OpenCV projectPoints distortion model."""
    x, y = pts[..., 0], pts[..., 1]
    r2 = x * x + y * y
    radial = (1 + k1 * r2 + k2 * r2**2 + k3 * r2**3) / (1 + k4 * r2 + k5 * r2**2 + k6 * r2**3)
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x) + s1 * r2 + s2 * r2**2
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y + s3 * r2 + s4 * r2**2
    return np.stack([xd, yd], axis=-1)


def test_zero_coeffs_is_identity(rng):
    pts = rng.uniform(-0.5, 0.5, size=(7, 2)).astype(np.float32)
    d = np.zeros((5,), np.float32)
    np.testing.assert_allclose(distortion.distort_points(jnp.array(pts), jnp.array(d)), pts,
                               rtol=1e-6)
    np.testing.assert_allclose(distortion.undistort_points(jnp.array(pts), jnp.array(d)), pts,
                               rtol=1e-6)


def test_matches_opencv_model(rng):
    pts = rng.uniform(-0.4, 0.4, size=(50, 2)).astype(np.float32)
    coeffs = dict(k1=-0.28, k2=0.07, p1=1e-3, p2=-2e-3, k3=0.002,
                  k4=-0.01, k5=0.003, k6=-0.0005, s1=1e-4, s2=-2e-4, s3=3e-4, s4=-1e-4)
    d = np.array([coeffs[k] for k in
                  ['k1', 'k2', 'p1', 'p2', 'k3', 'k4', 'k5', 'k6', 's1', 's2', 's3', 's4']],
                 np.float32)
    expected = opencv_distort_np(pts, **coeffs)
    got = distortion.distort_points(jnp.array(pts), jnp.array(d))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_short_coeff_vector_padding(rng):
    pts = rng.uniform(-0.4, 0.4, size=(8, 2)).astype(np.float32)
    d5 = np.array([-0.2, 0.05, 1e-3, -1e-3, 0.001], np.float32)
    d12 = np.concatenate([d5, np.zeros(7, np.float32)])
    got5 = distortion.distort_points(jnp.array(pts), jnp.array(d5))
    got12 = distortion.distort_points(jnp.array(pts), jnp.array(d12))
    np.testing.assert_allclose(got5, got12, rtol=1e-6)


def test_undistort_round_trip(rng):
    pts = rng.uniform(-0.3, 0.3, size=(30, 2)).astype(np.float32)
    d = np.array([-0.28, 0.07, 1e-3, -2e-3, 0.002], np.float32)
    distorted = distortion.distort_points(jnp.array(pts), jnp.array(d))
    recovered = distortion.undistort_points(distorted, jnp.array(d), num_iters=5)
    np.testing.assert_allclose(recovered, pts, atol=2e-4)


def test_batched_coeffs_broadcast(rng):
    # Per-crop coefficient vectors broadcasting over per-crop point grids.
    pts = rng.uniform(-0.3, 0.3, size=(4, 6, 2)).astype(np.float32)
    d = rng.uniform(-0.05, 0.05, size=(4, 5)).astype(np.float32)
    got = distortion.distort_points(jnp.array(pts), jnp.array(d))
    for i in range(4):
        expected_i = distortion.distort_points(jnp.array(pts[i]), jnp.array(d[i]))
        np.testing.assert_allclose(got[i], expected_i, rtol=1e-6)
