import numpy as np
import jax.numpy as jnp

from metrabs_tpu.ops import heatmap_decode as soft_argmax
from metrabs_tpu.ops import heatmap


def test_delta_heatmap_decodes_to_bin(rng):
    # Big logit at one bin: soft-argmax approaches bin/(n-1).
    n = 8
    logits = np.full((1, n, n, 1), -30.0, np.float32)
    logits[0, 5, 2, 0] = 30.0  # h=5, w=2
    # Decode x from axis 2 (W) and y from axis 1 (H), as the reference does
    # with axis=image_axes()[::-1] == (W, H) for NHWC.
    coords = np.asarray(soft_argmax.soft_argmax(jnp.array(logits), axes=(2, 1)))
    np.testing.assert_allclose(coords[0, 0], [2 / 7, 5 / 7], atol=1e-5)


def test_decode_heatmap_matches_numpy_expectation(rng):
    probs = rng.uniform(size=(2, 8, 8, 8, 3)).astype(np.float32)
    probs /= probs.sum(axis=(1, 2, 3), keepdims=True)
    # axes (2, 1, 3) = (W, H, D) -> output coords (x, y, z)
    got = np.asarray(soft_argmax.decode_heatmap(jnp.array(probs), axes=(2, 1, 3)))
    lin = np.linspace(0, 1, 8, dtype=np.float32)
    exp_x = np.einsum('bhwdj,w->bj', probs, lin)
    exp_y = np.einsum('bhwdj,h->bj', probs, lin)
    exp_z = np.einsum('bhwdj,d->bj', probs, lin)
    np.testing.assert_allclose(got[..., 0], exp_x, atol=1e-5)
    np.testing.assert_allclose(got[..., 1], exp_y, atol=1e-5)
    np.testing.assert_allclose(got[..., 2], exp_z, atol=1e-5)


def test_softmax_multi_axis_normalizes(rng):
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32) * 5
    p = np.asarray(soft_argmax.softmax_multi_axis(jnp.array(x), (1, 2)))
    np.testing.assert_allclose(p.sum(axis=(1, 2)), np.ones((2, 3)), atol=1e-5)


def test_heatmap_to_image_centered_stride():
    # proc_side=256, stride=32: last receptive center at 224, +16 offset.
    coords = jnp.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]])
    got = np.asarray(heatmap.heatmap_to_image(
        coords, proc_side=256, stride=32, centered_stride=True))
    np.testing.assert_allclose(got, [[16, 16], [240, 240], [128, 128]], atol=1e-5)


def test_heatmap_to_image_uncentered():
    coords = jnp.array([[0.0, 0.0], [1.0, 1.0]])
    got = np.asarray(heatmap.heatmap_to_image(
        coords, proc_side=256, stride=32, centered_stride=False))
    np.testing.assert_allclose(got, [[0, 0], [224, 224]], atol=1e-5)


def test_heatmap_to_metric_scaling():
    coords = jnp.array([[[0.5, 0.5, 0.5]]])
    got = np.asarray(heatmap.heatmap_to_metric(
        coords, proc_side=256, stride=32, box_size_mm=2200.0, centered_stride=True))
    # xy: 128 px * 2200/256 = 1100mm; z: 0.5 * 2200 = 1100mm
    np.testing.assert_allclose(got[0, 0], [1100.0, 1100.0, 1100.0], atol=1e-3)
