import numpy as np
import jax.numpy as jnp

from metrabs_tpu.ops import rotation


def test_lookat_maps_forward_to_z(rng):
    fwd = rng.normal(size=(16, 3)).astype(np.float32)
    up = np.array([0, -1, 0], np.float32)
    R = np.asarray(rotation.lookat_rotation_matrix(jnp.array(fwd), jnp.array(up)))
    fwd_n = fwd / np.linalg.norm(fwd, axis=-1, keepdims=True)
    # Row convention: rows of R are the new basis vectors, so R @ fwd_n = e_z.
    mapped = np.einsum('bij,bj->bi', R, fwd_n)
    np.testing.assert_allclose(mapped, np.tile([0, 0, 1.], (16, 1)), atol=1e-5)


def test_lookat_orthonormal_right_handed(rng):
    fwd = rng.normal(size=(16, 3)).astype(np.float32)
    up = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(rotation.lookat_rotation_matrix(jnp.array(fwd), jnp.array(up)))
    eye = np.einsum('bij,bkj->bik', R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_lookat_degenerate_forward_parallel_up():
    # Forward aligned with up: the primary cross product vanishes and the
    # fallback X (forward rotated 90° about old Y) must kick in. The fallback
    # covers forwards with x/z components (z-up case); forward == ±e_y with
    # y-up is degenerate in the reference too (`tfu3d.py:288-291`).
    fwd = np.array([[0, 0, 1]], np.float32)
    up = np.array([0, 0, 1], np.float32)
    R = np.asarray(rotation.lookat_rotation_matrix(jnp.array(fwd), jnp.array(up)))
    assert np.all(np.isfinite(R))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.eye(3)[None], atol=1e-5)
    np.testing.assert_allclose(np.einsum('bij,bj->bi', R, fwd), [[0, 0, 1.]], atol=1e-5)


def test_rotation_mat_z_quarter_turn():
    R = np.asarray(rotation.rotation_mat(jnp.float32(np.pi / 2), 'z'))
    # Matches the reference convention (tfu3d.py:316-319): row-vector rotation.
    np.testing.assert_allclose(R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)


def test_rotation_mat_batched():
    angles = jnp.array([0.0, np.pi / 2, np.pi], jnp.float32)
    R = np.asarray(rotation.rotation_mat(angles, 'x'))
    assert R.shape == (3, 3, 3)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
