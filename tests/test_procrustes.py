import numpy as np
import jax.numpy as jnp
from scipy.stats import special_ortho_group

from metrabs_tpu.ops import procrustes


def random_rigid(rng, batch):
    R = special_ortho_group.rvs(3, size=batch, random_state=int(rng.integers(1 << 30)))
    if batch == 1:
        R = R[None]
    t = rng.normal(size=(batch, 1, 3)) * 100
    return R.astype(np.float32), t.astype(np.float32)


def test_recovers_rigid_transform(rng):
    X = rng.normal(size=(5, 17, 3)).astype(np.float32) * 100
    R, t = random_rigid(rng, 5)
    Y = np.einsum('bjc,bdc->bjd', X, R) + t
    mask = np.ones((5, 17), bool)
    aligned = np.asarray(procrustes.procrustes_align(jnp.array(X), jnp.array(Y), jnp.array(mask)))
    np.testing.assert_allclose(aligned, X, atol=1e-2)


def test_recovers_scaled_transform(rng):
    X = rng.normal(size=(3, 17, 3)).astype(np.float32) * 100
    R, t = random_rigid(rng, 3)
    scale = rng.uniform(0.5, 2.0, size=(3, 1, 1)).astype(np.float32)
    Y = scale * np.einsum('bjc,bdc->bjd', X, R) + t
    mask = np.ones((3, 17), bool)
    aligned = np.asarray(procrustes.procrustes_align(
        jnp.array(X), jnp.array(Y), jnp.array(mask), allow_scaling=True))
    np.testing.assert_allclose(aligned, X, atol=1e-2)


def test_no_reflection_by_default(rng):
    X = rng.normal(size=(2, 17, 3)).astype(np.float32) * 100
    # Y is a reflected version of X.
    Y = X * np.array([-1, 1, 1], np.float32)
    mask = np.ones((2, 17), bool)
    _, T, _, _ = procrustes.procrustes_transform(jnp.array(X), jnp.array(Y), jnp.array(mask))
    det = np.linalg.det(np.asarray(T))
    assert np.all(det > 0)  # rotation only, no reflection


def test_invalid_joints_ignored(rng):
    X = rng.normal(size=(1, 17, 3)).astype(np.float32) * 100
    R, t = random_rigid(rng, 1)
    Y = np.einsum('bjc,bdc->bjd', X, R) + t
    # Corrupt two joints in Y but mark them invalid.
    Y_corrupt = Y.copy()
    Y_corrupt[0, 3] += 1e4
    Y_corrupt[0, 7] -= 1e4
    mask = np.ones((1, 17), bool)
    mask[0, [3, 7]] = False
    aligned = np.asarray(procrustes.procrustes_align(
        jnp.array(X), jnp.array(Y_corrupt), jnp.array(mask)))
    valid = mask[0]
    np.testing.assert_allclose(aligned[0, valid], X[0, valid], atol=1e-2)


def test_all_invalid_mask_yields_finite(rng):
    """divide_no_nan semantics: a padding row (all-invalid mask) must align
    to finite zeros, not NaN that poisons unmasked batch reductions."""
    from metrabs_tpu.ops.procrustes import procrustes_align
    X = jnp.asarray(rng.normal(size=(3, 17, 3)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(3, 17, 3)), jnp.float32)
    mask = np.ones((3, 17), bool)
    mask[1] = False  # padding pose
    out = procrustes_align(X, Y, jnp.asarray(mask), allow_scaling=True)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    # The valid rows still align properly (self-alignment sanity).
    out_self = np.asarray(procrustes_align(
        X, X, jnp.asarray(np.ones((3, 17), bool)), allow_scaling=True))
    np.testing.assert_allclose(out_self, np.asarray(X), atol=1e-4)
