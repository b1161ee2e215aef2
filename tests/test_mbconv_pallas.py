"""Equivalence tests: fused MBConv inner kernel vs the unfused ops.

Interpret mode on CPU; the compiled kernel follows the same code path on
TPU. The oracle is the exact composition the flax MBConv path computes:
silu(BN1(dw3x3_same(silu(BN0(x))))) with bf16 elementwise and f32 conv
accumulation, plus the SE spatial mean.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.ops import mbconv_pallas

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles (fast-tier durations r5); smoke tier = -m 'not oracle and not slow'



def _oracle(u, w, s0, b0, s1, b1):
    cdt = u.dtype
    a = u * s0.astype(cdt) + b0.astype(cdt)
    a = a * jax.nn.sigmoid(a)
    a = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, hp, wp, e = a.shape
    th, tw = hp - 2, wp - 2
    acc = jnp.zeros((n, th, tw, e), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += (a[:, dy:dy + th, dx:dx + tw, :].astype(jnp.float32)
                    * w[dy, dx, 0].astype(jnp.float32))
    v = acc.astype(cdt)
    y = v * s1.astype(cdt) + b1.astype(cdt)
    y = y * jax.nn.sigmoid(y)
    return y, jnp.mean(y.astype(jnp.float32), axis=(1, 2))


def _case(rng, n=2, h=12, w=10, e=16, dtype=jnp.float32):
    u = jnp.asarray(rng.normal(size=(n, h, w, e)) * 2, dtype)
    wk = jnp.asarray(rng.normal(size=(3, 3, 1, e)) * 0.3, jnp.float32)
    s0 = jnp.asarray(rng.uniform(0.5, 1.5, size=e), jnp.float32)
    b0 = jnp.asarray(rng.normal(size=e) * 0.2, jnp.float32)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, size=e), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=e) * 0.2, jnp.float32)
    return u, wk, s0, b0, s1, b1


@pytest.mark.parametrize('h,w', [(12, 10), (24, 24), (7, 9)])
def test_matches_oracle_f32(rng, h, w):
    case = _case(rng, h=h, w=w)
    ref_v, ref_m = _oracle(*case)
    got_v, got_m = mbconv_pallas.fused_mbconv_inner(*case, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               atol=1e-5, rtol=1e-5)


def test_matches_oracle_bf16(rng):
    case = _case(rng, n=1, h=8, w=8, e=32, dtype=jnp.bfloat16)
    ref_v, ref_m = _oracle(*case)
    got_v, got_m = mbconv_pallas.fused_mbconv_inner(*case, interpret=True)
    assert got_v.dtype == jnp.bfloat16
    # The kernel computes silu in f32 and rounds (Mosaic bf16-sigmoid bug
    # workaround, mbconv_pallas._silu); vs the oracle's bf16-native silu a
    # few elements land 1 bf16 ulp apart (~4% relative near zero).
    np.testing.assert_allclose(
        np.asarray(got_v, np.float32), np.asarray(ref_v, np.float32),
        atol=7e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               atol=1e-2, rtol=1e-2)


def test_backbone_fused_path_equivalence(rng):
    # Full EfficientNetV2-S at 64px: the fused path ('interpret') must (a)
    # create the IDENTICAL parameter tree (checkpoint/import compatible) and
    # (b) reproduce the unfused forward within float tolerance.
    from metrabs_tpu.models.backbones.efficientnet_v2 import EfficientNetV2

    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    m_off = EfficientNetV2(model_name='efficientnetv2-s', dtype=jnp.float32,
                           fuse_mbconv='off')
    m_fused = EfficientNetV2(model_name='efficientnetv2-s', dtype=jnp.float32,
                             fuse_mbconv='interpret')
    variables = m_off.init(jax.random.PRNGKey(0), x, train=False)
    variables_fused = m_fused.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables_fused))
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(variables_fused)):
        assert a.shape == b.shape

    ref = m_off.apply(variables, x, train=False)
    got = m_fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_zero_border_semantics(rng):
    # A one-hot input at the corner: taps outside the image contribute 0.
    e = 8
    u = jnp.zeros((1, 6, 6, e), jnp.float32).at[0, 0, 0, :].set(1.0)
    wk = jnp.ones((3, 3, 1, e), jnp.float32)
    s = jnp.ones(e, jnp.float32)
    b = jnp.zeros(e, jnp.float32)
    got_v, _ = mbconv_pallas.fused_mbconv_inner(u, wk, s, b, s, b,
                                                interpret=True)
    ref_v, _ = _oracle(u, wk, s, b, s, b)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               atol=1e-6)
