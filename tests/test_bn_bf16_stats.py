"""Accuracy bound for bf16 BN batch statistics (the training-MFU lever,
common.GhostBatchNorm.bf16_stats / EfficientNetV2.bn_bf16_stats).

flax's default BatchNorm upcasts every activation to f32 for the mean/var
reductions (force_float32_reductions); the lever computes them in the
compute dtype instead. These tests bound the numeric cost: normalized
outputs and updated running statistics must stay within bf16 resolution of
the f32-stat reference on realistic activation scales.
"""

import numpy as np
import jax
import jax.numpy as jnp

from metrabs_tpu.models.backbones import common


def _run(bf16_stats, x):
    bn = common.batch_norm(0.9, 1e-3, jnp.bfloat16, 'n',
                           bf16_stats=bf16_stats)
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, mutated = bn.apply(variables, x, train=True, mutable=['batch_stats'])
    return (np.asarray(y, np.float32),
            jax.tree_util.tree_map(np.asarray, mutated['batch_stats']))


def test_bf16_stats_matches_f32_within_bf16_resolution():
    rng = np.random.default_rng(0)
    # Conv-activation-like scales: O(1) with nonzero mean.
    x = jnp.asarray(rng.normal(0.5, 1.5, size=(16, 8, 8, 32)), jnp.bfloat16)
    y32, stats32 = _run(False, x)
    y16, stats16 = _run(True, x)
    # Normalized outputs are O(1); bf16 has ~3 decimal digits. Measured
    # deltas: mean 2.4e-4, var 1.6e-3, y 0.031 (one bf16 ulp at O(1)).
    np.testing.assert_allclose(y16, y32, atol=0.05, rtol=0.05)
    np.testing.assert_allclose(stats16['bn']['mean'],
                               stats32['bn']['mean'], atol=0.02)
    np.testing.assert_allclose(stats16['bn']['var'],
                               stats32['bn']['var'], rtol=0.03, atol=0.02)


def test_bf16_stats_identical_variable_tree():
    x = jnp.zeros((4, 8, 8, 16), jnp.bfloat16)
    v32 = common.batch_norm(0.9, 1e-3, jnp.bfloat16, 'n').init(
        jax.random.PRNGKey(0), x, train=True)
    v16 = common.batch_norm(0.9, 1e-3, jnp.bfloat16, 'n',
                            bf16_stats=True).init(
        jax.random.PRNGKey(0), x, train=True)
    t32 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v32)
    t16 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v16)
    assert t32 == t16


def test_bf16_stats_inference_unaffected():
    """Inference uses the f32 running averages either way — outputs must be
    bitwise identical between the two settings."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)), jnp.bfloat16)
    bn32 = common.batch_norm(0.9, 1e-3, jnp.bfloat16, 'n')
    v = bn32.init(jax.random.PRNGKey(0), x, train=False)
    out32 = bn32.apply(v, x, train=False)
    out16 = common.batch_norm(0.9, 1e-3, jnp.bfloat16, 'n',
                              bf16_stats=True).apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out32), np.asarray(out16))
