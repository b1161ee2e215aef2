"""Backbone shape/param-structure tests (CPU, small inputs, float32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.models.backbones.builder import build_backbone

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles (fast-tier durations r5); smoke tier = -m 'not oracle and not slow'



def _init_and_run(name, size=64, train=False):
    bb = build_backbone(name, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, size, size, 3)),
                    jnp.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
                        x, train=False)
    y = bb.apply(variables, x, train=False)
    return y, variables


@pytest.mark.parametrize('name,channels', [
    ('mobilenetv3-small', 1024),
    ('mobilenetv3-large', 1280),
])
def test_mobilenet_output_shape(name, channels):
    y, _ = _init_and_run(name, size=64)
    assert y.shape == (2, 2, 2, channels)


def test_efficientnetv2_s_output_shape():
    y, _ = _init_and_run('efficientnetv2-s', size=64)
    assert y.shape == (2, 2, 2, 1280)


def test_efficientnetv2_xl_output_shape():
    y, _ = _init_and_run('efficientnetv2-xl', size=64)
    assert y.shape == (2, 2, 2, 1280)


def test_efficientnetv2_stride16_resolution():
    y, _ = _init_and_run('efficientnetv2-s-stride16', size=64)
    assert y.shape == (2, 4, 4, 1280)


@pytest.mark.parametrize('name,channels', [
    ('resnet18', 512),
    ('resnet50', 2048),
    ('resnet50v2', 2048),
    ('resnet50v1-5', 2048),
])
def test_resnet_output_shapes(name, channels):
    y, _ = _init_and_run(name, size=64)
    assert y.shape == (2, 2, 2, channels)


def test_resnet_stride16():
    y, _ = _init_and_run('resnet18-stride16', size=64)
    assert y.shape == (2, 4, 4, 512)


def test_finite_outputs():
    y, _ = _init_and_run('efficientnetv2-s', size=64)
    assert np.all(np.isfinite(np.asarray(y)))


def test_effnet_param_count_matches_family():
    # EffNetV2-S should have ~20.3M backbone params (without classifier).
    _, variables = _init_and_run('efficientnetv2-s', size=64)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables['params']))
    assert 19e6 < n < 22e6, n


def test_resnet50_param_count():
    # ResNet-50 feature extractor is ~23.5M params.
    _, variables = _init_and_run('resnet50', size=64)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables['params']))
    assert 22e6 < n < 26e6, n


def test_mobilenet_small_param_count():
    # MobileNetV3-Small feature extractor is ~1.5M params (no top).
    _, variables = _init_and_run('mobilenetv3-small', size=64)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables['params']))
    assert 1.2e6 < n < 2.2e6, n


def test_batch_stats_updated_in_train_mode():
    bb = build_backbone('mobilenetv3-small', dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 64, 64, 3)),
                    jnp.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    y, mutated = bb.apply(
        variables, x, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(2)})
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestTrainTestStrideSwitch:
    """stride_train != stride_test (the fleras TrainTestSwitchLayer recipe,
    `resnet.py:31-32`, `docs/TRAINING.md:17-23`): one parameter tree serves
    the strided training plan and the dilated test plan."""

    def test_resnet_stride_switch_shapes_and_params(self, rng):
        from metrabs_tpu.models.backbones.builder import build_backbone
        bb = build_backbone('resnet18', stride_test=16, dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x, train=True)
        out_train, _ = bb.apply(variables, x, train=True,
                                mutable=['batch_stats'])
        out_test = bb.apply(variables, x, train=False)
        assert out_train.shape[1:3] == (2, 2)    # stride 32
        assert out_test.shape[1:3] == (4, 4)     # stride 16
        assert np.all(np.isfinite(np.asarray(out_test)))
        # Param tree must be identical regardless of the init-time plan.
        variables_t = bb.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables_t)

    def test_effnetv2_stride_switch_shapes_and_params(self, rng):
        from metrabs_tpu.models.backbones.builder import build_backbone
        bb = build_backbone('efficientnetv2-s', stride_test=16,
                            dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
        variables = bb.init(jax.random.PRNGKey(0), x, train=True)
        out_train, _ = bb.apply(variables, x, train=True,
                                mutable=['batch_stats'],
                                rngs={'dropout': jax.random.PRNGKey(1)})
        out_test = bb.apply(variables, x, train=False)
        assert out_train.shape[1:3] == (2, 2)    # stride 32
        assert out_test.shape[1:3] == (4, 4)     # stride 16
        assert np.all(np.isfinite(np.asarray(out_test)))
        variables_t = bb.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables_t)

    def test_stride_test_rejected_for_mobilenet(self):
        from metrabs_tpu.models.backbones.builder import build_backbone
        with pytest.raises(ValueError):
            build_backbone('mobilenetv3-small', stride_test=16)


def test_resnet18_groupnorm_no_batch_stats():
    # Basic blocks honor use_group_norm too (`metrabs_tf/backbones/
    # resnet.py:674-693` stack1_basic_dense): no BatchNorm anywhere.
    y, variables = _init_and_run('resnet18-groupnorm', size=64)
    assert y.shape == (2, 2, 2, 512)
    assert 'batch_stats' not in variables


def test_resnet50_groupnorm_variant():
    # The reference ships resnet50v1_5_groupnorm weights: GroupNorm replaces
    # BatchNorm (no batch_stats, 'gn' params) and convs drop their bias
    # (`metrabs_tf/backbones/resnet.py:260-270`).
    y, variables = _init_and_run('resnet50v1-5-groupnorm', size=64)
    assert y.shape == (2, 2, 2, 2048)
    assert np.all(np.isfinite(np.asarray(y)))
    assert 'batch_stats' not in variables
    flat = jax.tree_util.tree_leaves_with_path(variables['params'])
    keys = ['/'.join(str(getattr(k, 'key', k)) for k in path)
            for path, _ in flat]
    assert any('gn' in k and 'scale' in k for k in keys)
    assert not any('bias' in k and 'conv' in k for k in keys)
    # Same layer topology as the BN variant, norm layers aside.
    _, v_bn = _init_and_run('resnet50v1-5', size=64)
    n_convs = sum(1 for k in keys if 'kernel' in k)
    flat_bn = jax.tree_util.tree_leaves_with_path(v_bn['params'])
    keys_bn = ['/'.join(str(getattr(k, 'key', k)) for k in path)
               for path, _ in flat_bn]
    assert n_convs == sum(1 for k in keys_bn if 'kernel' in k)
    # V2 (preact) hard-codes BatchNorm in the reference; reject the combo.
    with pytest.raises(ValueError):
        build_backbone('resnet50v2-groupnorm')


@pytest.mark.parametrize('name', [
    'efficientnetv2-s', 'resnet18', 'mobilenetv3-small'])
def test_remat_identical_params_and_outputs(name):
    """remat=True must be a pure autodiff-memory change: same parameter
    tree, bit-identical forward, matching gradients (jax.checkpoint
    semantics)."""
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 64, 64, 3)),
                    jnp.float32)
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    bb = build_backbone(name, dtype=jnp.float32)
    bb_r = build_backbone(name, dtype=jnp.float32, remat=True)
    v = bb.init(rngs, x, train=False)
    v_r = bb_r.init(rngs, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_r))
    y = bb.apply(v, x, train=False)
    y_r = bb_r.apply(v_r, x, train=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_r))

    def loss(variables, module):
        out, _ = module.apply(variables, x, train=True,
                              rngs={'dropout': jax.random.PRNGKey(2)},
                              mutable=['batch_stats'])
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(v, bb)
    g_r = jax.grad(loss)(v_r, bb_r)
    chex = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g['params'], g_r['params'])
    del chex


def test_partial_remat_boundary_identical_params_and_outputs():
    """remat_until_block (the conv-workload remat-policy lever: remat only
    the memory-dominant early high-res blocks) must also be a pure autodiff
    change: same parameter tree, bit-identical forward, matching grads vs
    full remat."""
    from metrabs_tpu.models.backbones.efficientnet_v2 import EfficientNetV2

    x = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 64, 64, 3)),
                    jnp.float32)
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    kw = dict(model_name='efficientnetv2-s', dtype=jnp.float32,
              scan_blocks=True, remat=True)
    bb_full = EfficientNetV2(**kw)
    bb_part = EfficientNetV2(**kw, remat_until_block=10)
    v = bb_full.init(rngs, x, train=False)
    v_p = bb_part.init(rngs, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_p))
    np.testing.assert_array_equal(
        np.asarray(bb_full.apply(v, x, train=False)),
        np.asarray(bb_part.apply(v_p, x, train=False)))

    def loss(variables, module):
        out, _ = module.apply(variables, x, train=True,
                              rngs={'dropout': jax.random.PRNGKey(2)},
                              mutable=['batch_stats'])
        return (out.astype(jnp.float32) ** 2).mean()

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        jax.grad(loss)(v, bb_full)['params'],
        jax.grad(loss)(v_p, bb_part)['params'])


@pytest.mark.parametrize('kernel', [1, 3])
def test_dense_same_conv_bottomright_sampling(kernel):
    """Pins the bottom-right-shift sampling grid of DenseSameConv — the
    centered-stride machinery the reference applies to the LAST strided
    stage even at stride 32 (`resnet.py:601-606`: brs[i_last_strided]).

    With an identity (delta) kernel, a strided conv is pure subsampling:
    br=False must pick input rows/cols (0, 2, 4, ...) (stock keras SAME
    alignment for even sizes) and br=True must pick (1, 3, 5, ...). For
    kernel=1 the shift exercises the negative-padding crop-begin path
    (`models/backbones/resnet.py:72-77`); the same fixed_padding_amounts
    helper drives the (fork-oracled) EffNetV2 br blocks."""
    from metrabs_tpu.models.backbones.resnet import DenseSameConv

    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, :, :, 0] = np.arange(64).reshape(8, 8)
    for br, want_start in [(False, 0), (True, 1)]:
        conv = DenseSameConv(features=1, kernel=kernel, stride=2,
                             bottomright=br, use_bias=False,
                             dtype=jnp.float32)
        v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        k = np.zeros((kernel, kernel, 1, 1), np.float32)
        k[kernel // 2, kernel // 2, 0, 0] = 1.0  # delta at the tap center
        v = {'params': {'conv': {'kernel': jnp.asarray(k)}}}
        y = np.asarray(conv.apply(v, jnp.asarray(x)))[0, :, :, 0]
        want = x[0, want_start::2, want_start::2, 0]
        np.testing.assert_array_equal(y, want, err_msg=f'br={br} k={kernel}')
