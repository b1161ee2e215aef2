"""TF checkpoint reader + TF-name weight import: hermetic round-trips.

The TensorBundle reader is validated against this module's own writer (same
format); the family mappings are validated for coverage and value wiring by
synthesizing a TF variable dict from the mapping inventory, writing it
through a real bundle file, loading it back and importing. The TF-side layer
NAMES themselves are transcriptions of the reference fork's naming
(`convert_model_from_tf.py:101-202`, `backbones/resnet.py:170-515`,
`backbones/mobilenet_v3.py:266-548`) and can only be end-to-end validated
against real released files (zero-egress here).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metrabs_tpu.io import tf_checkpoint as tc
from metrabs_tpu.io import weights_import as wi

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles (fast-tier durations r5); smoke tier = -m 'not oracle and not slow'



class TestBundleFormat:

    def test_roundtrip_dtypes_and_shapes(self, tmp_path, rng):
        prefix = str(tmp_path / 'ckpt')
        tensors = {
            'a/kernel': rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
            'a/bias': rng.normal(size=(8,)).astype(np.float32),
            'step': np.array(123456789, np.int64),
            'flags': np.array([True, False, True]),
            'h': rng.normal(size=(5,)).astype(np.float16),
            'big': rng.normal(size=(300, 200)).astype(np.float32),
        }
        tc.write_tf_checkpoint(prefix, tensors)
        loaded = tc.load_tf_checkpoint(prefix)
        assert sorted(loaded) == sorted(tensors)
        for k, v in tensors.items():
            assert loaded[k].shape == v.shape
            np.testing.assert_array_equal(loaded[k], v)

    def test_object_graph_suffix_stripped(self, tmp_path):
        prefix = str(tmp_path / 'ckpt')
        tc.write_tf_checkpoint(prefix, {
            'model/w/.ATTRIBUTES/VARIABLE_VALUE': np.ones(3, np.float32)})
        loaded = tc.load_tf_checkpoint(prefix)
        assert list(loaded) == ['model/w']

    def test_bad_magic_rejected(self, tmp_path):
        path = tmp_path / 'junk.index'
        path.write_bytes(b'\x00' * 64)
        with pytest.raises(ValueError):
            tc.read_index_entries(str(path))


def _inverse_transform(pairs, path, value):
    """Builds the TF-side array whose import should land `value` at `path`."""
    for p, tf_name, transform in pairs:
        if p == path:
            if transform is wi._dw:
                return tf_name, np.transpose(value, (0, 1, 3, 2))
            return tf_name, value
    raise KeyError(path)


def _roundtrip_family(tmp_path, rng, backbone_name, build_kwargs=None):
    from metrabs_tpu.models.backbones.builder import build_backbone
    import flax

    bb = build_backbone(backbone_name, dtype=jnp.float32,
                        **(build_kwargs or {}))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    variables = {'params': {'backbone': variables['params']},
                 'batch_stats': {'backbone': variables.get('batch_stats', {})}}
    flat = flax.traverse_util.flatten_dict(variables, sep='/')

    pairs = wi.import_backbone_from_tf(None, variables, backbone_name)
    mapped_paths = {p for p, _, _ in pairs}
    # Coverage: every backbone param/stat must be covered by the mapping.
    missing = sorted(k for k in flat if k not in mapped_paths)
    assert not missing, f'unmapped flax params: {missing[:8]}'

    # Synthesize TF values that should land exactly (via a real bundle file).
    # BN variances must be positive or the forward sanity check NaNs.
    targets = {
        p: (rng.uniform(0.5, 1.5, size=np.asarray(flat[p]).shape)
            if p.endswith('/var')
            else rng.normal(size=np.asarray(flat[p]).shape) * 0.05)
        .astype(np.float32) for p in flat}
    tf_tensors = {}
    for p, value in targets.items():
        tf_name, tf_value = _inverse_transform(pairs, p, value)
        tf_tensors[tf_name] = tf_value
    prefix = str(tmp_path / 'ckpt')
    tc.write_tf_checkpoint(prefix, tf_tensors)
    tf_vars = tc.load_tf_checkpoint(prefix)

    imported = wi.import_backbone_from_tf(tf_vars, variables, backbone_name)
    flat_out = flax.traverse_util.flatten_dict(imported, sep='/')
    for p, value in targets.items():
        np.testing.assert_array_equal(np.asarray(flat_out[p]), value, err_msg=p)
    # The imported model must still run. The groupnorm variant has no
    # batch_stats collection at all.
    apply_vars = {'params': imported['params']['backbone']}
    stats = imported.get('batch_stats', {}).get('backbone', {})
    if stats:
        apply_vars['batch_stats'] = stats
    out = bb.apply(apply_vars, x, train=False)
    assert np.all(np.isfinite(np.asarray(out)))


class TestTFFamilyImports:

    def test_resnet50_roundtrip(self, tmp_path, rng):
        _roundtrip_family(tmp_path, rng, 'resnet50')

    def test_resnet18_roundtrip(self, tmp_path, rng):
        _roundtrip_family(tmp_path, rng, 'resnet18')

    def test_resnet50v2_roundtrip(self, tmp_path, rng):
        _roundtrip_family(tmp_path, rng, 'resnet50v2')

    def test_resnet18_groupnorm_roundtrip(self, tmp_path, rng):
        # Basic blocks honor GroupNorm too (stack1_basic_dense,
        # `metrabs_tf/backbones/resnet.py:674-693`).
        _roundtrip_family(tmp_path, rng, 'resnet18-groupnorm')

    def test_resnet50v1_5_groupnorm_roundtrip(self, tmp_path, rng):
        # The released resnet50v1_5_groupnorm variant: *_gn gamma/beta
        # layers, biasless convs.
        _roundtrip_family(tmp_path, rng, 'resnet50v1-5-groupnorm')

    def test_mobilenetv3_small_roundtrip(self, tmp_path, rng):
        _roundtrip_family(tmp_path, rng, 'mobilenetv3-small')

    def test_mobilenetv3_large_roundtrip(self, tmp_path, rng):
        _roundtrip_family(tmp_path, rng, 'mobilenetv3-large')

    def test_effnetv2_s_roundtrip(self, tmp_path, rng):
        _roundtrip_family(tmp_path, rng, 'efficientnetv2-s',
                          {'scan_blocks': False})

    def test_metrabs_head_import(self, tmp_path, rng):
        from metrabs_tpu.config import ModelConfig
        from metrabs_tpu.models.backbones.tiny import TinyBackbone
        from metrabs_tpu.models.metrabs import Metrabs
        cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32')
        model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=16,
                                                       dtype=jnp.float32))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               jnp.eye(3)[None])
        import flax
        flat = flax.traverse_util.flatten_dict(variables, sep='/')
        kshape = np.asarray(flat['params/heatmap_heads/conv_final/kernel']).shape
        k = rng.normal(size=kshape).astype(np.float32)
        b = rng.normal(size=kshape[-1]).astype(np.float32)
        prefix = str(tmp_path / 'head')
        tc.write_tf_checkpoint(prefix, {
            'metrabs/metrabs_heads/conv2d/kernel': k,
            'metrabs/metrabs_heads/conv2d/bias': b})
        out = wi.import_metrabs_head_from_tf(
            tc.load_tf_checkpoint(prefix), variables)
        flat_out = flax.traverse_util.flatten_dict(out, sep='/')
        np.testing.assert_array_equal(
            np.asarray(flat_out['params/heatmap_heads/conv_final/kernel']), k)
