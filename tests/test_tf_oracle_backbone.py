"""Real-TF validation of the checkpoint reader, the weight importer, and the
flax EfficientNetV2 — against TensorFlow itself and the reference's own
EffNetV2 fork, executed (TF 2.21 + legacy Keras are installed here).

Three layers of evidence, strongest last:
 1. io/tf_checkpoint.load_tf_checkpoint reproduces tf.train.load_checkpoint
    byte-for-byte on a checkpoint TensorFlow actually wrote (incl. the
    object-graph full_name remapping the ROADMAP flagged as unvalidated).
 2. import_effnetv2_from_tf consumes that real checkpoint: every flax
    parameter lands with the exact value of the corresponding fork variable.
 3. Forward-activation parity: the imported flax EfficientNetV2-S (and the
    -stride16 dilated/bottom-right-shift variant, SURVEY §7's #4 silent-mm-
    error source) matches the executed reference fork's feature maps on
    shared random weights. Weights are fan-in-scaled and every forward test
    asserts input sensitivity of the oracle output — with under-scaled
    weights a deep net's output becomes exactly input-independent and the
    parity assertion silently degenerates to bias propagation. Inputs follow
    the deployment composition: our modules take [0,1] crops (preproc
    inside), the TF oracle gets the preproc'd tensor.

Reference cites: `metrabs_tf/backbones/efficientnet/effnetv2_model.py`
(fork), `metrabs_pytorch/convert_model_from_tf.py:89-202` (name space),
`metrabs_tf/backbones/builder.py:52-63` (set_batchnorm + get_model usage).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax
import jax.numpy as jnp

from tests import _reference_oracle

from metrabs_tpu.io import tf_checkpoint as tc
from metrabs_tpu.io import weights_import as wi

pytestmark = [pytest.mark.oracle, pytest.mark.skipif(
    not tf.keras.__name__.startswith('tf_keras'),
    reason='reference EffNetV2 fork requires legacy Keras 2 '
           '(TF_USE_LEGACY_KERAS=1 before first tf import)')]


def get_fork_modules():
    """Plain-function core of the `fork_modules` fixture so other oracle
    test modules (tests/test_full_model_oracle.py) can share it."""
    _reference_oracle._install_stubs()
    if _reference_oracle.REF_ROOT not in sys.path:
        sys.path.append(_reference_oracle.REF_ROOT)
    # The forks do a bare `import keras` and expect Keras 2 internals (their
    # environment.yml pins TF 2.x); alias it to tf_keras.src (the legacy
    # keras-2 package layout: keras.layers.VersionAwareLayers,
    # keras.applications.imagenet_utils, ...) BEFORE the fork imports,
    # otherwise BatchNormalization subclasses Keras 3 and the BN variables
    # silently vanish from model.variables.
    if 'metrabs_tf.backbones.efficientnet.effnetv2_utils' not in sys.modules:
        import tf_keras
        sys.modules['keras'] = tf_keras.src
    from metrabs_tf.backbones.efficientnet import (  # noqa: PLC0415
        effnetv2_model, effnetv2_utils)
    # The reference builder configures the BN class before model construction
    # (`metrabs_tf/backbones/builder.py:52-63`).
    effnetv2_utils.set_batchnorm(effnetv2_utils.BatchNormalization)
    return effnetv2_model, effnetv2_utils


@pytest.fixture(scope='module')
def fork_modules():
    return get_fork_modules()


# Kernel scale as a fraction of He init. Measured tradeoff on the executed
# efficientnetv2-s fork (128px):
#   gain 1.0: chaotic — activations explode (|out| ~1.6e6) and a 1e-6 input
#             perturbation decorrelates the output (rel err 0.61), so any two
#             CORRECT implementations disagree at O(1);
#   gain 0.8: input sensitivity 6.3e-2, fp-noise amplification 6.4e-7,
#             flax-vs-fork rel err 1.2e-6 — signal propagates, noise doesn't;
#   gain 0.5: input sensitivity collapses to 7e-6 (vacuous-test regime).
# The window is DEPTH-dependent: at efficientnetv2-l's 79 blocks gain 0.8
# is already chaotic (noise amplification 2.1e-2, so a correct
# implementation "fails" at ~2% — measured), while 0.7 gives noise 4.2e-7
# with input sensitivity 1.8e-3. _gain_for() picks per family.
_KERNEL_GAIN = 0.8


def _gain_for(name):
    return 0.7 if name.startswith('efficientnetv2-l') else _KERNEL_GAIN


def _randomize_variables(model, rng, gain=None):
    """No special values anywhere: randomizes every variable (incl. BN
    moving stats and betas) so swapped gamma/beta or mean/var mappings
    cannot hide behind the 0/1 initialization.

    Kernel scales are fan-in-matched at `_KERNEL_GAIN` x He init: a flat
    0.05 scale makes deep nets EXACTLY input-independent at the output (the
    per-layer signal contraction drops the input contribution below f32
    resolution relative to the bias/BN-driven component within ~10 blocks —
    measured |f(x)-f(0)| == 0.0 on efficientnetv2-s), which silently turns
    forward-parity tests into bias-propagation tests; full He init is
    chaotic (see _KERNEL_GAIN). Forward tests additionally assert input
    sensitivity via `_assert_input_sensitive`."""
    if gain is None:
        gain = _KERNEL_GAIN
    for v in model.variables:
        shape = tuple(v.shape)
        name = v.name
        if v.dtype != tf.float32:
            continue  # rng StateVars etc.
        if 'moving_variance' in name:
            val = rng.uniform(0.8, 1.2, size=shape)
        elif 'moving_mean' in name:
            val = rng.normal(size=shape) * 0.05
        elif 'gamma' in name:
            val = rng.uniform(0.9, 1.1, size=shape)
        elif 'beta' in name:
            val = rng.normal(size=shape) * 0.05
        elif 'bias' in name:
            # Large enough that SE sigmoid gates vary off 0.5.
            val = rng.normal(size=shape) * 0.5
        elif len(shape) == 4:
            fan_in = (shape[0] * shape[1] if 'depthwise' in name
                      else shape[0] * shape[1] * shape[2])
            val = rng.normal(size=shape) * gain * np.sqrt(2.0 / fan_in)
        elif len(shape) == 2:
            val = rng.normal(size=shape) * gain * np.sqrt(2.0 / shape[0])
        else:
            val = rng.normal(size=shape) * 0.05
        v.assign(val.astype(np.float32))


def _assert_input_sensitive(fwd, x, scale):
    """Guards forward-parity tests against the vacuous regime: the oracle
    output must actually depend on the input image."""
    other = fwd(np.roll(x, 7, axis=2) * 0.7 + 0.1)
    sensitivity = np.abs(np.asarray(other) - np.asarray(fwd(x))).max()
    assert sensitivity > 1e-3 * scale, (
        f'oracle forward is input-insensitive (delta {sensitivity}, scale '
        f'{scale}) - randomization collapsed, parity test would be vacuous')


_FORK_CACHE = {}


def _build_fork(fork_modules, name, rng):
    """One fork model per name per module run. clear_session() resets Keras's
    name-uniquification counters — otherwise a second build in the same
    process names its layers stem_1/head_1 and the full names no longer
    match the checkpoint name space."""
    if name in _FORK_CACHE:
        return _FORK_CACHE[name]
    effnetv2_model, _ = fork_modules
    tf.keras.backend.clear_session()
    model = effnetv2_model.get_model(name, include_top=False, pretrained=False)
    assert any(v.name.startswith(f'{name.split("-stride")[0]}/stem/')
               for v in model.variables), 'keras name-scope counters dirty'
    _randomize_variables(model, rng, gain=_gain_for(name))
    _FORK_CACHE[name] = model
    return model


def _flax_from_fork(model, backbone_name, x):
    """Builds our flax backbone, imports the fork's variables by NAME (the
    same name space a real released checkpoint yields after full_name
    remapping), and returns (apply_fn_output, imported_variables)."""
    from metrabs_tpu.models.backbones.builder import build_backbone

    tf_vars = {v.name.split(':')[0]: v.numpy() for v in model.variables}
    # Import lands in the flat (unscanned) layout; production models convert
    # with io/scan_convert.flat_to_scanned (output-equivalence pinned by
    # tests/test_scan_convert.py).
    bb = build_backbone(backbone_name, dtype=jnp.float32, scan_blocks=False)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    wrapped = {'params': {'backbone': variables['params']},
               'batch_stats': {'backbone': variables.get('batch_stats', {})}}
    imported = wi.import_effnetv2_from_tf(tf_vars, wrapped, backbone_name)
    apply_vars = {'params': imported['params']['backbone'],
                  'batch_stats': imported['batch_stats']['backbone']}
    out = bb.apply(apply_vars, jnp.asarray(x), train=False)
    return np.asarray(out), imported


def test_reader_matches_tf_reader_on_real_checkpoint(
        fork_modules, tmp_path, rng):
    """Layer 1: byte-exact agreement with TF's own reader on a checkpoint
    written by tf.train.Checkpoint, and full_name remapping to the Keras
    variable names (`tf_checkpoint.py:207-234`)."""
    model = _build_fork(fork_modules, 'efficientnetv2-s', rng)
    prefix = str(tmp_path / 'real_ckpt')
    tf.train.Checkpoint(model=model).write(prefix)

    reader = tf.train.load_checkpoint(prefix)
    entries = tc.read_index_entries(prefix + '.index')
    entries.pop(b'')
    with open(prefix + '.data-00000-of-00001', 'rb') as f:
        shard = f.read()
    n_checked = 0
    for key in reader.get_variable_to_shape_map():
        want = reader.get_tensor(key)
        if not isinstance(want, np.ndarray) or want.dtype == object:
            continue  # the object-graph string tensor
        e = tc._parse_bundle_entry(entries[key.encode()])
        got = np.frombuffer(
            shard[e['offset']:e['offset'] + e['size']],
            want.dtype).reshape(e['shape'])
        np.testing.assert_array_equal(got, want, err_msg=key)
        n_checked += 1
    assert n_checked > 200  # effnetv2-s has 230 model variables

    # full_name remapping: load_tf_checkpoint keys tensors by the original
    # Keras variable names, exactly what the import mappings consume.
    loaded = tc.load_tf_checkpoint(prefix)
    for v in model.variables:
        name = v.name.split(':')[0]
        assert name in loaded, f'full_name {name} not recovered'
        np.testing.assert_array_equal(loaded[name], v.numpy(), err_msg=name)


def test_import_from_real_checkpoint_lands_exact_values(
        fork_modules, tmp_path, rng):
    """Layer 2: the full chain real-ckpt -> load_tf_checkpoint ->
    import_effnetv2_from_tf places every fork variable at the right flax
    parameter (validated via the mapping's own inverse transform)."""
    import flax

    model = _build_fork(fork_modules, 'efficientnetv2-s', rng)
    prefix = str(tmp_path / 'real_ckpt')
    tf.train.Checkpoint(model=model).write(prefix)
    tf_vars = tc.load_tf_checkpoint(prefix)

    from metrabs_tpu.models.backbones.builder import build_backbone
    bb = build_backbone('efficientnetv2-s', dtype=jnp.float32,
                        scan_blocks=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    wrapped = {'params': {'backbone': variables['params']},
               'batch_stats': {'backbone': variables.get('batch_stats', {})}}
    imported = wi.import_effnetv2_from_tf(tf_vars, wrapped, 'efficientnetv2-s')

    pairs = wi.import_effnetv2_from_tf(None, wrapped, 'efficientnetv2-s')
    flat = flax.traverse_util.flatten_dict(imported, sep='/')
    fork_by_name = {v.name.split(':')[0]: v.numpy() for v in model.variables}
    for path, tf_name, transform in pairs:
        want = fork_by_name[tf_name]
        if transform is not None:
            want = transform(want)
        np.testing.assert_array_equal(
            np.asarray(flat[path]), want, err_msg=f'{path} <- {tf_name}')


@pytest.fixture(scope='module')
def mnv3_fork_module(fork_modules):
    """The reference MobileNetV3 fork (keras-applications fork with the
    centered_stride/bottomright extension, `backbones/mobilenet_v3.py`).
    Reuses fork_modules for the keras->tf_keras.src alias."""
    from metrabs_tf.backbones import mobilenet_v3  # noqa: PLC0415
    return mobilenet_v3


def _build_mnv3_fork(mnv3_fork_module, variant, rng, minimalistic=False):
    key = f'mnv3-{variant}-{minimalistic}'
    if key in _FORK_CACHE:
        return _FORK_CACHE[key]
    tf.keras.backend.clear_session()
    cls = getattr(mnv3_fork_module, f'MobileNetV3{variant.capitalize()}')
    # centered_stride=True is the reference training default
    # (`backbones/builder.py:66-80` passes FLAGS.centered_stride).
    model = cls(include_top=False, weights=None, minimalistic=minimalistic,
                input_shape=(None, None, 3), centered_stride=True,
                pooling=None)
    _randomize_variables(model, rng)
    _FORK_CACHE[key] = model
    return model


@pytest.mark.parametrize('variant', ['large', 'small'])
def test_mobilenetv3_forward_parity_vs_executed_fork(
        fork_modules, mnv3_fork_module, rng, variant):
    """Forward parity of the flax MobileNetV3 + its TF import mapping against
    the executed reference fork (shared random weights, centered stride)."""
    import flax

    from metrabs_tpu.models.backbones.builder import build_backbone

    model = _build_mnv3_fork(mnv3_fork_module, variant, rng)
    # Deployment composition (`backbones/builder.py:78-83,116-117`): the crop
    # pipeline emits [0,1] RGB, mobilenet_preproc scales by 255 and the fork
    # model's internal Rescaling(1/127.5, -1) finishes the normalization. Our
    # flax module does the whole composition from [0,1].
    x = rng.uniform(0.0, 1.0, size=(1, 128, 128, 3)).astype(np.float32)
    fwd = lambda z: model(tf.constant(255.0 * z.astype(np.float32)),
                          training=False).numpy()
    want = fwd(x)

    tf_vars = {v.name.split(':')[0]: v.numpy() for v in model.variables}
    bb = build_backbone(f'mobilenetv3-{variant}', dtype=jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    wrapped = {'params': {'backbone': variables['params']},
               'batch_stats': {'backbone': variables.get('batch_stats', {})}}
    imported = wi.import_mobilenetv3_from_tf(tf_vars, wrapped)
    apply_vars = {'params': imported['params']['backbone'],
                  'batch_stats': imported['batch_stats']['backbone']}
    got = np.asarray(bb.apply(apply_vars, jnp.asarray(x), train=False))

    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max()
    assert scale > 0
    _assert_input_sensitive(fwd, x, scale)
    np.testing.assert_allclose(got, want, atol=1e-3 * max(scale, 1.0), rtol=1e-3)

    # Full mapping coverage of the flax tree (no silently random params).
    pairs = wi.import_mobilenetv3_from_tf(None, wrapped)
    mapped = {p for p, _, _ in pairs}
    flat = flax.traverse_util.flatten_dict(wrapped, sep='/')
    missing = sorted(k for k in flat if k not in mapped)
    assert not missing, missing[:8]


@pytest.mark.parametrize('variant', ['resnet50', 'resnet50v2'])
def test_resnet_forward_parity_vs_keras_applications(rng, variant):
    """Forward parity of the flax ResNet + TF import mapping against stock
    tf_keras keras-applications ResNet50/ResNet50V2.

    The reference's fork (`backbones/resnet.py`) keeps keras-applications
    layer naming, and at equal train/test stride 32 WITH centered_stride
    off its fleras Conv2DDenseSame/TrainTestSwitch machinery reduces to the
    stock graph (the test-time pads/crops at resnet.py:189-190,417-431 only
    activate when stride_test differs) — so the stock model is a faithful
    executable oracle for centered_stride=False. With centered_stride=True
    (the training default) the fork bottom-right-shifts the LAST strided
    stage even at stride 32 (`resnet.py:601-606`: brs[i_last_strided]=True),
    which stock keras cannot express — the br path is covered against the
    executed EffNetV2 fork instead (test_effnetv2_forward_parity, -stride16)
    and by the flax-level striding unit tests. fleras itself is unavailable
    here, which keeps the dilated fork variants oracle-blocked (documented
    in PARITY.md)."""
    import flax
    # Explicit submodule imports: tf_keras.src.applications does not load
    # its submodules lazily via attribute access.
    from tf_keras.src.applications import resnet as keras_resnet
    from tf_keras.src.applications import resnet_v2 as keras_resnet_v2

    from metrabs_tpu.models.backbones.builder import build_backbone

    tf.keras.backend.clear_session()
    if variant == 'resnet50':
        cls = keras_resnet.ResNet50
    else:
        cls = keras_resnet_v2.ResNet50V2
    model = cls(include_top=False, weights=None, input_shape=(None, None, 3))
    _randomize_variables(model, rng)

    # Deployment composition (`backbones/builder.py:41-48,105-112`): [0,1]
    # crops go through caffe_preproc (V1) / tf_preproc (V2) before the stock
    # keras graph; our flax ResNet applies the same preproc internally.
    x = rng.uniform(0.0, 1.0, size=(1, 128, 128, 3)).astype(np.float32)
    if variant == 'resnet50':
        mean_rgb = np.array([103.939, 116.779, 123.68], np.float32)
        preproc = lambda z: 255.0 * z.astype(np.float32) - mean_rgb
    else:
        preproc = lambda z: 2.0 * z.astype(np.float32) - 1.0
    fwd = lambda z: model(tf.constant(preproc(z)), training=False).numpy()
    want = fwd(x)

    tf_vars = {v.name.split(':')[0]: v.numpy() for v in model.variables}
    bb = build_backbone(variant, dtype=jnp.float32, centered_stride=False)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    wrapped = {'params': {'backbone': variables['params']},
               'batch_stats': {'backbone': variables.get('batch_stats', {})}}
    imported = wi.import_resnet_from_tf(tf_vars, wrapped)
    apply_vars = {'params': imported['params']['backbone'],
                  'batch_stats': imported['batch_stats']['backbone']}
    got = np.asarray(bb.apply(apply_vars, jnp.asarray(x), train=False))

    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max()
    assert scale > 0
    _assert_input_sensitive(fwd, x, scale)
    np.testing.assert_allclose(got, want, atol=1e-3 * max(scale, 1.0), rtol=1e-3)

    pairs = wi.import_resnet_from_tf(None, wrapped)
    mapped = {p for p, _, _ in pairs}
    flat = flax.traverse_util.flatten_dict(wrapped, sep='/')
    missing = sorted(k for k in flat if k not in mapped)
    assert not missing, missing[:8]


@pytest.mark.parametrize('name', ['efficientnetv2-s', 'efficientnetv2-s-stride16',
                                  'efficientnetv2-s-stride8',
                                  'efficientnetv2-s-stride4',
                                  'efficientnetv2-m', 'efficientnetv2-l',
                                  'efficientnetv2-l-stride16'])
def test_effnetv2_forward_parity_vs_executed_fork(fork_modules, rng, name):
    """Layer 3: feature-map parity with the executed reference fork on shared
    random weights. The -stride16 variant exercises the dilated blocks and
    the centered-stride bottom-right shift (`effnetv2_model.py:296-427`),
    SURVEY §7's top silent-mm-error candidate."""
    model = _build_fork(fork_modules, name, rng)
    # Deployment composition (`backbones/builder.py:18-20,64`): the fork sees
    # tf_preproc'd input (2x-1); our flax module takes the [0,1] crop and
    # applies the preproc internally.
    x = rng.uniform(0.0, 1.0, size=(1, 128, 128, 3)).astype(np.float32)
    fwd = lambda z: model(
        tf.constant(2.0 * z.astype(np.float32) - 1.0), training=False).numpy()
    want = fwd(x)
    got, _ = _flax_from_fork(model, name, x)
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max()
    assert scale > 0
    _assert_input_sensitive(fwd, x, scale)
    np.testing.assert_allclose(got, want, atol=1e-3 * max(scale, 1.0), rtol=1e-3)
