"""Full-crop-model END-TO-END parity against the executed TF reference.

The per-op oracles (tests/test_reference_parity.py) and per-backbone oracles
(tests/test_tf_oracle_backbone.py) validate every piece in isolation; these
tests validate the COMPOSITION: the reference's actual `Metrabs` /
`Metro` / `Model25D` keras models are built with the executed EffNetV2-S
fork as the backbone, all weights are shared with our flax models through the
production import path, and the final model outputs (absolute 3D joints in
millimeters) are compared on the same [0,1] crop images + intrinsics.

This closes the remaining composition risks the piecewise oracles cannot see:
head channel layout (2D block then depth-major 3D block), soft-argmax axis
order, heatmap->image/metric offset composition with the backbone's actual
stride alignment, the FOV-border blend inside reconstruct_absolute, and the
latent-decode ordering.

Reference cites: `metrabs_tf/models/metrabs.py:16-106` (Metrabs.call /
MetrabsHeads), `metro.py:13-45` (Metro/Head3D), `twofive.py:14-58`
(Model25D/Head25D; the final bone-length LM solve is oracle-blocked because
tensorflow_graphics is stubbed), `backbones/builder.py:18-20,64` (the
Sequential[preproc, backbone] composition).
"""

from __future__ import annotations

import types

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax
import jax.numpy as jnp

from tests import _reference_oracle
from tests import test_tf_oracle_backbone as tob

from metrabs_tpu.io import weights_import as wi

pytestmark = [pytest.mark.oracle, pytest.mark.skipif(
    not tf.keras.__name__.startswith('tf_keras'),
    reason='reference EffNetV2 fork requires legacy Keras 2 '
           '(TF_USE_LEGACY_KERAS=1 before first tf import)')]

N_JOINTS = 19
PROC_SIDE = 256


@pytest.fixture(scope='module')
def ref():
    return _reference_oracle.load_reference_models()


@pytest.fixture(scope='module')
def fork_modules():
    return tob.get_fork_modules()


@pytest.fixture
def ref_flags(ref):
    """Configures the reference FLAGS for the full-model tests and restores
    the shared namespace afterwards (other oracle modules rely on it)."""
    f = ref.flags
    saved = dict(vars(f))
    f.proc_side = PROC_SIDE
    f.stride_train = 32
    f.stride_test = 32
    f.centered_stride = True
    f.box_size_mm = 2200.0
    f.weak_perspective = False
    f.depth = 8
    f.mix_3d_inside_fov = 0.5
    f.affine_weights = ''
    f.transform_coords = False
    f.predict_all_and_latents = False
    f.regularize_to_manifold = False
    f.backbone = 'efficientnetv2-s'
    yield f
    f.__dict__.clear()
    f.__dict__.update(saved)


def _joint_info(n_joints=N_JOINTS):
    names = [f'joint{i:02d}' for i in range(n_joints)]
    edges = [(i, i + 1) for i in range(n_joints - 1)]
    return types.SimpleNamespace(
        names=names, stick_figure_edges=edges, n_joints=n_joints)


def _ref_backbone(fork_modules, rng):
    """The reference's deployed backbone composition: Sequential[preproc,
    fork] (`backbones/builder.py:18-20`), so the model input is the [0,1]
    crop exactly as for our flax models."""
    fork = tob._build_fork(fork_modules, 'efficientnetv2-s', rng)
    return tf.keras.Sequential(
        [tf.keras.layers.Lambda(lambda t: 2.0 * t - 1.0), fork]), fork


def _randomize_head(conv_layer, features_ref, rng, target_logit_std=2.0):
    """Head conv weights scaled so the decoded heatmaps are PEAKED, not
    uniform: near-uniform heatmaps put every soft-argmax at the volume
    center, where layout bugs (axis swaps, depth-vs-joint interleave) cancel
    out. Kernel std is chosen from the measured feature RMS so logits land
    at ~N(0, target_logit_std)."""
    feat_rms = float(np.sqrt(np.mean(np.square(features_ref)))) or 1.0
    fan_in = int(conv_layer.kernel.shape[2])
    kstd = target_logit_std / (feat_rms * np.sqrt(fan_in))
    conv_layer.kernel.assign(
        rng.normal(size=tuple(conv_layer.kernel.shape)).astype(np.float32)
        * kstd)
    conv_layer.bias.assign(
        (rng.normal(size=tuple(conv_layer.bias.shape)) * 0.3).astype(
            np.float32))


def _intrinsics(batch):
    intr = np.array([[[1200.0, 0.0, PROC_SIDE / 2],
                      [0.0, 1150.0, PROC_SIDE / 2 - 8.0],
                      [0.0, 0.0, 1.0]]], np.float32)
    return np.tile(intr, (batch, 1, 1))


def _images(rng, batch=2):
    return rng.uniform(0.0, 1.0,
                       size=(batch, PROC_SIDE, PROC_SIDE, 3)).astype(
        np.float32)


def _our_variables_from_ref(model, fork, ref_metrabs_head=None,
                            head_key='heatmap_heads', example=None):
    """init our flax model, pull the fork backbone weights through the
    production TF import path, and copy the reference head conv verbatim
    (keras Conv2D kernels are HWIO like flax)."""
    img, intr = example
    if intr is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                               train=False)
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                               jnp.asarray(intr), train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    tf_vars = {v.name.split(':')[0]: v.numpy() for v in fork.variables}
    wrapped = {'params': variables['params'],
               'batch_stats': variables.get('batch_stats', {})}
    imported = wi.import_effnetv2_from_tf(tf_vars, wrapped, 'efficientnetv2-s')
    out = dict(variables)
    out['params'] = dict(imported['params'])
    out['batch_stats'] = dict(imported['batch_stats'])
    if ref_metrabs_head is not None:
        head = dict(out['params'][head_key])
        head['conv_final'] = {
            'kernel': ref_metrabs_head.kernel.numpy(),
            'bias': ref_metrabs_head.bias.numpy()}
        params = dict(out['params'])
        params[head_key] = head
        out['params'] = params
    return out


def _our_cfg(**overrides):
    from metrabs_tpu.config import ModelConfig
    base = dict(proc_side=PROC_SIDE, stride_train=32, stride_test=32,
                centered_stride=True, depth=8, box_size_mm=2200.0,
                mix_3d_inside_fov=0.5, weak_perspective=False,
                n_joints=N_JOINTS, dtype='float32',
                backbone='efficientnetv2-s', backbone_scan_blocks=False)
    base.update(overrides)
    return ModelConfig(**base)


def _build_our_backbone():
    from metrabs_tpu.models.backbones.builder import build_backbone
    return build_backbone('efficientnetv2-s', dtype=jnp.float32,
                          scan_blocks=False)


def test_metrabs_full_forward_parity(ref, ref_flags, fork_modules, rng):
    """image+intrinsics -> absolute 3D joints, reference Metrabs vs ours,
    shared weights, plus the head intermediates to localize any failure."""
    from metrabs_tpu.models.metrabs import Metrabs

    ji = _joint_info()
    backbone, fork = _ref_backbone(fork_modules, rng)
    m = ref.models_metrabs.Metrabs(backbone, ji)
    img = _images(rng)
    intr = _intrinsics(img.shape[0])
    m.call((tf.constant(img), tf.constant(intr)), training=False)  # build
    feats = backbone(tf.constant(img), training=False).numpy()
    _randomize_head(m.heatmap_heads.conv_final, feats, rng)

    want_feats, want_2d, want_3d = [
        t.numpy() for t in m.backbone_and_head(tf.constant(img),
                                               training=False)]
    want_abs = m.call((tf.constant(img), tf.constant(intr)),
                      training=False).numpy()

    our_model = Metrabs(cfg=_our_cfg(), backbone=_build_our_backbone())
    variables = _our_variables_from_ref(
        our_model, fork, m.heatmap_heads.conv_final, example=(img, intr))

    got_feats, got_2d, got_3d = our_model.apply(
        variables, jnp.asarray(img), train=False,
        method=Metrabs.backbone_and_head)

    fscale = np.abs(want_feats).max()
    np.testing.assert_allclose(
        np.asarray(got_feats), want_feats, atol=2e-3 * fscale, rtol=1e-3)
    # Guard against the vacuous-oracle regime (input-insensitive outputs).
    tob._assert_input_sensitive(
        lambda z: m.call((tf.constant(z), tf.constant(intr)),
                         training=False).numpy(), img, 100.0)
    # 2D head in pixels: sub-0.1px; 3D head in mm inside the 2200mm cube.
    np.testing.assert_allclose(np.asarray(got_2d), want_2d, atol=0.1)
    np.testing.assert_allclose(np.asarray(got_3d), want_3d, atol=1.0)

    got_abs = our_model.apply(variables, jnp.asarray(img), jnp.asarray(intr),
                              train=False)
    assert np.abs(want_abs[..., 2]).max() > 100  # real depths, not degenerate
    np.testing.assert_allclose(np.asarray(got_abs), want_abs, atol=2.0,
                               rtol=1e-3)


def test_metrabs_full_forward_parity_stride_split(
        ref, ref_flags, fork_modules, rng):
    """stride_train=32 / stride_test=16 (the reference's TrainTestSwitch
    recipe, `docs/TRAINING.md:17-23`): the test-time graph is the dilated
    -stride16 fork, heatmap_to_image/metric divide by stride_test, and the
    FOV trust border still uses stride_train (`tfu3d.py:209-216`). SURVEY
    §7 ranks this composition the top silent-mm-error source."""
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.models.backbones.builder import build_backbone

    ref_flags.stride_test = 16
    ji = _joint_info()
    fork = tob._build_fork(fork_modules, 'efficientnetv2-s-stride16', rng)
    backbone = tf.keras.Sequential(
        [tf.keras.layers.Lambda(lambda t: 2.0 * t - 1.0), fork])
    m = ref.models_metrabs.Metrabs(backbone, ji)
    img = _images(rng)
    intr = _intrinsics(img.shape[0])
    m.call((tf.constant(img), tf.constant(intr)), training=False)  # build
    feats = backbone(tf.constant(img), training=False).numpy()
    _randomize_head(m.heatmap_heads.conv_final, feats, rng)
    want_abs = m.call((tf.constant(img), tf.constant(intr)),
                      training=False).numpy()

    our_model = Metrabs(
        cfg=_our_cfg(stride_test=16),
        backbone=build_backbone('efficientnetv2-s', dtype=jnp.float32,
                                scan_blocks=False, stride_test=16))
    variables = _our_variables_from_ref(
        our_model, fork, m.heatmap_heads.conv_final, example=(img, intr))
    got_abs = our_model.apply(variables, jnp.asarray(img), jnp.asarray(intr),
                              train=False)
    assert np.abs(want_abs[..., 2]).max() > 100
    np.testing.assert_allclose(np.asarray(got_abs), want_abs, atol=2.0,
                               rtol=1e-3)


@pytest.mark.parametrize('latent_mode', ['transform_coords',
                                         'predict_all_and_latents'])
def test_metrabs_latent_full_forward_parity(
        ref, ref_flags, fork_modules, rng, tmp_path, latent_mode):
    """The latent ("affine-combining autoencoder") variants end-to-end:
    head predicts latent points, absolute reconstruction runs on latents,
    then the recombination decode maps to joints
    (`models/metrabs.py:26-65`)."""
    from metrabs_tpu.models.metrabs import Metrabs

    n_latents = 8
    w1 = (rng.normal(size=(N_JOINTS, n_latents)) * 0.3).astype(np.float32)
    w2 = (rng.normal(size=(n_latents, N_JOINTS)) * 0.3).astype(np.float32)
    npz_path = tmp_path / 'affine.npz'
    np.savez(npz_path, w1=w1, w2=w2)
    ref_flags.affine_weights = str(npz_path)
    setattr(ref_flags, latent_mode, True)

    ji = _joint_info()
    backbone, fork = _ref_backbone(fork_modules, rng)
    m = ref.models_metrabs.Metrabs(backbone, ji)
    img = _images(rng)
    intr = _intrinsics(img.shape[0])
    m.call((tf.constant(img), tf.constant(intr)), training=False)  # build
    feats = backbone(tf.constant(img), training=False).numpy()
    _randomize_head(m.heatmap_heads.conv_final, feats, rng)
    want_abs = m.call((tf.constant(img), tf.constant(intr)),
                      training=False).numpy()

    our_model = Metrabs(cfg=_our_cfg(), backbone=_build_our_backbone(),
                        latent_mode=latent_mode, n_latents=n_latents)
    variables = _our_variables_from_ref(
        our_model, fork, m.heatmap_heads.conv_final, example=(img, intr))
    variables['constants'] = {'recombination_weights': jnp.asarray(w2),
                              'encoder_weights': jnp.asarray(w1)}
    got_abs = our_model.apply(variables, jnp.asarray(img), jnp.asarray(intr),
                              train=False)
    assert want_abs.shape == (img.shape[0], N_JOINTS, 3)
    np.testing.assert_allclose(np.asarray(got_abs), want_abs, atol=2.0,
                               rtol=1e-3)


def test_metro_full_forward_parity(ref, ref_flags, fork_modules, rng):
    """Metro: backbone -> Head3D -> root-relative metric pose
    (`metro.py:13-45`)."""
    from metrabs_tpu.models.metro import Metro

    ji = _joint_info()
    backbone, fork = _ref_backbone(fork_modules, rng)
    m = ref.models_metro.Metro(backbone, ji)
    img = _images(rng)
    feats = backbone(tf.constant(img), training=False).numpy()
    _randomize_head(m.heatmap_head.conv_final, feats, rng)
    want = m.call(tf.constant(img), training=False).numpy()

    our_model = Metro(cfg=_our_cfg(), backbone=_build_our_backbone())
    variables = _our_variables_from_ref(
        our_model, fork, m.heatmap_head.conv_final, head_key='heatmap_head',
        example=(img, None))
    got = our_model.apply(variables, jnp.asarray(img), train=False)
    assert want.shape == (img.shape[0], N_JOINTS, 3)
    np.testing.assert_allclose(np.asarray(got), want, atol=1.0, rtol=1e-3)


def test_model25d_head_forward_parity(ref, ref_flags, fork_modules, rng):
    """Model25D up to the 2.5D head output (image-space xy px + metric z mm,
    `twofive.py:47-58`). The final reconstruct_absolute_by_bone_lengths is
    oracle-blocked (tensorflow_graphics LM is stubbed); our LM solver is
    covered by tests/test_lm_solver.py synthetic-recovery tests instead."""
    from metrabs_tpu.models.model25d import Model25D

    ji = _joint_info()
    backbone, fork = _ref_backbone(fork_modules, rng)
    head = ref.models_twofive.Head25D(n_points=ji.n_joints)
    img = _images(rng)
    feats = backbone(tf.constant(img), training=False)
    head(feats, training=False)  # build
    _randomize_head(head.conv_final, feats.numpy(), rng)
    want = head(feats, training=False).numpy()

    bones = tuple((i, i + 1) for i in range(N_JOINTS - 1))
    our_model = Model25D(
        cfg=_our_cfg(), backbone=_build_our_backbone(), bones=bones,
        bone_lengths_ideal=tuple(250.0 for _ in bones))
    variables = _our_variables_from_ref(
        our_model, fork, head.conv_final, head_key='heatmap_head',
        example=(img, _intrinsics(img.shape[0])))
    got = our_model.apply(variables, jnp.asarray(img), train=False,
                          method=Model25D.forward_25d)
    assert want.shape == (img.shape[0], N_JOINTS, 3)
    np.testing.assert_allclose(np.asarray(got), want, atol=1.0, rtol=1e-3)
