"""Imports the actual reference TF code (/root/reference/metrabs_tf) as a
NUMERIC ORACLE for parity tests.

TensorFlow 2.21 is installed in this environment, so the reference's own
formula functions can be *executed* against randomized inputs and compared
with our JAX re-implementations — the strongest parity evidence available
without released weights. The reference code is only imported and run, never
copied; the external author packages it depends on (simplepyutils, posepile,
tensorflow_graphics, tensorflow_addons, attrdict) are stubbed at the
sys.modules level with just enough surface for the formula modules to import
(none of the stubbed functionality is exercised by the oracles — FLAGS is a
plain namespace, the LM optimizer stub raises if called).

Usage from a test module:

    oracle = pytest.importorskip('tests._reference_oracle').load_reference()
    oracle.flags.proc_side = 256           # configure reference FLAGS
    out_tf = oracle.tfu3d.reconstruct_absolute(...)
"""

from __future__ import annotations

import sys
import types

REF_ROOT = '/root/reference'

# Mutable holder so tests can inject the mean-bone table that the reference's
# plausibility check loads via spu.load_pickle(FLAGS.bone_length_file)
# (`plausibility_check.py:12-16`).
BONE_MEANS = [None]

# Mutable holder for posepile.datasets3d.get_joint_info(FLAGS.dataset3d)
# (`eval_metrics.py:37`): tests inject an object with an `.ids` dict.
JOINT_INFO = [None]

_cached = None


def _module(name):
    mod = types.ModuleType(name)
    mod.__dict__['_oracle_stub'] = True
    sys.modules[name] = mod
    return mod


def _install_stubs():
    import logging

    if 'simplepyutils' not in sys.modules:
        spu = _module('simplepyutils')
        spu.FLAGS = types.SimpleNamespace(
            stride_train=32, stride_test=32, proc_side=256,
            centered_stride=True, box_size_mm=2200.0,
            weak_perspective=False, mean_relative=True,
            bone_length_dataset='', bone_length_file='<injected>',
            dataset3d='', loss2d_factor=0.2, absloss_factor=0.1,
            absloss_start_step=5000,
            # multiperson packaging-time TTA flags (`save_model.py:21-24`
            # defaults; SURVEY §8.1)
            rot_aug=25.0, rot_aug_360=False, rot_aug_360_half=False,
            detector_flip_vertical_too=False)
        spu.load_pickle = lambda path: BONE_MEANS[0]
        spu.logger = logging.getLogger('reference_oracle')
        # voc_loader.py:16 decorates its asset loader with @spu.picklecache;
        # a pass-through keeps the module importable (the loader itself is
        # never called — object_occlude is excluded from the oracles).
        spu.picklecache = lambda *a, **k: (lambda fn: fn)

    if 'fleras' not in sys.modules:
        fl = _module('fleras')

        class ModelTrainer:  # bare base: the oracle never runs fit loops
            pass

        fl.ModelTrainer = ModelTrainer

    if 'posepile' not in sys.modules:
        import numpy as _np

        pp = _module('posepile')
        ds3d = _module('posepile.datasets3d')
        paths = _module('posepile.paths')
        ji_mod = _module('posepile.joint_info')
        paths.DATA_ROOT = '/nonexistent-posepile-data-root'
        pp.datasets3d = ds3d
        pp.paths = paths
        pp.joint_info = ji_mod

        class JointInfo:
            """Just enough of posepile.joint_info.JointInfo for the
            multiperson model: names, edges, ids, n_joints and the l/r
            prefix-swap mirror mapping (the posepile convention the
            reference's joint names follow, e.g. lwri/rwri)."""

            def __init__(self, joints, edges=()):
                if isinstance(joints, str):
                    joints = joints.split(',')
                self.names = [n.decode('utf8') if isinstance(n, bytes)
                              else str(n) for n in joints]
                self.n_joints = len(self.names)
                self.ids = {n: i for i, n in enumerate(self.names)}
                self.stick_figure_edges = [
                    tuple(int(x) for x in e) for e in _np.asarray(
                        edges, _np.int32).reshape(-1, 2)]

            @property
            def mirror_mapping(self):
                def flip(name):
                    if name.startswith('l'):
                        return 'r' + name[1:]
                    if name.startswith('r'):
                        return 'l' + name[1:]
                    return name
                return [self.ids.get(flip(n), i)
                        for i, n in enumerate(self.names)]

        ji_mod.JointInfo = JointInfo

        def _unavailable(*a, **k):
            raise NotImplementedError(
                'posepile datasets are not available in the oracle harness')

        def _get_joint_info(name):
            if JOINT_INFO[0] is None:
                raise NotImplementedError(
                    'inject tests._reference_oracle.JOINT_INFO[0] first')
            return JOINT_INFO[0]

        ds3d.get_dataset = _unavailable
        ds3d.get_joint_info = _get_joint_info

    if 'tensorflow_graphics' not in sys.modules:
        tfg = _module('tensorflow_graphics')
        math_mod = _module('tensorflow_graphics.math')
        opt_mod = _module('tensorflow_graphics.math.optimizer')
        lm_mod = _module(
            'tensorflow_graphics.math.optimizer.levenberg_marquardt')
        tfg.math = math_mod
        math_mod.optimizer = opt_mod
        opt_mod.levenberg_marquardt = lm_mod

        def minimize(*a, **k):
            raise NotImplementedError(
                'tfg Levenberg-Marquardt is stubbed; the oracle tests do '
                'not exercise optimize_z_offset_by_bones')

        lm_mod.minimize = minimize

    if 'tensorflow_addons' not in sys.modules:
        # FUNCTIONAL stand-ins, not inert stubs: the multiperson warp
        # (`multiperson/warping.py:68-93`) needs the two tfa resample
        # primitives. `transform` delegates to TF core's
        # ImageProjectiveTransformV3 — the exact raw op tfa.image.transform
        # wraps — so the oracle path still executes no re-implemented
        # resample math; `interpolate_bilinear` follows tfa's documented
        # clamp-floor-to-[0, size-2] + clipped-alpha lerp spec (the
        # reference compensates its replicate-border behavior with a 1px
        # zero pad, `warping.py:83-90`).
        tfa = _module('tensorflow_addons')
        tfa_image = _module('tensorflow_addons.image')
        tfa.image = tfa_image

        def _tfa_transform(images, transforms, interpolation='bilinear',
                           fill_mode='constant', output_shape=None,
                           fill_value=0.0):
            import tensorflow as tf
            single = images.shape.rank == 3
            imgs = images[tf.newaxis] if single else images
            t = tf.cast(transforms, tf.float32)
            if t.shape.rank == 1:
                t = t[tf.newaxis]
            if output_shape is None:
                output_shape = tf.shape(imgs)[1:3]
            out = tf.raw_ops.ImageProjectiveTransformV3(
                images=imgs, transforms=t,
                output_shape=tf.cast(output_shape, tf.int32),
                fill_value=tf.constant(fill_value, tf.float32),
                interpolation=interpolation.upper(),
                fill_mode=fill_mode.upper())
            return out[0] if single else out

        def _tfa_interpolate_bilinear(grid, query_points, indexing='ij'):
            import tensorflow as tf
            if indexing not in ('ij', 'xy'):
                raise ValueError(indexing)
            q = tf.cast(query_points, grid.dtype)
            if indexing == 'xy':
                q = q[..., ::-1]
            shape = tf.shape(grid)
            outs = []
            alphas = []
            floors = []
            for dim, size in ((0, shape[1]), (1, shape[2])):
                coord = q[..., dim]
                max_floor = tf.cast(size - 2, grid.dtype)
                floor = tf.clip_by_value(
                    tf.math.floor(coord), tf.cast(0, grid.dtype), max_floor)
                alpha = tf.clip_by_value(coord - floor, 0.0, 1.0)
                floors.append(tf.cast(floor, tf.int32))
                alphas.append(alpha[..., tf.newaxis])
            y0, x0 = floors
            ay, ax = alphas

            def gather(yy, xx):
                idx = tf.stack([yy, xx], axis=-1)
                return tf.gather_nd(grid, idx, batch_dims=1)

            top_left = gather(y0, x0)
            top_right = gather(y0, x0 + 1)
            bottom_left = gather(y0 + 1, x0)
            bottom_right = gather(y0 + 1, x0 + 1)
            top = top_left + (top_right - top_left) * ax
            bottom = bottom_left + (bottom_right - bottom_left) * ax
            return top + (bottom - top) * ay

        tfa_image.transform = _tfa_transform
        tfa_image.interpolate_bilinear = _tfa_interpolate_bilinear

    if 'numba' not in sys.modules:
        # Identity-decorator stub: numba only JIT-compiles the reference's
        # pure-numpy kernels (`improc.py:123-145,158-235`); without it they
        # run as plain Python with IDENTICAL semantics — exactly what an
        # executable oracle needs. Supports @njit, @njit(...), and
        # @njit(cache=True) decoration forms.
        nb = _module('numba')

        def _identity_jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda fn: fn

        nb.njit = _identity_jit
        nb.jit = _identity_jit

    if 'jpeg4py' not in sys.modules:
        # Module-level import in improc.py (libjpeg-turbo binding); the
        # imread path is not oracled (our loader decodes via cv2).
        j4 = _module('jpeg4py')
        j4.JPEGRuntimeError = type('JPEGRuntimeError', (Exception,), {})

        class _NoJPEG:
            def __init__(self, *a, **k):
                raise NotImplementedError('jpeg4py is stubbed in the oracle')

        j4.JPEG = _NoJPEG

    if 'rlemasklib' not in sys.modules:
        rm = _module('rlemasklib')

        def _rle_unavailable(*a, **k):
            raise NotImplementedError(
                'rlemasklib is stubbed; RLE codec parity is covered by '
                'tests/test_improc_utils.py against utils/rlemask.py')

        rm.encode = _rle_unavailable
        rm.decode = _rle_unavailable
        rm.resize = _rle_unavailable

    if 'simplepyutils.argparse' not in sys.modules:
        import logging
        spa = _module('simplepyutils.argparse')
        spa.logger = logging.getLogger('reference_oracle')
        if 'simplepyutils' in sys.modules:
            sys.modules['simplepyutils'].argparse = spa

    if 'attrdict' not in sys.modules:
        ad = _module('attrdict')

        class AttrDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ad.AttrDict = AttrDict


def load_reference():
    """Returns a namespace with the imported reference modules and the live
    FLAGS stub. Caches after first import (TF import is ~10 s)."""
    global _cached
    if _cached is not None:
        return _cached

    import tensorflow  # noqa: F401  (skip via importorskip in test modules)

    _install_stubs()
    for p in (REF_ROOT, REF_ROOT + '/metrabs_tf'):
        if p not in sys.path:
            sys.path.append(p)

    from metrabs_tf import tfu, tfu3d, util3d
    from metrabs_tf.multiperson import plausibility_check, warping
    import procrustes as procrustes_np

    # metrabs_tf.models.__init__ pulls in the full Keras model stack
    # (fleras etc.); load the two formula modules we oracle against by file
    # path instead, bypassing the package __init__.
    import importlib.util

    def _load_by_path(alias, path):
        spec = importlib.util.spec_from_file_location(alias, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[alias] = mod
        spec.loader.exec_module(mod)
        return mod

    models_util = _load_by_path(
        'metrabs_tf_models_util_oracle',
        REF_ROOT + '/metrabs_tf/models/util.py')
    eval_metrics = _load_by_path(
        'metrabs_tf_models_eval_metrics_oracle',
        REF_ROOT + '/metrabs_tf/models/eval_metrics.py')

    _cached = types.SimpleNamespace(
        flags=sys.modules['simplepyutils'].FLAGS,
        tfu=tfu, tfu3d=tfu3d, util3d=util3d,
        models_util=models_util, eval_metrics=eval_metrics,
        plausibility_check=plausibility_check, warping=warping,
        procrustes_np=procrustes_np)
    return _cached


_cached_improc = None


def load_reference_improc():
    """Imports the reference's CPU image-processing module
    (`metrabs_tf/improc.py`) as an executable oracle. Needs no TensorFlow:
    the module is pure numpy/cv2/PIL once numba is stubbed to an identity
    decorator (the @njit kernels then run as plain Python with identical
    semantics)."""
    global _cached_improc
    if _cached_improc is not None:
        return _cached_improc
    _install_stubs()
    for p in (REF_ROOT, REF_ROOT + '/metrabs_tf'):
        if p not in sys.path:
            sys.path.append(p)
    from metrabs_tf import improc as ref_improc
    _cached_improc = ref_improc
    return _cached_improc


_cached_multiperson = None


def load_reference_multiperson():
    """Imports the reference's FULL multiperson pipeline module
    (`multiperson/multiperson_model.py`) for end-to-end estimate_poses
    oracles. The tfa resample primitives are functional stand-ins (see
    _install_stubs: TF core's ImageProjectiveTransformV3 + the documented
    interpolate_bilinear spec)."""
    global _cached_multiperson
    if _cached_multiperson is not None:
        return _cached_multiperson
    base = load_reference()
    from metrabs_tf.multiperson import multiperson_model
    _cached_multiperson = types.SimpleNamespace(
        multiperson_model=multiperson_model, **vars(base))
    return _cached_multiperson


_cached_util3d = None


def load_reference_util3d():
    """Imports `metrabs_tf/util3d.py` (adaptive pose samplers, numpy rigid
    align) as an executable oracle — TF-free (numpy/matplotlib/procrustes)."""
    global _cached_util3d
    if _cached_util3d is not None:
        return _cached_util3d
    _install_stubs()
    for p in (REF_ROOT, REF_ROOT + '/metrabs_tf'):
        if p not in sys.path:
            sys.path.append(p)
    from metrabs_tf import util3d
    _cached_util3d = util3d
    return _cached_util3d


_cached_aug = None


def load_reference_augmentation():
    """Imports the reference's appearance/color augmentation modules
    (`metrabs_tf/augmentation/{appearance,color}.py`) as executable
    oracles — pure numpy/cv2 given the stubs; object_occlude is excluded
    (needs the VOC occluder asset files)."""
    global _cached_aug
    if _cached_aug is not None:
        return _cached_aug
    _install_stubs()
    for p in (REF_ROOT, REF_ROOT + '/metrabs_tf'):
        if p not in sys.path:
            sys.path.append(p)
    from metrabs_tf.augmentation import appearance, color
    _cached_aug = types.SimpleNamespace(
        appearance=appearance, color=color,
        flags=sys.modules['simplepyutils'].FLAGS)
    return _cached_aug


_cached_models = None


def load_reference_models():
    """Additionally imports the real `metrabs_tf.models.metrabs` module
    (fleras.ModelTrainer stubbed as a bare base class; posepile.paths
    stubbed). Enables executing the reference's training-loss methods as
    oracles (`models/metrabs.py:227-318`)."""
    global _cached_models
    if _cached_models is not None:
        return _cached_models
    base = load_reference()
    from metrabs_tf.models import metrabs as models_metrabs
    from metrabs_tf.models import metro as models_metro
    from metrabs_tf.models import twofive as models_twofive
    _cached_models = types.SimpleNamespace(models_metrabs=models_metrabs,
                                           models_metro=models_metro,
                                           models_twofive=models_twofive,
                                           **vars(base))
    return _cached_models
