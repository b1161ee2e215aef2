"""Model packaging: bundles everything a deployed PoseEstimator needs.

The analogue of `metrabs_tf/multiperson/save_model.py`: the reference wraps a
crop SavedModel + detector SavedModel + skeleton_infos pickle + joint
transform matrix into one SavedModel with four signatures. Here the package
is a directory with msgpack weights + a JSON manifest; `load_pose_estimator`
reconstructs the full `PoseEstimator` (detect/estimate x single/batched) from
it in one call.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import AugConfig, ModelConfig
from metrabs_tpu.io.checkpoints import export_model_msgpack, load_model_msgpack
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import SkeletonInfo, SkeletonRegistry
from metrabs_tpu.utils.joint_info import JointInfo


def save_pose_estimator_package(
        directory: str, *, cfg: ModelConfig, aug_cfg: AugConfig,
        crop_model_variables: Any, joint_info: JointInfo,
        detector_variables: Optional[Any] = None,
        detector_scan_repeats: bool = True,
        detector_type: str = 'yolov4',
        detector_dtype: str = 'bfloat16',
        detector_input_size: Optional[int] = None,
        skeleton_registry: Optional[SkeletonRegistry] = None,
        bone_mean_lengths: Optional[np.ndarray] = None,
        joint_transform_matrix: Optional[np.ndarray] = None,
        latent_mode: str = '', n_latents: int = 0,
        model_class: str = 'metrabs',
        bones_25d: Optional[Any] = None,
        bone_lengths_ideal: Optional[Any] = None) -> None:
    """`model_class` is 'metrabs' (default), 'metro' or 'model25d' — the
    crop-model architecture inside the package (the reference's
    `FLAGS.model_class`, `metrabs_tf/main.py:177-180`). Model25D packages
    additionally need `bones_25d` [B, 2] joint-index pairs and
    `bone_lengths_ideal` [B] millimeters (its constructor assets,
    `twofive.py:15-18`)."""
    if model_class == 'model25d' and (
            bones_25d is None or bone_lengths_ideal is None):
        raise ValueError('model25d packages need bones_25d and '
                         'bone_lengths_ideal (twofive.py:15-18)')
    os.makedirs(directory, exist_ok=True)
    export_model_msgpack(
        os.path.join(directory, 'crop_model.msgpack'), crop_model_variables)
    if detector_variables is not None:
        export_model_msgpack(
            os.path.join(directory, 'detector.msgpack'), detector_variables)
    if joint_transform_matrix is not None:
        np.save(os.path.join(directory, 'joint_transform.npy'),
                joint_transform_matrix)

    skeletons = {}
    if skeleton_registry is not None:
        for name in skeleton_registry.skeleton_names:
            skeletons[name] = dict(
                indices=[int(i) for i in skeleton_registry.indices(name)],
                names=list(skeleton_registry.joint_names(name)),
                edges=[list(map(int, e))
                       for e in skeleton_registry.joint_edges(name)])

    manifest = dict(
        format_version=1,
        model_config=dataclasses.asdict(cfg),
        aug_config=dataclasses.asdict(aug_cfg),
        joint_names=list(joint_info.names),
        joint_edges=[list(map(int, e)) for e in joint_info.edges],
        has_detector=detector_variables is not None,
        detector_scan_repeats=detector_scan_repeats,
        detector_type=detector_type,
        detector_dtype=detector_dtype,
        # None = resolve at load time from the family default (416 for
        # YOLOv4, 640 for YOLOv8 per ultralytics imgsz).
        detector_input_size=detector_input_size,
        has_joint_transform=joint_transform_matrix is not None,
        # Latent-joint fields live on the Metrabs MODULE (not ModelConfig),
        # so they must be recorded explicitly for the round trip.
        latent_mode=latent_mode,
        n_latents=n_latents,
        model_class=model_class,
        bones_25d=([list(map(int, b)) for b in bones_25d]
                   if bones_25d is not None else None),
        bone_lengths_ideal=([float(x) for x in bone_lengths_ideal]
                            if bone_lengths_ideal is not None else None),
        bone_mean_lengths=(
            [float(x) for x in bone_mean_lengths]
            if bone_mean_lengths is not None else None),
        skeletons=skeletons)
    with open(os.path.join(directory, 'manifest.json'), 'w') as f:
        json.dump(manifest, f, indent=2)


def add_detector_to_package(
        directory: str, detector_variables: Any, *,
        detector_type: str = 'yolov4', detector_dtype: str = 'bfloat16',
        detector_input_size: Optional[int] = None,
        detector_scan_repeats: bool = True) -> None:
    """Adds (or replaces) the detector in an existing package.

    The reference assembles crop model and detector at packaging time in one
    go (`save_model.py:28-35`); here the two can also be minted separately
    (e.g. `apps/train.py --export-dir` for the crop model, `detect/train.py`
    for the detector) and joined afterwards."""
    manifest_path = os.path.join(directory, 'manifest.json')
    with open(manifest_path) as f:
        manifest = json.load(f)
    export_model_msgpack(
        os.path.join(directory, 'detector.msgpack'), detector_variables)
    manifest.update(
        has_detector=True, detector_type=detector_type,
        detector_dtype=detector_dtype,
        detector_input_size=detector_input_size,
        detector_scan_repeats=detector_scan_repeats)
    with open(manifest_path, 'w') as f:
        json.dump(manifest, f, indent=2)


def load_crop_model(directory: str, backbone_builder=None,
                    scan_blocks: Optional[bool] = None,
                    bn_fold: bool = False):
    """Loads the bare crop model from a package directory.

    Returns (model, variables, cfg, joint_info, manifest) for any
    model_class — including 'metro', whose root-relative-only output cannot
    drive the absolute multi-person estimator (the reference never packages
    Metro into the multiperson SavedModel either; `models/__init__.py:1-2`
    does not even export it).

    `scan_blocks`: None keeps the packaged layout; False unrolls a
    scanned-layout backbone (converting the stored variables with
    `scan_convert.scanned_to_flat`) — the serving-throughput layout, ~11%
    faster at L@384 (PROBE_INFER_r04.json) for a longer one-time compile.

    `bn_fold`: fold inference-mode BatchNorm into the conv weights
    (io/bn_fold.py) — removes every BN op from the serving graph. Exact
    affine rewrite; supported families only
    (`io.bn_fold.backbone_supports_bn_fold`)."""
    from metrabs_tpu.models.backbones.builder import build_backbone

    with open(os.path.join(directory, 'manifest.json')) as f:
        manifest = json.load(f)
    cfg = ModelConfig(**manifest['model_config'])
    joint_info = JointInfo(
        names=tuple(manifest['joint_names']),
        edges=tuple(tuple(e) for e in manifest['joint_edges']))
    variables = load_model_msgpack(
        os.path.join(directory, 'crop_model.msgpack'))['variables']
    if scan_blocks is not None and scan_blocks != cfg.backbone_scan_blocks:
        if scan_blocks:
            raise ValueError(
                'Re-stacking a flat-layout package into the scanned layout '
                'needs a scanned template; use io.scan_convert.'
                'flat_to_scanned with a freshly-initialized scanned model')
        from metrabs_tpu.io.scan_convert import scanned_to_flat
        variables = scanned_to_flat(variables)
        cfg = dataclasses.replace(cfg, backbone_scan_blocks=False)
    if bn_fold:
        from metrabs_tpu.io.bn_fold import bn_epsilon_for, fold_bn_variables
        variables = fold_bn_variables(
            variables, epsilon=bn_epsilon_for(cfg.backbone))
        cfg = dataclasses.replace(cfg, bn_fold=True)
    backbone = (backbone_builder or build_backbone)(
        cfg.backbone, centered_stride=cfg.centered_stride,
        dtype=jnp.dtype(cfg.dtype), scan_blocks=cfg.backbone_scan_blocks,
        stride_test=(cfg.stride_test
                     if cfg.stride_test != cfg.stride_train else None),
        bn_fold=cfg.bn_fold)

    model_class = manifest.get('model_class', 'metrabs')
    if model_class == 'metrabs':
        from metrabs_tpu.models.metrabs import Metrabs
        model = Metrabs(cfg=cfg, backbone=backbone,
                        latent_mode=manifest.get('latent_mode', ''),
                        n_latents=manifest.get('n_latents', 0))
    elif model_class == 'metro':
        from metrabs_tpu.models.metro import Metro
        model = Metro(cfg=cfg, backbone=backbone)
    elif model_class == 'model25d':
        from metrabs_tpu.models.model25d import Model25D
        model = Model25D(
            cfg=cfg, backbone=backbone,
            bones=tuple(tuple(b) for b in manifest['bones_25d']),
            bone_lengths_ideal=tuple(manifest['bone_lengths_ideal']))
    else:
        raise ValueError(f'Unknown model_class {model_class!r} in manifest')
    return model, variables, cfg, joint_info, manifest


def load_pose_estimator(directory: str, backbone_builder=None,
                        cfg_overrides: Optional[dict] = None) -> PoseEstimator:
    """Reconstructs a PoseEstimator from a package directory.

    `cfg_overrides`: ModelConfig fields to replace for SERVING (e.g.
    `{'warp_precision': 'bf16'}` to trade warp pixel precision for
    throughput) — fields that define the trained model itself (joints,
    strides, backbone) must match the package and cannot be overridden.

    Serving defaults (both exact, load-time layout transforms):
     - a scanned-layout backbone is UNROLLED (`scan_blocks=False` +
       `scanned_to_flat` on the stored variables) — measured ~11% faster on
       the v5e at L@384 (PROBE_INFER_r04.json; identical math, pinned by
       tests/test_scan_convert.py) for a longer one-time compile. Opt out
       with `cfg_overrides={'backbone_scan_blocks': True}` (e.g. on
       compile-time-sensitive dev backends). Note True means "keep the
       PACKAGED layout": a flat-layout package stays flat (re-stacking
       needs a scanned template; a warning is emitted).
     - inference-mode BatchNorm is FOLDED into the conv weights
       (io/bn_fold.py) for supported families — removes every backbone BN
       op from the serving graph (~8% of the L@384 forward,
       PROBE_INFER_r04 bn_identity). Opt out with
       `cfg_overrides={'bn_fold': False}`."""
    import warnings as _warnings

    cfg_overrides = dict(cfg_overrides or {})
    scan_blocks = cfg_overrides.pop('backbone_scan_blocks', False)
    bn_fold = cfg_overrides.pop('bn_fold', None)
    if bn_fold is None:
        from metrabs_tpu.io.bn_fold import backbone_supports_bn_fold
        with open(os.path.join(directory, 'manifest.json')) as f:
            _backbone = json.load(f)['model_config'].get(
                'backbone', ModelConfig.backbone)
        bn_fold = backbone_supports_bn_fold(_backbone)
    model, crop_variables, cfg, joint_info, manifest = load_crop_model(
        directory, backbone_builder,
        scan_blocks=None if scan_blocks else False, bn_fold=bn_fold)
    if scan_blocks and not cfg.backbone_scan_blocks:
        # The opt-out means "keep the packaged layout", and this package is
        # already flat — say so instead of silently ignoring the request.
        _warnings.warn(
            'backbone_scan_blocks=True requested but the package stores the '
            'flat layout; keeping flat (re-stacking needs a scanned '
            'template — io.scan_convert.flat_to_scanned)')
    if cfg_overrides:
        import dataclasses as _dc
        protected = {'proc_side', 'depth', 'n_joints', 'backbone',
                     'stride_train', 'stride_test'}
        bad = protected & set(cfg_overrides)
        if bad:
            raise ValueError(
                f'cfg_overrides may not change trained-model fields: {bad}')
        cfg = _dc.replace(cfg, **cfg_overrides)
    model_class = manifest.get('model_class', 'metrabs')
    if model_class == 'metro':
        raise ValueError(
            'Metro predicts root-relative poses only (no intrinsics input, '
            'metro.py:24-27) and cannot drive the absolute multi-person '
            'estimator; use load_crop_model() for the bare model')
    aug_cfg = AugConfig(**manifest['aug_config'])

    def crop_model_fn(state, crops, intrinsics, sample_valid):
        # state as argument, not closure: keeps weights out of the HLO.
        return model.apply(state, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    detector = None
    if manifest.get('has_detector'):
        from metrabs_tpu.detect.yolov4 import PersonDetector, build_detector_model
        det_variables = load_model_msgpack(
            os.path.join(directory, 'detector.msgpack'))['variables']
        det_type = manifest.get('detector_type', 'yolov4')
        det_size = manifest.get('detector_input_size') or (
            640 if det_type.startswith('yolov8') else 416)
        # Same load-time BN fold for the detector (darknet eps 1e-5);
        # YOLOv4 family only, and governed by the same bn_fold override.
        det_fold = bn_fold and det_type.startswith('yolov4')
        if det_fold:
            from metrabs_tpu.io.bn_fold import fold_bn_variables
            det_variables = fold_bn_variables(det_variables, epsilon=1e-5)
        detector = PersonDetector(
            build_detector_model(
                det_type,
                dtype=jnp.dtype(manifest.get('detector_dtype', 'float32')),
                scan_repeats=manifest.get('detector_scan_repeats', True),
                bn_fold=det_fold),
            det_variables, input_size=det_size,
            approx_top_k=bool(manifest.get('detector_approx_top_k', False)))

    skeleton_registry = None
    if manifest.get('skeletons'):
        infos = {
            k: SkeletonInfo(
                indices=tuple(v['indices']), names=tuple(v['names']),
                edges=tuple(tuple(e) for e in v['edges']))
            for k, v in manifest['skeletons'].items()}
        skeleton_registry = SkeletonRegistry(joint_info, infos)

    joint_transform = None
    if manifest.get('has_joint_transform'):
        jt_path = os.path.join(directory, 'joint_transform.npy')
        if not os.path.exists(jt_path):
            # Silently skipping would change the output joint convention.
            raise FileNotFoundError(
                f'manifest declares a joint transform but {jt_path} is '
                f'missing — the package is incomplete')
        joint_transform = np.load(jt_path)

    bone_means = (np.asarray(manifest['bone_mean_lengths'], np.float32)
                  if manifest.get('bone_mean_lengths') else None)

    return PoseEstimator(
        crop_model_fn, joint_info, cfg, aug_cfg=aug_cfg, detector=detector,
        skeleton_registry=skeleton_registry, bone_mean_lengths=bone_means,
        joint_transform_matrix=joint_transform,
        crop_model_state=crop_variables)
