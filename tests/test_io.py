"""IO round-trips: checkpoints, packaging manifest, skeleton pickles,
dataset adapters."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.data.camera import Camera
from metrabs_tpu.data.datasets import boxes_from_joints, load_3dpw_examples
from metrabs_tpu.io import checkpoints as ckpt_mod
from metrabs_tpu.io.checkpoints import export_model_msgpack, load_model_msgpack
from metrabs_tpu.pipeline.skeletons import (
    H36M_17, SkeletonRegistry, load_skeleton_infos)


def test_msgpack_roundtrip(tmp_path, rng):
    variables = {'params': {'w': rng.normal(size=(4, 4)).astype(np.float32),
                            'b': rng.normal(size=(4,)).astype(np.float32)}}
    path = str(tmp_path / 'model.msgpack')
    export_model_msgpack(path, variables, metadata={'note': 'test'})
    loaded = load_model_msgpack(path)
    np.testing.assert_allclose(loaded['variables']['params']['w'],
                               variables['params']['w'])
    assert loaded['metadata']['note'] == 'test'


def test_checkpoint_save_restore(tmp_path):
    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.train import loop as loop_mod, optim

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    tx = optim.build_optimizer(TrainConfig(training_steps=10))
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    state = state.replace(step=jnp.int32(7)) if hasattr(state, 'replace') else state

    manager = ckpt_mod.make_checkpoint_manager(str(tmp_path / 'ckpt'),
                                               save_interval_steps=1)
    ckpt_mod.save_train_state(manager, 7, state)
    manager.wait_until_finished()

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state)
    restored, step = ckpt_mod.restore_train_state(manager, abstract)
    assert step == 7
    orig = jax.tree_util.tree_leaves(state.params)
    new = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_skeleton_infos_pickle_roundtrip(tmp_path):
    reg = SkeletonRegistry(H36M_17)
    raw = {name: dict(indices=list(reg.indices(name)),
                      names=list(reg.joint_names(name)),
                      edges=[list(e) for e in reg.joint_edges(name)])
           for name in reg.skeleton_names}
    path = str(tmp_path / 'skeleton_infos.pkl')
    with open(path, 'wb') as f:
        pickle.dump(raw, f)
    infos = load_skeleton_infos(path)
    reg2 = SkeletonRegistry(H36M_17, infos)
    for name in reg.skeleton_names:
        np.testing.assert_array_equal(reg.indices(name), reg2.indices(name))
        assert reg.joint_names(name) == reg2.joint_names(name)


def test_3dpw_adapter(tmp_path, rng):
    """Synthetic 3DPW sequence pickle exercises the adapter's unit and
    extrinsics conventions."""
    n_frames = 3
    K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]], np.float64)
    # Two tracks of SMPL-24 world joints in METERS.
    jp = [rng.normal(size=(n_frames, 24 * 3)) * 0.3 + [0, 0, 4] * 24
          for _ in range(2)]
    cam_poses = np.tile(np.eye(4)[None], (n_frames, 1, 1))
    cam_poses[:, 2, 3] = 0.0
    seq = dict(sequence='testseq', cam_intrinsics=K,
               jointPositions=jp, cam_poses=cam_poses,
               campose_valid=np.ones((2, n_frames), bool))
    seq_dir = tmp_path / 'sequenceFiles' / 'test'
    os.makedirs(seq_dir)
    with open(seq_dir / 'testseq.pkl', 'wb') as f:
        pickle.dump(seq, f)

    examples = load_3dpw_examples(str(tmp_path), 'test')
    assert len(examples) == n_frames * 2
    ex = examples[0]
    assert ex.world_coords.shape == (24, 3)
    # Meters -> millimeters.
    assert 2000 < np.nanmean(ex.world_coords[:, 2]) < 6000
    assert ex.bbox[2] > 0 and ex.bbox[3] > 0
    assert 'image_00000.jpg' in ex.image_path


def test_boxes_from_joints_handles_nan(rng):
    pts = rng.uniform(100, 200, size=(10, 2)).astype(np.float32)
    pts[3] = np.nan
    box = boxes_from_joints(pts)
    assert np.all(np.isfinite(box)) and box[2] > 0


def test_package_save_load_run_roundtrip(tmp_path, rng):
    """Full packager round-trip (`save_model.py` equivalent): save crop
    model + detector + skeletons, reload via load_pose_estimator, and run
    both public APIs. Covers manifest fields incl. detector_dtype (loads
    bf16 by default) and detector_type='yolov4-tiny'."""
    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.detect.yolov4 import YOLOv4Tiny
    from metrabs_tpu.io.packaging import (
        load_pose_estimator, save_pose_estimator_package)
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.utils.joint_info import JointInfo

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='tiny', warp_backend='gather')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    crop_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.eye(3)[None])
    det_model = YOLOv4Tiny(num_classes=80, dtype=jnp.float32)
    det_vars = det_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 96, 96, 3), jnp.float32),
                              train=False)
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    d = str(tmp_path / 'pkg')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=crop_vars,
        joint_info=joint_info, detector_variables=det_vars,
        detector_type='yolov4-tiny')

    def tiny_builder(name, **kwargs):
        assert name == 'tiny'
        return TinyBackbone(width=8, dtype=jnp.float32)

    est = load_pose_estimator(d, backbone_builder=tiny_builder)
    # detector_dtype default bf16 must reach the rebuilt model.
    assert est.detector.model.dtype == jnp.bfloat16
    assert type(est.detector.model).__name__ == 'YOLOv4Tiny'
    est.detector = dataclasses_replace_input_size(est.detector, 96)

    img = rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
    boxes = np.array([[10, 10, 60, 60]], np.float32)
    out = est.estimate_poses(img, boxes, num_aug=1)
    assert np.asarray(out['poses3d']).shape == (1, 17, 3)
    assert np.all(np.isfinite(np.asarray(out['poses3d'])))
    out2 = est.detect_poses(img, num_aug=1, max_detections=2,
                            detector_threshold=0.0)
    assert np.asarray(out2['poses3d']).shape[1:] == (17, 3)


def dataclasses_replace_input_size(det, size):
    import dataclasses as _dc
    return _dc.replace(det, input_size=size)


def test_package_yolov8_detector_roundtrip(tmp_path, rng):
    """YOLOv8 package: detector_type='yolov8n' + detector_input_size must
    survive the manifest round-trip (the v8 family defaults to 640 per
    ultralytics imgsz; an explicit size overrides)."""
    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.detect.yolov8 import YOLOv8
    from metrabs_tpu.io.packaging import (
        load_pose_estimator, save_pose_estimator_package)
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.utils.joint_info import JointInfo

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='tiny', warp_backend='gather')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    crop_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.eye(3)[None])
    det_model = YOLOv8(size='n', dtype=jnp.float32)
    det_vars = det_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 96, 96, 3), jnp.float32))
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    d = str(tmp_path / 'pkg8')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=crop_vars,
        joint_info=joint_info, detector_variables=det_vars,
        detector_type='yolov8n', detector_dtype='float32',
        detector_input_size=96)

    def tiny_builder(name, **kwargs):
        assert name == 'tiny'
        return TinyBackbone(width=8, dtype=jnp.float32)

    est = load_pose_estimator(d, backbone_builder=tiny_builder)
    assert type(est.detector.model).__name__ == 'YOLOv8'
    assert est.detector.model.size == 'n'
    assert est.detector.input_size == 96

    img = rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
    out = est.detect_poses(img, num_aug=1, max_detections=2,
                           detector_threshold=0.0)
    assert np.asarray(out['poses3d']).shape[1:] == (17, 3)
    assert np.all(np.isfinite(np.asarray(out['poses3d'])))


def test_package_roundtrip_latent_mode(tmp_path, rng):
    """Latent-joint models must round-trip: latent_mode/n_latents live on the
    Metrabs module (not ModelConfig), so the manifest records them explicitly.
    Regression for a bug where load_pose_estimator rebuilt with latent_mode=''
    and the saved head kernel (sized for n_latents) no longer matched."""
    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.io.packaging import (
        load_pose_estimator, save_pose_estimator_package)
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.utils.joint_info import JointInfo

    n_latents = 8
    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='tiny', warp_backend='gather')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32),
                    latent_mode='transform_coords', n_latents=n_latents)
    crop_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.eye(3)[None])
    # Non-zero decode weights so a dropped latent config would show up as a
    # shape error rather than a silent zero output.
    crop_vars = jax.tree_util.tree_map(np.asarray, crop_vars)
    crop_vars['constants']['recombination_weights'] = (
        rng.normal(size=(n_latents, 17)).astype(np.float32))
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    d = str(tmp_path / 'pkg_latent')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=crop_vars,
        joint_info=joint_info, latent_mode='transform_coords',
        n_latents=n_latents)

    def tiny_builder(name, **kwargs):
        return TinyBackbone(width=8, dtype=jnp.float32)

    est = load_pose_estimator(d, backbone_builder=tiny_builder)
    img = rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
    boxes = np.array([[10, 10, 60, 60]], np.float32)
    out = est.estimate_poses(img, boxes, num_aug=1)
    assert np.asarray(out['poses3d']).shape == (1, 17, 3)
    assert np.all(np.isfinite(np.asarray(out['poses3d'])))


def test_package_roundtrip_model25d(tmp_path, rng):
    """Model25D packages round-trip into a working PoseEstimator: the
    manifest records model_class + bones + ideal bone lengths (the
    constructor assets of `twofive.py:15-18`), and the rebuilt crop fn
    satisfies the estimator's (state, crops, K, valid) contract incl.
    finite outputs for padding crops."""
    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.io.packaging import (
        load_crop_model, load_pose_estimator, save_pose_estimator_package)
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.model25d import Model25D
    from metrabs_tpu.utils.joint_info import JointInfo

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='tiny', warp_backend='gather')
    bones = tuple(tuple(map(int, e)) for e in H36M_17.edges)
    lengths = tuple(float(x) for x in np.full(len(bones), 300.0))
    model = Model25D(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32),
                     bones=bones, bone_lengths_ideal=lengths)
    crop_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.eye(3)[None])
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    d = str(tmp_path / 'pkg_25d')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=crop_vars,
        joint_info=joint_info, model_class='model25d', bones_25d=bones,
        bone_lengths_ideal=lengths)

    def tiny_builder(name, **kwargs):
        return TinyBackbone(width=8, dtype=jnp.float32)

    m2, _, _, _, manifest = load_crop_model(d, backbone_builder=tiny_builder)
    assert type(m2).__name__ == 'Model25D'
    assert manifest['model_class'] == 'model25d'
    assert m2.bone_lengths_ideal == lengths

    est = load_pose_estimator(d, backbone_builder=tiny_builder)
    img = rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
    # One valid box and one degenerate box: the degenerate crop exercises
    # the sample_valid neutral-pose path through the LM bone solve.
    boxes = np.array([[10, 10, 60, 60], [0, 0, 0, 0]], np.float32)
    out = est.estimate_poses(img, boxes, num_aug=1)
    assert np.asarray(out['poses3d']).shape == (2, 17, 3)
    assert np.all(np.isfinite(np.asarray(out['poses3d'])))


def test_package_metro_refuses_pose_estimator(tmp_path):
    """Metro packages load as bare crop models but must refuse the absolute
    multi-person estimator (no intrinsics input, `metro.py:24-27`)."""
    import pytest

    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.io.packaging import (
        load_crop_model, load_pose_estimator, save_pose_estimator_package)
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metro import Metro
    from metrabs_tpu.utils.joint_info import JointInfo

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='tiny', warp_backend='gather')
    model = Metro(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    crop_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    d = str(tmp_path / 'pkg_metro')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=crop_vars,
        joint_info=joint_info, model_class='metro')

    def tiny_builder(name, **kwargs):
        return TinyBackbone(width=8, dtype=jnp.float32)

    m2, variables, cfg2, _, _ = load_crop_model(d, backbone_builder=tiny_builder)
    out = m2.apply(variables, jnp.zeros((2, 64, 64, 3), jnp.float32))
    assert out.shape == (2, 17, 3)
    with pytest.raises(ValueError, match='root-relative'):
        load_pose_estimator(d, backbone_builder=tiny_builder)
