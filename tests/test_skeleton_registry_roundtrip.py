"""All-23-convention skeleton registry round-trip in the reference format.

The released reference models ship a `skeleton_infos` pickle
({name: {'indices', 'names', 'edges'}}, consumed by
`multiperson/save_model.py:31-36` / `multiperson_model.py:30-40`) plus an
optional `joint_transform.npy` ('bank,nN->baNk' einsum,
`multiperson_model.py:177-179`). These tests synthesize both assets for the
full 23-name convention list, import them through `load_skeleton_infos` /
`SkeletonRegistry`, and prove every name selects correctly — including through
the packaged-model path and the live estimator with a joint transform. This
is the import path a real released model's registry will take.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrabs_tpu.config import AugConfig, ModelConfig
from metrabs_tpu.pipeline.skeletons import (
    BUILTIN_SKELETONS, REFERENCE_SKELETON_NAMES, SkeletonRegistry,
    load_skeleton_infos)
from metrabs_tpu.utils.joint_info import JointInfo


def _convention_defs():
    """Joint names + edges for all 23 conventions: the real definitions for
    the grounded builtins, count-faithful synthesized ones for the 11
    conventions whose order only exists inside released pickles."""
    defs = {}
    for name in REFERENCE_SKELETON_NAMES:
        if name in BUILTIN_SKELETONS:
            ji = BUILTIN_SKELETONS[name]
            defs[name] = (list(ji.names), [list(e) for e in ji.edges])
        else:
            count = int(name.rsplit('_', 1)[1])
            joints = [f'{name}_j{i}' for i in range(count)]
            edges = [[i, i + 1] for i in range(count - 1)]
            defs[name] = (joints, edges)
    return defs


def _synthesize_assets(n_crop_joints=17, seed=0):
    """Builds (model_joint_names, skeleton_infos_dict, joint_transform).

    Mirrors the released layout: the crop model predicts `n_crop_joints`
    internal joints; joint_transform [n_crop, n_out] linearly maps them to
    the big output joint set; each convention's indices select out of the
    n_out output joints (suffixed-union naming like the released models').
    """
    defs = _convention_defs()
    out_names = []
    infos = {}
    for cname, (joints, edges) in defs.items():
        suffix = cname.rsplit('_', 1)[0]
        indices = []
        for j in joints:
            full = f'{j}_{suffix}'
            if full not in out_names:
                out_names.append(full)
            indices.append(out_names.index(full))
        infos[cname] = dict(indices=indices, names=joints, edges=edges)
    rng = np.random.default_rng(seed)
    transform = rng.normal(
        size=(n_crop_joints, len(out_names))).astype(np.float32) * 0.3
    return out_names, infos, transform


def test_pickle_roundtrip_all_23(tmp_path):
    out_names, infos, _ = _synthesize_assets()
    path = str(tmp_path / 'skeleton_infos.pkl')
    with open(path, 'wb') as f:
        pickle.dump(infos, f)

    loaded = load_skeleton_infos(path)
    assert sorted(loaded) == sorted(REFERENCE_SKELETON_NAMES)
    model_ji = JointInfo(names=tuple(out_names), edges=())
    registry = SkeletonRegistry(model_ji, loaded)
    assert sorted(registry.skeleton_names) == sorted(REFERENCE_SKELETON_NAMES)

    # Every name selects the right joints out of a fake output pose array.
    poses = np.arange(len(out_names), dtype=np.float32)[:, None] * [1., 2., 3.]
    for cname in REFERENCE_SKELETON_NAMES:
        idx = registry.indices(cname)
        want_count = int(cname.rsplit('_', 1)[1])
        assert len(idx) == want_count, cname
        assert list(idx) == infos[cname]['indices'], cname
        sel = poses[idx]
        np.testing.assert_array_equal(sel, poses[infos[cname]['indices']])
        assert registry.joint_names(cname) == tuple(infos[cname]['names'])
        assert registry.joint_edges(cname) == tuple(
            tuple(e) for e in infos[cname]['edges'])
        # Indices must be in range of the transformed output joint set.
        assert idx.min() >= 0 and idx.max() < len(out_names)


def test_package_roundtrip_preserves_all_23(tmp_path):
    """A package saved with the imported registry + joint transform reloads
    with every convention intact (io/packaging.py manifest round-trip)."""
    from metrabs_tpu.io import packaging
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs

    out_names, infos, transform = _synthesize_assets()
    pkl = str(tmp_path / 'skeleton_infos.pkl')
    with open(pkl, 'wb') as f:
        pickle.dump(infos, f)
    loaded = load_skeleton_infos(pkl)
    model_ji = JointInfo(names=tuple(out_names), edges=())
    registry = SkeletonRegistry(model_ji, loaded)

    cfg = ModelConfig(proc_side=64, stride_train=32, stride_test=32,
                      depth=4, n_joints=17, dtype='float32')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.eye(3)[jnp.newaxis])
    crop_ji = JointInfo(
        names=tuple(f'j{i}' for i in range(17)),
        edges=tuple((i, i + 1) for i in range(16)))

    pkg = str(tmp_path / 'pkg')
    packaging.save_pose_estimator_package(
        pkg, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=variables,
        joint_info=crop_ji, skeleton_registry=registry,
        joint_transform_matrix=transform)

    est = packaging.load_pose_estimator(pkg)
    assert sorted(est.skeletons.skeleton_names) == sorted(
        REFERENCE_SKELETON_NAMES)
    for cname in REFERENCE_SKELETON_NAMES:
        np.testing.assert_array_equal(
            est.skeletons.indices(cname), np.asarray(infos[cname]['indices']))
        assert est.per_skeleton_joint_names[cname] == tuple(
            infos[cname]['names'])


@pytest.mark.parametrize('cname', ['h36m_17', 'ghum_35', 'smplx_42'])
def test_estimator_selects_loaded_skeleton(tmp_path, cname):
    """Live estimator check on a builtin and two pickle-only conventions:
    with the loaded registry + joint transform, estimate_poses_batched
    emits exactly the gather of the full transformed output
    (`multiperson_model.py:461-463` + 177-179 equivalence)."""
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.estimator import PoseEstimator

    out_names, infos, transform = _synthesize_assets()
    pkl = str(tmp_path / 'skeleton_infos.pkl')
    with open(pkl, 'wb') as f:
        pickle.dump(infos, f)
    loaded = load_skeleton_infos(pkl)
    model_ji = JointInfo(names=tuple(out_names), edges=())
    registry = SkeletonRegistry(model_ji, loaded)

    cfg = ModelConfig(proc_side=64, stride_train=32, stride_test=32,
                      depth=4, n_joints=17, dtype='float32')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.eye(3)[jnp.newaxis])
    crop_ji = JointInfo(
        names=tuple(f'j{i}' for i in range(17)),
        edges=tuple((i, i + 1) for i in range(16)))

    def crop_model_fn(crops, intrinsics, sample_valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    est = PoseEstimator(crop_model_fn, crop_ji, cfg,
                        skeleton_registry=registry,
                        joint_transform_matrix=transform)

    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, size=(1, 96, 96, 3), dtype=np.uint8)
    boxes = np.array([[[8., 8., 60., 80.]]], np.float32)
    box_valid = np.ones((1, 1), bool)

    full = est.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1, skeleton='')
    sel = est.estimate_poses_batched(
        images, boxes, box_valid, num_aug=1, skeleton=cname)
    idx = registry.indices(cname)
    assert sel['poses3d'].shape[-2] == len(idx)
    np.testing.assert_allclose(
        np.asarray(sel['poses3d']), np.asarray(full['poses3d'])[..., idx, :],
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sel['poses2d']), np.asarray(full['poses2d'])[..., idx, :],
        atol=1e-5)
