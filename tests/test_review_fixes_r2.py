"""Regression tests for the round-2 library-review findings."""

import numpy as np
import pytest

from metrabs_tpu.data import masks
from metrabs_tpu.io import tf_checkpoint
from metrabs_tpu.utils.profiling import StageTimer


def test_tf_checkpoint_uint16_roundtrip(tmp_path):
    """uint16 must write as DT_UINT16, not get claimed by the DT_BFLOAT16
    raw-uint16 read alias (which made the reader reinterpret the integers
    as bfloat16 bits)."""
    prefix = str(tmp_path / 'ckpt')
    x = np.arange(5, dtype=np.uint16)
    tf_checkpoint.write_tf_checkpoint(prefix, {'x': x})
    out = tf_checkpoint.load_tf_checkpoint(prefix)
    assert out['x'].dtype == np.uint16
    np.testing.assert_array_equal(out['x'], x)


def test_tf_checkpoint_bfloat16_roundtrip(tmp_path):
    import ml_dtypes
    prefix = str(tmp_path / 'ckpt_bf16')
    x = np.asarray([1.0, -2.5, 0.125], ml_dtypes.bfloat16)
    tf_checkpoint.write_tf_checkpoint(prefix, {'x': x})
    out = tf_checkpoint.load_tf_checkpoint(prefix)
    # DT_BFLOAT16 reads back as raw uint16; reinterpretation recovers values
    np.testing.assert_array_equal(
        out['x'].view(ml_dtypes.bfloat16)
        if out['x'].dtype == np.uint16 else out['x'].astype(ml_dtypes.bfloat16),
        x)


def test_packaging_missing_joint_transform_raises(tmp_path):
    """A manifest that declares a joint transform whose .npy is missing must
    fail loudly, not silently change the output joint convention."""
    import os
    import jax
    import jax.numpy as jnp
    from metrabs_tpu.config import AugConfig, ModelConfig
    from metrabs_tpu.io.packaging import (
        load_pose_estimator, save_pose_estimator_package)
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17
    from metrabs_tpu.utils.joint_info import JointInfo

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32',
                      backbone='tiny', warp_backend='gather')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8,
                                                   dtype=jnp.float32))
    crop_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.eye(3)[None])
    joint_info = JointInfo(names=tuple(H36M_17.names),
                           edges=tuple(H36M_17.edges))
    d = str(tmp_path / 'pkg')
    save_pose_estimator_package(
        d, cfg=cfg, aug_cfg=AugConfig(), crop_model_variables=crop_vars,
        joint_info=joint_info,
        joint_transform_matrix=np.eye(17, dtype=np.float32))
    os.remove(os.path.join(d, 'joint_transform.npy'))

    def tiny_builder(name, **kwargs):
        return TinyBackbone(width=8, dtype=jnp.float32)

    with pytest.raises(FileNotFoundError, match='joint_transform'):
        load_pose_estimator(d, backbone_builder=tiny_builder)


def test_masks_bool_morphology():
    m = np.zeros((20, 20), bool)
    m[5:15, 5:15] = True
    d = masks.dilate(m, 3)
    e = masks.erode(m, 3)
    ring = masks.outline(m, 1, 5)
    assert d.dtype == bool and e.dtype == bool and ring.dtype == bool
    assert d.sum() > m.sum() > e.sum()
    assert not np.any(ring & m)


def test_masks_to_label_map_empty():
    lm = masks.masks_to_label_map([], imshape=(6, 8))
    assert lm.shape == (6, 8) and lm.sum() == 0
    with pytest.raises(ValueError, match='imshape'):
        masks.masks_to_label_map([])


def test_stage_timer_fences_outputs():
    """The stage handle registers block outputs; exit blocks on them, so the
    recorded time covers device completion (smoke-testable only on CPU, but
    the fence wiring itself is observable)."""
    import jax.numpy as jnp
    timer = StageTimer()
    with timer.stage('mul') as s:
        y = s.fence(jnp.ones((8, 8)) * 3)
    assert float(y[0, 0]) == 3.0
    assert timer.counts['mul'] == 1
    assert 'mul' in timer.report()


def test_plot_poses_3d_returns_none_when_saved(tmp_path):
    from metrabs_tpu.utils.viz import plot_poses_3d
    pose = np.random.default_rng(0).normal(size=(1, 4, 3)).astype(np.float32)
    out = plot_poses_3d(pose, [(0, 1), (2, 3)],
                        out_path=str(tmp_path / 'p.png'))
    assert out is None
    assert (tmp_path / 'p.png').exists()
    fig = plot_poses_3d(pose, [(0, 1)])
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close(fig)
