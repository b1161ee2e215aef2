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


# ---------------------------------------------------------------------------
# Round-2 second review pass (pipeline / models)


def test_roundrobin_empty_section_raises():
    from metrabs_tpu.data.pipeline import roundrobin_iterate
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match='empty'):
        next(roundrobin_iterate([[1, 2], []], [1, 1], rng))


def test_build_dataset_sections_reference_semantics():
    """Exact-substring routing (trailing underscore significant) and a
    RuntimeError for unmatched examples (`main.py:364-373`), instead of
    silently shrinking the training set."""
    from metrabs_tpu.data.pipeline import build_dataset_sections

    class Ex:
        def __init__(self, p):
            self.image_path = p

    secs = build_dataset_sections(
        [Ex('/data/h36m_imgs/a.jpg'), Ex('/data/surreal/b.jpg')],
        ['h36m_', 'surreal'])
    assert len(secs[0]) == 1 and len(secs[1]) == 1
    # 'h36m' without the underscore must NOT match the 'h36m_' section.
    with pytest.raises(RuntimeError, match='No section'):
        build_dataset_sections([Ex('/data/h36m/subdir/a.jpg')], ['h36m_'])


def test_parallel_batch_loader_error_is_terminal_and_close_unblocks():
    import itertools
    import time
    from metrabs_tpu.data.pipeline import ParallelBatchLoader

    def boom(ex, rng):
        raise RuntimeError('loader failed')

    loader = ParallelBatchLoader(boom, iter(range(8)), batch_size=2,
                                 n_workers=1)
    with pytest.raises(RuntimeError, match='loader failed'):
        next(loader)
    with pytest.raises(StopIteration):  # terminal, not a hang
        next(loader)

    # close() must unblock a producer stuck on a full prefetch queue.
    def ok(ex, rng):
        return {'x': np.zeros(2, np.float32)}

    loader2 = ParallelBatchLoader(ok, itertools.count(), batch_size=2,
                                  n_workers=1, prefetch_batches=1)
    next(loader2)
    time.sleep(0.3)  # let the producer fill the queue and block in put
    loader2.close()
    loader2._thread.join(timeout=5.0)
    assert not loader2._thread.is_alive()


def test_resnet18_stride_switch_conv2_dilation_correction(rng):
    """rn18 stride_train=32/stride_test=16: the reference's test graph runs
    the affected stage's conv2 at dilation dil_out_test*strides/strides_test
    = 4 (`resnet.py:377-383`) — NOT the dilation-2 a natively-built stride-16
    plan uses. Same weights, same input: the two eval graphs must differ,
    while the train graph matches the native stride-32 one."""
    import jax
    import jax.numpy as jnp
    from metrabs_tpu.models.backbones.resnet import ResNet

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    m_split = ResNet(depth=18, output_stride=32, output_stride_test=16,
                     dtype=jnp.float32)
    m_native16 = ResNet(depth=18, output_stride=16, dtype=jnp.float32)
    m_native32 = ResNet(depth=18, output_stride=32, dtype=jnp.float32)
    params = m_split.init(jax.random.PRNGKey(0), x)

    out_split_eval = m_split.apply(params, x, train=False)
    out_native16 = m_native16.apply(params, x, train=False)
    assert out_split_eval.shape == (1, 4, 4, 512)  # stride 16 at test
    assert out_native16.shape == (1, 4, 4, 512)
    # conv2 dilation 4 vs 2 in the last stage: outputs must differ.
    assert float(jnp.max(jnp.abs(out_split_eval - out_native16))) > 1e-4

    out_split_train = m_split.apply(
        params, x, train=True, mutable=['batch_stats'])[0]
    out_native32_train = m_native32.apply(
        params, x, train=True, mutable=['batch_stats'])[0]
    np.testing.assert_allclose(np.asarray(out_split_train),
                               np.asarray(out_native32_train), atol=1e-5)


def test_resnet_stride4_maxpool_shift_test_graph_only(rng):
    """The bottom-right maxpool shift belongs to the TEST graph when the
    effective test stride is 4, independent of centered_stride
    (`resnet.py:186-193,666`); the train graph always pads symmetrically."""
    import jax
    import jax.numpy as jnp
    from metrabs_tpu.models.backbones.resnet import ResNet

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    # centered_stride=False still shifts at stride_test==4
    m = ResNet(depth=50, output_stride=4, centered_stride=False,
               dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out_eval = m.apply(params, x, train=False)
    assert out_eval.shape[1] == 8  # 32/4
    # train graph: symmetric pad regardless -> same code path as stride 32's
    out_train = m.apply(params, x, train=True, mutable=['batch_stats'])[0]
    assert out_train.shape[1] == 8


def test_builder_rejects_unavailable_effnetv2_stride_tables():
    from metrabs_tpu.models.backbones.builder import build_backbone
    with pytest.raises(ValueError, match='stride16'):
        build_backbone('efficientnetv2-m', stride_test=16)


# ---------------------------------------------------------------------------
# Round-2 third review pass (eval / apps / bench / native)


def test_shard_example_stream_partitions_blocks():
    """Multi-host sharding: processes consume disjoint slices of each global
    block, so a global batch holds distinct examples, not n_proc duplicates
    of one local stream."""
    from metrabs_tpu.data.pipeline import shard_example_stream
    import itertools

    def stream():
        return iter(range(100))

    got = [list(itertools.islice(
        shard_example_stream(stream(), 8, p, 4), 4)) for p in range(4)]
    # First global block 0..7 split two-per-process, in order.
    assert got == [[0, 1, 8, 9], [2, 3, 10, 11],
                   [4, 5, 12, 13], [6, 7, 14, 15]]
    with pytest.raises(ValueError, match='divide'):
        next(shard_example_stream(stream(), 7, 0, 4))


def test_ncps_auc_finite_at_pck_threshold_50():
    """The NCPS-AUC ramp is hardcoded 50..150 like the reference
    (`eval_metrics.py:60`); deriving it from threshold_mm=50 (3DPW) was
    0/0 = NaN."""
    import jax.numpy as jnp
    from metrabs_tpu.eval.metrics import compute_pose3d_metrics
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(4, 17, 3)).astype(np.float32) * 100)
    true = pred + 10.0
    m = compute_pose3d_metrics(pred, true, jnp.ones((4, 17), bool),
                               threshold_mm=50.0)
    assert np.isfinite(float(m['ncps_auc']))
    assert 0.0 <= float(m['ncps_auc']) <= 1.0


def test_3dpw_protocol_uses_lsp14_subset():
    from metrabs_tpu.eval.harness import BENCHMARK_PROTOCOLS, JOINT_SUBSETS
    p = BENCHMARK_PROTOCOLS['3dpw']
    assert p.joint_subset == 'lsp_14_of_h36m17'
    assert len(JOINT_SUBSETS[p.joint_subset]) == 14


def test_associate_predictions_to_masks_empty_frame():
    from metrabs_tpu.eval.association import associate_predictions_to_masks
    from metrabs_tpu.pipeline.skeletons import H36M_17
    from metrabs_tpu.utils.joint_info import JointInfo
    ji = JointInfo(names=tuple(H36M_17.names), edges=tuple(H36M_17.edges))
    out = associate_predictions_to_masks(
        np.zeros((2, 17, 3)), np.zeros((2, 17, 2)), (100, 100), [], ji)
    assert out.shape == (0, 17, 3)


def test_camera_rotate_active_convention():
    """Camera.rotate uses standard ACTIVE rotation matrices for all three
    axes (cameralib's Rz(roll)@Rx(pitch)@Ry(yaw)); the old yaw/pitch
    matrices were transposed, panning/tilting opposite to roll. Pin the
    directions: +yaw turns the camera left (a point dead ahead moves RIGHT
    in the image), +pitch tilts it down (the point moves UP)."""
    from metrabs_tpu.data.camera import Camera
    K = np.array([[1000.0, 0, 500], [0, 1000.0, 400], [0, 0, 1]], np.float32)

    cam = Camera(intrinsic_matrix=K.copy())
    ahead = np.array([0.0, 0.0, 5000.0], np.float32)
    assert np.allclose(cam.world_to_image(ahead), [500, 400], atol=1e-3)

    cam_yaw = Camera(intrinsic_matrix=K.copy())
    cam_yaw.rotate(yaw=0.2)
    assert cam_yaw.world_to_image(ahead)[0] > 500 + 50

    cam_pitch = Camera(intrinsic_matrix=K.copy())
    cam_pitch.rotate(pitch=0.2)
    assert cam_pitch.world_to_image(ahead)[1] < 400 - 50

    # roll direction unchanged: +roll rotates the image CCW around center,
    # so a point to the right of center moves down (y grows).
    cam_roll = Camera(intrinsic_matrix=K.copy())
    right = np.array([1000.0, 0.0, 5000.0], np.float32)
    y_before = cam_roll.world_to_image(right)[1]
    cam_roll.rotate(roll=0.2)
    assert cam_roll.world_to_image(right)[1] > y_before + 10


def test_boxes_from_joints_empty_and_loader_skip():
    from metrabs_tpu.data.datasets import boxes_from_joints
    box = boxes_from_joints(np.full((17, 2), np.nan))
    np.testing.assert_array_equal(box, [0, 0, 0, 0])
    # partial-NaN pose (every joint has one NaN coord) is also empty
    pts = np.ones((5, 2), np.float32)
    pts[:, 0] = np.nan
    np.testing.assert_array_equal(boxes_from_joints(pts), [0, 0, 0, 0])


def test_detect_max_detections_validation():
    """The reference's max_detections=-1 (unlimited) has no fixed-shape
    equivalent; a clear ValueError beats a cryptic negative-dim shape
    error."""
    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    from metrabs_tpu.pipeline.skeletons import H36M_17
    import jax
    import jax.numpy as jnp

    cfg = ModelConfig(proc_side=64, depth=4, n_joints=17, dtype='float32')
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8,
                                                   dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.eye(3)[None])

    class _StubDet:
        pass

    est = PoseEstimator(
        lambda s, c, k, v: model.apply(s, c, k, train=False, sample_valid=v),
        H36M_17, cfg, crop_model_state=params, detector=_StubDet())
    imgs = np.zeros((1, 64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match='positive static capacity'):
        est.detect_poses_batched(imgs, max_detections=-1)
    with pytest.raises(ValueError, match='positive static capacity'):
        est.detect_poses_stream(np.zeros((1, 1, 64, 64, 3), np.uint8),
                                max_detections=0)


def test_huge2d_sections_divisibility_variants():
    """`main.py:344-356`: the huge2d 2D mixture is nudged to 33 examples
    when the batch must split into 3 pieces, 30 for 6, else 32."""
    from metrabs_tpu.data.pipeline import huge2d_sections
    assert sum(huge2d_sections(3).values()) == 33
    assert sum(huge2d_sections(6).values()) == 30
    assert sum(huge2d_sections(1).values()) == 32
    assert sum(huge2d_sections(12).values()) == 32
