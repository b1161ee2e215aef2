"""END-TO-END multi-person pipeline parity against the executed reference.

The deepest oracle in the suite: the reference's ACTUAL
`multiperson/multiperson_model.py:Pose3dEstimator.estimate_poses_batched`
graph runs (crop geometry + look-at homography + pyramid warp + gamma TTA +
rot/flip TTA + crop model + mirror unswap + camera-back-rotation + absolute
reconstruction + 2D projection + skeleton gather + aug averaging) with the
executed EffNetV2-S fork as the backbone, and the result is compared against
our `PoseEstimator.estimate_poses_batched` with the same weights, boxes and
camera parameters.

The tfa resample primitives inside the reference warp are functional
stand-ins that delegate to TF core's ImageProjectiveTransformV3 raw op —
the exact op tfa.image.transform wraps (see tests/_reference_oracle.py) —
so no re-implemented resample math sits on the oracle side of the
comparison for the zero-distortion path.

Reference cites: `multiperson/multiperson_model.py:16-360`,
`multiperson/warping.py:8-93`, `multiperson/save_model.py:21-24` (the
packaging-time TTA defaults).
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax
import jax.numpy as jnp

from tests import _reference_oracle
from tests import test_full_model_oracle as tfmo
from tests import test_tf_oracle_backbone as tob

pytestmark = [pytest.mark.oracle, pytest.mark.skipif(
    not tf.keras.__name__.startswith('tf_keras'),
    reason='reference EffNetV2 fork requires legacy Keras 2')]

PROC_SIDE = tfmo.PROC_SIDE


@pytest.fixture(scope='module')
def ref():
    return _reference_oracle.load_reference_multiperson()


@pytest.fixture(scope='module')
def ref_models():
    return _reference_oracle.load_reference_models()


@pytest.fixture(scope='module')
def fork_modules():
    return tob.get_fork_modules()


@pytest.fixture
def ref_flags(ref):
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
    f.rot_aug = 25.0
    f.rot_aug_360 = False
    f.rot_aug_360_half = False
    yield f
    f.__dict__.clear()
    f.__dict__.update(saved)


@pytest.fixture
def bone_means_slot():
    """Restores the module-global oracle bone-prior slot after the test
    (it is consumed by the reference's load_pickle stub,
    `_reference_oracle.py:63`)."""
    saved = _reference_oracle.BONE_MEANS[0]
    yield _reference_oracle.BONE_MEANS
    _reference_oracle.BONE_MEANS[0] = saved


def _h36m_joint_info():
    from metrabs_tpu.pipeline.skeletons import H36M_17
    return H36M_17


def _build_pair(ref, ref_models, fork_modules, rng):
    """(reference Pose3dEstimator, our PoseEstimator) sharing all weights."""
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.estimator import PoseEstimator

    ji = _h36m_joint_info()
    import posepile.joint_info as ref_ji_mod
    ref_ji = ref_ji_mod.JointInfo(list(ji.names), np.asarray(ji.edges))
    # The stub's l/r prefix-swap mirror mapping must agree with ours, or the
    # flip-TTA comparison is meaningless.
    np.testing.assert_array_equal(ref_ji.mirror_mapping, ji.mirror_mapping)

    backbone, fork = tfmo._ref_backbone(fork_modules, rng)
    ji_ns = type('JI', (), dict(
        names=list(ji.names), stick_figure_edges=list(ji.edges),
        n_joints=len(ji.names)))()
    crop_model = ref_models.models_metrabs.Metrabs(backbone, ji_ns)
    img_example = tfmo._images(rng)
    intr_example = tfmo._intrinsics(img_example.shape[0])
    crop_model.call((tf.constant(img_example), tf.constant(intr_example)),
                    training=False)  # build the head
    feats = backbone(tf.constant(img_example), training=False).numpy()
    tfmo._randomize_head(crop_model.heatmap_heads.conv_final, feats, rng)

    skeleton_infos = {'': dict(indices=list(range(ji_ns.n_joints)),
                               names=list(ji.names),
                               edges=np.asarray(ji.edges, np.int32))}
    ref_est = ref.multiperson_model.Pose3dEstimator(
        crop_model, detector=None, skeleton_infos=skeleton_infos,
        joint_transform_matrix=None)

    cfg = tfmo._our_cfg(n_joints=ji_ns.n_joints)
    our_model = Metrabs(cfg=cfg, backbone=tfmo._build_our_backbone())
    variables = tfmo._our_variables_from_ref(
        our_model, fork, crop_model.heatmap_heads.conv_final,
        example=(img_example, intr_example))
    our_est = PoseEstimator(
        lambda state, c, k, v: our_model.apply(
            state, c, k, train=False, sample_valid=v),
        ji, cfg, crop_model_state=variables)
    return ref_est, our_est


def _scene(rng):
    images = rng.integers(0, 256, size=(2, 240, 320, 3), dtype=np.uint8)
    K = np.array([[300.0, 0, 160], [0, 310.0, 118], [0, 0, 1]], np.float32)
    # Boxes comfortably inside the frame (border-fill conventions at the
    # image edge are the one place the zero-distortion reference path —
    # raw-op transform with constant fill — and our padded-gather warp could
    # legitimately differ by a border pixel).
    boxes_list = [
        [[60.0, 40.0, 90.0, 170.0], [170.0, 60.0, 80.0, 150.0]],
        [[110.0, 30.0, 100.0, 180.0]],
    ]
    return images, K, boxes_list


def _run_ours(our_est, images, K, boxes_list, **kw):
    max_b = max(len(b) for b in boxes_list)
    boxes = np.zeros((len(boxes_list), max_b, 4), np.float32)
    valid = np.zeros((len(boxes_list), max_b), bool)
    for i, bs in enumerate(boxes_list):
        boxes[i, :len(bs)] = bs
        valid[i, :len(bs)] = True
    out = our_est.estimate_poses_batched(
        jnp.asarray(images), jnp.asarray(boxes),
        box_valid=jnp.asarray(valid),
        intrinsic_matrix=jnp.asarray(np.tile(K[None], (len(boxes_list), 1, 1))),
        **kw)
    return out, valid


@pytest.mark.parametrize('average_aug', [True, False])
def test_estimate_poses_batched_matches_reference(
        ref, ref_models, ref_flags, fork_modules, rng, average_aug):
    ref_est, our_est = _build_pair(ref, ref_models, fork_modules, rng)
    images, K, boxes_list = _scene(rng)

    want = ref_est.estimate_poses_batched(
        images=tf.constant(images),
        boxes=tf.ragged.constant(boxes_list, dtype=tf.float32, ragged_rank=1),
        intrinsic_matrix=tf.constant(K[None]),
        distortion_coeffs=tf.zeros((1, 5), tf.float32),
        extrinsic_matrix=tf.constant(np.eye(4, dtype=np.float32)[None]),
        world_up_vector=tf.constant((0.0, -1.0, 0.0)),
        default_fov_degrees=tf.constant(55.0),
        internal_batch_size=tf.constant(64),
        antialias_factor=tf.constant(1),
        num_aug=tf.constant(2),
        average_aug=tf.constant(average_aug),
        skeleton=tf.constant(''))

    got, valid = _run_ours(our_est, images, K, boxes_list,
                           num_aug=2, average_aug=average_aug)

    for i, bs in enumerate(boxes_list):
        want3d = want['poses3d'][i].numpy()
        want2d = want['poses2d'][i].numpy()
        got3d = np.asarray(got['poses3d'])[i][valid[i]]
        got2d = np.asarray(got['poses2d'])[i][valid[i]]
        assert want3d.shape == got3d.shape, (want3d.shape, got3d.shape)
        # Millimeter scale; the remaining gap is the reference's f16 cast at
        # the crop-model call boundary (`multiperson_model.py:305-307`,
        # ours stays f32) plus resample-edge fp differences.
        np.testing.assert_allclose(got3d, want3d, atol=5.0,
                                   err_msg=f'poses3d image {i}')
        # 2D wiggles up to ~1px (averaged) / ~2px (per-aug) through the f16
        # crop-cast quantization (`multiperson_model.py:305-307`; ours is
        # f32) — observed 0.63px max on the averaged path in-suite.
        np.testing.assert_allclose(got2d, want2d,
                                   atol=1.0 if average_aug else 2.0,
                                   err_msg=f'poses2d image {i}')


def test_estimate_poses_with_distortion_matches_reference(
        ref, ref_models, ref_flags, fork_modules, rng):
    """Nonzero lens distortion: the reference warp takes the per-pixel
    distortion-field + interpolate_bilinear path (`warping.py:73-93`) and
    the 2D projection distorts points; ours is the always-distort
    branch-free formulation."""
    ref_est, our_est = _build_pair(ref, ref_models, fork_modules, rng)
    images, K, boxes_list = _scene(rng)
    dist = np.array([[-0.2, 0.05, 0.001, -0.001, 0.01]], np.float32)

    want = ref_est.estimate_poses_batched(
        images=tf.constant(images),
        boxes=tf.ragged.constant(boxes_list, dtype=tf.float32, ragged_rank=1),
        intrinsic_matrix=tf.constant(K[None]),
        distortion_coeffs=tf.constant(dist),
        extrinsic_matrix=tf.constant(np.eye(4, dtype=np.float32)[None]),
        world_up_vector=tf.constant((0.0, -1.0, 0.0)),
        default_fov_degrees=tf.constant(55.0),
        internal_batch_size=tf.constant(64),
        antialias_factor=tf.constant(1),
        num_aug=tf.constant(2),
        average_aug=tf.constant(True),
        skeleton=tf.constant(''))

    got, valid = _run_ours(our_est, images, K, boxes_list,
                           num_aug=2, average_aug=True,
                           distortion_coeffs=jnp.asarray(
                               np.tile(dist, (len(boxes_list), 1))))

    for i in range(len(boxes_list)):
        want3d = want['poses3d'][i].numpy()
        got3d = np.asarray(got['poses3d'])[i][valid[i]]
        np.testing.assert_allclose(got3d, want3d, atol=5.0,
                                   err_msg=f'poses3d image {i}')


def test_estimate_poses_world_space_matches_reference(
        ref, ref_models, ref_flags, fork_modules, rng):
    """Non-identity extrinsics + tilted world-up: the world-space transform
    and the camspace-up TTA rotation axis both come from the extrinsic
    matrix (`multiperson_model.py:135-137,216-221`)."""
    ref_est, our_est = _build_pair(ref, ref_models, fork_modules, rng)
    images, K, boxes_list = _scene(rng)
    angle = np.deg2rad(12.0)
    R = np.array([[1, 0, 0],
                  [0, np.cos(angle), -np.sin(angle)],
                  [0, np.sin(angle), np.cos(angle)]], np.float32)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, :3] = R
    extr[:3, 3] = [100.0, -50.0, 30.0]
    up = np.array([0.05, -0.99, 0.1], np.float32)

    want = ref_est.estimate_poses_batched(
        images=tf.constant(images),
        boxes=tf.ragged.constant(boxes_list, dtype=tf.float32, ragged_rank=1),
        intrinsic_matrix=tf.constant(K[None]),
        distortion_coeffs=tf.zeros((1, 5), tf.float32),
        extrinsic_matrix=tf.constant(extr[None]),
        world_up_vector=tf.constant(up),
        default_fov_degrees=tf.constant(55.0),
        internal_batch_size=tf.constant(64),
        antialias_factor=tf.constant(1),
        num_aug=tf.constant(2),
        average_aug=tf.constant(True),
        skeleton=tf.constant(''))

    got, valid = _run_ours(our_est, images, K, boxes_list,
                           num_aug=2, average_aug=True,
                           extrinsic_matrix=jnp.asarray(
                               np.tile(extr[None], (len(boxes_list), 1, 1))),
                           world_up_vector=tuple(up.tolist()))

    for i in range(len(boxes_list)):
        want3d = want['poses3d'][i].numpy()
        got3d = np.asarray(got['poses3d'])[i][valid[i]]
        np.testing.assert_allclose(got3d, want3d, atol=5.0,
                                   err_msg=f'poses3d image {i}')


def test_detect_filter_composition_matches_reference(
        ref, ref_models, ref_flags, fork_modules, rng, bone_means_slot):
    """The suppress_implausible_poses COMPOSITION (per-pose plausibility
    checks -> combined mask -> score-ordered pose NMS -> gather of
    boxes/poses, `multiperson_model.py:198-205,322-360`) end to end, driven
    with confidence-carrying boxes through both sides' internal paths — no
    detector needed (the reference's detect_poses_batched is exactly
    _get_boxes + this path). Individual checks are oracled in
    test_reference_parity; this pins their wiring.

    Overlapping duplicate boxes exercise the pose-NMS suppression; the
    injected mean-bone table is derived from the model's own output so the
    duplicates are PLAUSIBLE and only NMS separates them."""
    # First pass without filtering to harvest poses for a bone table.
    ref_est, our_est0 = _build_pair(ref, ref_models, fork_modules, rng)
    images, K, _ = _scene(rng)
    boxes_list = [
        [[60.0, 40.0, 90.0, 170.0],
         [63.0, 42.0, 92.0, 168.0],      # near-duplicate -> NMS suppressed
         [170.0, 60.0, 80.0, 150.0]],
        [[110.0, 30.0, 100.0, 180.0]],
    ]
    conf_list = [[0.9, 0.8, 0.7], [0.95]]

    pre = ref_est.estimate_poses_batched(
        images=tf.constant(images),
        boxes=tf.ragged.constant(boxes_list, dtype=tf.float32, ragged_rank=1),
        intrinsic_matrix=tf.constant(K[None]),
        distortion_coeffs=tf.zeros((1, 5), tf.float32),
        extrinsic_matrix=tf.constant(np.eye(4, dtype=np.float32)[None]),
        world_up_vector=tf.constant((0.0, -1.0, 0.0)),
        default_fov_degrees=tf.constant(55.0),
        internal_batch_size=tf.constant(64),
        antialias_factor=tf.constant(1),
        num_aug=tf.constant(2),
        average_aug=tf.constant(True),
        skeleton=tf.constant(''))
    sample_pose = pre['poses3d'][0][0].numpy()
    from metrabs_tpu.pipeline.skeletons import H36M_17
    edges = np.asarray(H36M_17.edges)
    mean_bones = np.linalg.norm(
        sample_pose[edges[:, 0]] - sample_pose[edges[:, 1]], axis=-1
    ).astype(np.float32)
    _reference_oracle.BONE_MEANS[0] = mean_bones

    from metrabs_tpu.pipeline.estimator import PoseEstimator
    our_est = PoseEstimator(
        our_est0.crop_model_fn_with_state, H36M_17, our_est0.cfg,
        crop_model_state=our_est0.crop_model_state,
        bone_mean_lengths=mean_bones)

    ref_flags.bone_length_dataset = ''
    boxes5 = tf.ragged.constant(
        [[b + [c] for b, c in zip(bs, cs)]
         for bs, cs in zip(boxes_list, conf_list)],
        dtype=tf.float32, ragged_rank=1)
    want = ref_est._estimate_poses_batched(
        tf.constant(images), boxes5,
        tf.constant(K[None]), tf.zeros((1, 5), tf.float32),
        tf.constant(np.eye(4, dtype=np.float32)[None]),
        tf.constant((0.0, -1.0, 0.0)), tf.constant(55.0),
        tf.constant(64), tf.constant(1), tf.constant(2),
        tf.constant(True), tf.constant(''),
        suppress_implausible_poses=tf.constant(True))

    max_b = max(len(b) for b in boxes_list)
    b5 = np.zeros((2, max_b, 5), np.float32)
    valid = np.zeros((2, max_b), bool)
    for i, (bs, cs) in enumerate(zip(boxes_list, conf_list)):
        for j, (b, c) in enumerate(zip(bs, cs)):
            b5[i, j] = b + [c]
            valid[i, j] = True
    got = our_est._run(
        jnp.asarray(images), jnp.asarray(b5), jnp.asarray(valid),
        jnp.asarray(np.tile(K[None], (2, 1, 1))), None, None,
        (0, -1, 0), 55.0, 64, 1, 2, True, '', suppress=True)
    got_valid = np.asarray(got['valid']).astype(bool)

    for i in range(2):
        want_boxes = want['boxes'][i].numpy()
        got_boxes = np.asarray(got['boxes'])[i][got_valid[i]]
        # The duplicate must actually have been suppressed for the test to
        # have teeth.
        if i == 0:
            assert len(want_boxes) < len(boxes_list[0])
        assert want_boxes.shape == got_boxes.shape, (
            want_boxes.shape, got_boxes.shape)
        order_w = np.argsort(-want_boxes[:, 4])
        order_g = np.argsort(-got_boxes[:, 4])
        np.testing.assert_allclose(
            got_boxes[order_g], want_boxes[order_w], atol=1e-3,
            err_msg=f'boxes image {i}')
        want3d = want['poses3d'][i].numpy()[order_w]
        got3d = np.asarray(got['poses3d'])[i][got_valid[i]][order_g]
        np.testing.assert_allclose(got3d, want3d, atol=5.0,
                                   err_msg=f'poses3d image {i}')


def test_estimate_poses_antialias_and_single_aug_matches_reference(
        ref, ref_models, ref_flags, fork_modules, rng):
    """Two SURVEY §8 landmines through the full pipeline: (a)
    antialias_factor=2 — supersampled warp + box-downsample, with the
    antialias factor folded into the pyramid-level crop_scales
    (`multiperson_model.py:367`, `warping.py:8-30`); (b) num_aug=1 is NOT
    augmentation-free — tfu.linspace midpoints give gamma 0.8, scale 1.05,
    angle 0, no flip (`tfu.py:246-254`, SURVEY §8.2)."""
    ref_est, our_est = _build_pair(ref, ref_models, fork_modules, rng)
    images, K, boxes_list = _scene(rng)

    want = ref_est.estimate_poses_batched(
        images=tf.constant(images),
        boxes=tf.ragged.constant(boxes_list, dtype=tf.float32, ragged_rank=1),
        intrinsic_matrix=tf.constant(K[None]),
        distortion_coeffs=tf.zeros((1, 5), tf.float32),
        extrinsic_matrix=tf.constant(np.eye(4, dtype=np.float32)[None]),
        world_up_vector=tf.constant((0.0, -1.0, 0.0)),
        default_fov_degrees=tf.constant(55.0),
        internal_batch_size=tf.constant(64),
        antialias_factor=tf.constant(2),
        num_aug=tf.constant(1),
        average_aug=tf.constant(True),
        skeleton=tf.constant(''))

    got, valid = _run_ours(our_est, images, K, boxes_list,
                           num_aug=1, average_aug=True, antialias_factor=2)

    for i in range(len(boxes_list)):
        want3d = want['poses3d'][i].numpy()
        got3d = np.asarray(got['poses3d'])[i][valid[i]]
        assert want3d.shape == got3d.shape
        np.testing.assert_allclose(got3d, want3d, atol=5.0,
                                   err_msg=f'poses3d image {i}')
