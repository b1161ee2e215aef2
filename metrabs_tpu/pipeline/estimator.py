"""Multi-person absolute 3D pose estimation: the fused TPU pipeline.

TPU-native re-design of `metrabs_tf/multiperson/multiperson_model.py`. The
reference is a SavedModel whose graph loops over crop chunks (TensorArray) and
over crops (autograph warp loop) calling C++ custom ops. Here the entire
boxes -> crops -> TTA -> backbone -> decode -> reconstruct -> filter -> world
flow is ONE jit-compiled function:

 - raggedness is eliminated: boxes come padded to [batch, max_boxes] with a
   validity mask; the empty-detection special case (`multiperson_model.py:
   107-112,417-439`) disappears under masking;
 - the TTA axis is folded into the crop batch: all num_aug x n_boxes crops are
   produced by one batched gather warp and one backbone forward;
 - `internal_batch_size` chunking becomes a `lax.map` over equally-shaped
   chunks (`multiperson_model.py:241-290`), bounding peak memory without
   recompilation;
 - skeleton selection is a static gather (no DenseHashTable);
 - plausibility filtering + pose NMS run as masked fixed-shape ops on device.

Static (compile-time) arguments: num_aug, average_aug, antialias_factor,
internal_batch_size, skeleton, suppress_implausible_poses, max_boxes. Each
combination is its own specialized XLA program, cached by jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import AugConfig, ModelConfig
from metrabs_tpu.ops import camera as camera_ops
from metrabs_tpu.ops import distortion as distortion_ops
from metrabs_tpu.ops import rotation as rotation_ops
from metrabs_tpu.ops import warp as warp_ops
from metrabs_tpu.ops import warp_pallas
from metrabs_tpu.parallel import mesh as mesh_helpers
from metrabs_tpu.pipeline import plausibility
from metrabs_tpu.pipeline import tta as tta_mod
from metrabs_tpu.pipeline.skeletons import SkeletonRegistry
from metrabs_tpu.utils.joint_info import JointInfo

# Default mean bone lengths (mm) for the built-in h36m_17 skeleton's edges,
# used by the plausibility filter. The reference loads these from a dataset
# pickle frozen into the SavedModel (`plausibility_check.py:12-16`); they are
# a replaceable asset here too (pass bone_mean_lengths to PoseEstimator).
H36M_17_MEAN_BONES_MM = np.array(
    [130.0, 450.0, 445.0, 130.0, 450.0, 445.0, 235.0, 250.0, 115.0, 115.0,
     150.0, 280.0, 250.0, 150.0, 280.0, 250.0], np.float32)


def _get_new_rotation_and_scale(
        intrinsic_matrix: jnp.ndarray, distortion_coeffs: jnp.ndarray,
        camspace_up: jnp.ndarray, boxes: jnp.ndarray, box_valid: jnp.ndarray,
        proc_side: int):
    """Per-box look-at rotation and zoom factor (`multiperson_model.py:383-415`).

    Returns (R_noaug [N,3,3], box_scales [N]). Degenerate (padding) boxes get
    scale 1 and identity-ish rotations; their outputs are masked downstream.
    """
    x, y, w, h = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    # Center + 4 side midpoints, in homogeneous pixel coords.
    pts = jnp.stack([
        jnp.stack([x + w / 2, y + h / 2], axis=1),
        jnp.stack([x + w / 2, y], axis=1),
        jnp.stack([x + w, y + h / 2], axis=1),
        jnp.stack([x + w / 2, y + h], axis=1),
        jnp.stack([x, y + h / 2], axis=1)], axis=1)  # [N, 5, 2]
    inv_k = jnp.linalg.inv(intrinsic_matrix)
    pts_cam = jnp.einsum(
        'bpc,bCc->bpC', camera_ops.to_homogeneous(pts), inv_k, precision='highest')
    pts_cam = camera_ops.to_homogeneous(distortion_ops.undistort_points(
        pts_cam[:, :, :2], distortion_coeffs[:, jnp.newaxis, :]))

    box_center_cam = pts_cam[:, 0]
    R_noaug = rotation_ops.lookat_rotation_matrix(box_center_cam, camspace_up)

    side_cam = pts_cam[:, 1:5]
    side_new = camera_ops.project(jnp.einsum(
        'bpc,bCc->bpC', side_cam,
        jnp.einsum('bij,bjk->bik', intrinsic_matrix, R_noaug, precision='highest'),
        precision='highest'))
    vertical = jnp.linalg.norm(side_new[:, 0] - side_new[:, 2], axis=-1)
    horizontal = jnp.linalg.norm(side_new[:, 1] - side_new[:, 3], axis=-1)
    box_size_new = jnp.maximum(vertical, horizontal)
    box_ok = jnp.logical_and(box_valid, box_size_new > 0)
    box_scales = jnp.where(
        box_ok, jnp.float32(proc_side) / jnp.where(box_ok, box_size_new, 1.0), 1.0)
    return R_noaug, box_scales


@dataclasses.dataclass(frozen=True)
class EstimatorSpec:
    """Static configuration closed over by the jitted pipeline."""
    cfg: ModelConfig
    aug_cfg: AugConfig
    n_joints_model: int  # raw joint count the crop model emits
    n_joints_out: int    # after optional joint_transform_matrix


def estimate_poses_batched_fn(
        crop_model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        spec: EstimatorSpec,
        mirror_mapping: np.ndarray,
        joint2bone_mat: np.ndarray,
        mean_bones: np.ndarray,
        joint_transform_matrix: Optional[np.ndarray] = None):
    """Builds the core batched estimation function.

    `crop_model_fn(crop_state, crops_f[N,S,S,3], intrinsics[N,3,3],
    sample_valid[N]) -> poses3d[N,J,3]` is the raw crop model, mirroring the
    L5->L3 interface `crop_model.predict_multi` (`multiperson_model.py:
    305-307`) plus a padding-validity mask that keeps garbage crops out of the
    reconstruction's pooled RMS normalization. `crop_state` (the model's
    variables pytree) is threaded through as a jit ARGUMENT — closing over
    parameters would embed them as constants in the HLO, which breaks
    remote compilation (HTTP 413 on the tunnel) and bloats executables.
    """
    cfg = spec.cfg
    res = cfg.proc_side

    def fn(crop_state, images, boxes, box_valid, intrinsic_matrix,
           distortion_coeffs, extrinsic_matrix, world_up_vector,
           default_fov_degrees,
           *, num_aug: int, average_aug: bool, antialias_factor: int,
           internal_batch_size: int, skeleton_indices: Tuple[int, ...],
           suppress_implausible_poses: bool) -> Dict[str, jnp.ndarray]:
        n_images, img_h, img_w = images.shape[0], images.shape[1], images.shape[2]
        max_boxes = boxes.shape[1]
        n_total = n_images * max_boxes

        # Default intrinsics from FOV where unknown (all entries == -1).
        fov_k = camera_ops.intrinsics_from_fov(default_fov_degrees, (img_h, img_w))
        unknown = jnp.all(intrinsic_matrix == -1, axis=(-2, -1), keepdims=True)
        intrinsic_matrix = jnp.where(unknown, fov_k, intrinsic_matrix)

        # Up-vector in camera space (`multiperson_model.py:134-136`).
        camspace_up = jnp.einsum(
            'c,bCc->bC', world_up_vector, extrinsic_matrix[..., :3, :3],
            precision='highest')

        # Flatten [B, max_boxes] -> [N]; camera params repeat per box.
        boxes_flat = boxes.reshape(n_total, boxes.shape[-1])
        valid_flat = box_valid.reshape(n_total)
        image_ids = jnp.repeat(jnp.arange(n_images, dtype=jnp.int32), max_boxes)
        k_flat = jnp.repeat(intrinsic_matrix, max_boxes, axis=0)
        dist_flat = jnp.repeat(distortion_coeffs, max_boxes, axis=0)

        # Compact valid boxes to the front (stable) so padding concentrates
        # in trailing chunks, which predict_chunk skips at RUNTIME via
        # lax.cond — sparse scenes don't pay warp+backbone for max_detections
        # worth of padding (the reference's ragged flat_values equivalent,
        # `multiperson_model.py:248-249`, under static shapes).
        up_flat = jnp.repeat(camspace_up, max_boxes, axis=0)
        compaction_order = jnp.argsort(jnp.logical_not(valid_flat),
                                       stable=True)
        inv_compaction = jnp.argsort(compaction_order)
        # Only the chunk loop consumes the compacted copies; k_flat/dist_flat
        # keep ORIGINAL order for the downstream 2D projection (so only the
        # poses need un-compacting after prediction).
        boxes_c_flat = boxes_flat[compaction_order]
        valid_c_flat = valid_flat[compaction_order]
        image_ids_c = image_ids[compaction_order]
        k_c_flat = k_flat[compaction_order]
        dist_c_flat = dist_flat[compaction_order]
        up_c_flat = up_flat[compaction_order]

        # TTA schedules (static; numpy at trace time).
        tta = tta_mod.make_tta_params(num_aug, spec.aug_cfg)
        gammas = jnp.asarray(tta.gammas)
        aug_scales = jnp.asarray(tta.scales)
        rotflip = jnp.asarray(tta.rotflip_mats)
        should_flip = jnp.asarray(tta.should_flip)

        # Linearize gamma once for the whole image (`multiperson_model.py:252`).
        # Backend choice for the crop resample: the Pallas MXU kernel
        # (ops/warp_pallas.py) on TPU, the XLA gather otherwise. The pyramid
        # canvas folds the gamma decode into its one NHWC->channel-major
        # relayout (on uint8: 4x cheaper than transposing decoded f32) and is
        # built ONCE per batch, hoisted out of the chunk loop.
        out_side = res * antialias_factor
        backend = cfg.warp_backend
        if backend == 'auto':
            backend = ('tiled' if jax.default_backend() == 'tpu'
                       and out_side % warp_pallas.TR == 0
                       and out_side % warp_pallas.TC == 0 else 'gather')
        if backend.startswith('tiled'):
            # The build (~13 ms device for 8x1080p: u8 relayout + gamma
            # decode + pools) runs under lax.cond so a batch with ZERO valid
            # detections skips it entirely — together with the per-chunk
            # cond below this makes the no-person cost just detector +
            # zero-fill (profile: scripts/profile_trace_fused.py).
            level_rows, level_dims, canvas_shape = \
                warp_pallas.pyramid_canvas_layout(images.shape)
            canvas = jax.lax.cond(
                jnp.any(valid_flat),
                lambda im: warp_pallas.build_pyramid_canvas(
                    im, gamma_decode=True)[0],
                lambda im: jnp.zeros(canvas_shape, jnp.float32),
                images)
            pyramid_canvas = (canvas, level_rows, level_dims)
            images_lin = None
        else:
            pyramid_canvas = None
            images_lin = (images.astype(jnp.float32) / np.float32(255.0)) ** 2.2

        R_noaug, box_scales = _get_new_rotation_and_scale(
            k_c_flat, dist_c_flat, up_c_flat, boxes_c_flat, valid_c_flat, res)

        def predict_chunk(chunk):
            """One internal batch: warp + crop-model forward for all augs of a
            chunk of boxes (`multiperson_model.py:292-327`). Chunks with no
            valid box skip compute entirely at runtime (lax.cond): after
            the valid-first compaction, padding-only chunks cost nothing."""
            valid_c = chunk[-1]
            n_box = valid_c.shape[0]
            return jax.lax.cond(
                jnp.any(valid_c), _predict_chunk_compute,
                lambda c: jnp.broadcast_to(
                    jnp.asarray([0.0, 0.0, 1000.0], jnp.float32),
                    (n_box, num_aug, spec.n_joints_model, 3)),
                chunk)

        def _predict_chunk_compute(chunk):
            (k_c, dist_c, boxes_c, r_noaug_c, scales_c, ids_c, valid_c) = chunk
            n_box = boxes_c.shape[0]

            crop_scales = aug_scales[:, jnp.newaxis] * scales_c[jnp.newaxis, :]  # [A,n]
            # New intrinsics: focal scaled, principal point centered
            # (`multiperson_model.py:342-351`).
            topleft = k_c[jnp.newaxis, :, :2, :2] * crop_scales[:, :, None, None]
            pp = jnp.full((num_aug, n_box, 2, 1), res / 2.0, jnp.float32)
            row3 = jnp.concatenate([
                jnp.zeros((num_aug, n_box, 1, 2), jnp.float32),
                jnp.ones((num_aug, n_box, 1, 1), jnp.float32)], axis=3)
            new_k = jnp.concatenate(
                [jnp.concatenate([topleft, pp], axis=3), row3], axis=2)  # [A,n,3,3]

            R = jnp.einsum(
                'aij,njk->anik', rotflip, r_noaug_c, precision='highest')
            new_invprojmat = jnp.linalg.inv(
                jnp.einsum('anij,anjk->anik', new_k, R, precision='highest'))

            if antialias_factor > 1:
                scale_mat = camera_ops.corner_aligned_scale_mat(1.0 / antialias_factor)
                new_invprojmat = jnp.einsum(
                    'anij,jk->anik', new_invprojmat, scale_mat, precision='highest')

            warp_kwargs = dict(
                intrinsic_matrix=jnp.tile(k_c, (num_aug, 1, 1)),
                new_invprojmat=new_invprojmat.reshape(-1, 3, 3),
                distortion_coeffs=jnp.tile(dist_c, (num_aug, 1)),
                crop_scales=crop_scales.reshape(-1) * antialias_factor,
                image_ids=jnp.tile(ids_c, (num_aug,)),
                output_shape=(out_side, out_side))
            # Precision resolution: with a bf16 crop model, 'high' runs the
            # single-pass bf16 kernel — the dropped hi/lo-split MXU passes
            # carry only pixel-VALUE precision beyond bf16, which the
            # .astype(bf16) cast below destroys anyway (the
            # geometry-critical subpixel hat-weight term is kept).
            # Validated on TRAINED weights (WARP_PRECISION_POSES_r04.json,
            # scripts/validate_warp_precision_poses.py): MPJPE delta
            # +0.009mm vs the 2-pass mode, and the 4.3mm max pose delta is
            # the same magnitude as exact-f32's own 3.2mm distance from the
            # 2-pass baseline — i.e. warp pixel noise, not systematic
            # error. Kernel cost 0.15 vs 0.204 (bf16x2) vs 0.266 (bf16x3)
            # ms/crop @256. Explicit cfg.warp_precision opts into the
            # higher-precision modes.
            warp_precision = cfg.warp_precision
            if (warp_precision == 'high'
                    and jnp.dtype(cfg.dtype) == jnp.bfloat16):
                warp_precision = 'bf16'
            if backend.startswith('tiled'):
                crops = warp_pallas.warp_images_with_pyramid_tiled(
                    None, pyramid_canvas=pyramid_canvas,
                    interpret=backend == 'tiled-interpret',
                    precision=warp_precision,
                    **warp_kwargs)
            else:
                crops = warp_ops.warp_images_with_pyramid(
                    images_lin, **warp_kwargs)
            if antialias_factor > 1:
                crops = warp_ops.avg_pool_nxn(crops, antialias_factor)
            # Per-aug gamma re-encode; cancels the earlier 2.2 decode
            # (`multiperson_model.py:380`).
            crops = crops ** jnp.repeat(gammas / 2.2, n_box)[:, None, None, None]

            poses_flat = crop_model_fn(
                crop_state, crops.astype(jnp.dtype(cfg.dtype)),
                new_k.reshape(-1, 3, 3), jnp.tile(valid_c, (num_aug,)))
            poses = poses_flat.reshape(num_aug, n_box, spec.n_joints_model, 3)

            # Undo the horizontal flip: reorder left/right joints
            # (`multiperson_model.py:313-316`); the coordinate mirror itself is
            # undone by R (which contains the flip matrix).
            swapped = poses[:, :, jnp.asarray(mirror_mapping), :]
            poses = jnp.where(should_flip[:, None, None, None], swapped, poses)

            poses_orig_cam = jnp.einsum(
                'anjc,anck->anjk', poses, R, precision='highest')
            return jnp.transpose(poses_orig_cam, (1, 0, 2, 3))  # [n, A, J, 3]

        chunk_inputs = (k_c_flat, dist_c_flat, boxes_c_flat, R_noaug,
                        box_scales, image_ids_c, valid_c_flat)
        # internal_batch_size < num_aug means chunking cannot help; run one
        # fused batch like the reference's boxes_per_batch==0 fallback
        # (`multiperson_model.py:254-259`).
        boxes_per_chunk = internal_batch_size // max(num_aug, 1)
        if boxes_per_chunk == 0:
            boxes_per_chunk = n_total
        if n_total <= boxes_per_chunk:
            poses3d_flat = predict_chunk(chunk_inputs)
        else:
            n_chunks = -(-n_total // boxes_per_chunk)
            pad = n_chunks * boxes_per_chunk - n_total
            padded = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
                .reshape((n_chunks, boxes_per_chunk) + x.shape[1:]),
                chunk_inputs)
            poses3d_flat = jax.lax.map(predict_chunk, padded)
            poses3d_flat = poses3d_flat.reshape(
                (n_chunks * boxes_per_chunk,) + poses3d_flat.shape[2:])[:n_total]

        # Undo the valid-first compaction on the poses; k_flat/dist_flat for
        # the projection below were never compacted (original order).
        poses3d_flat = poses3d_flat[inv_compaction]

        if joint_transform_matrix is not None:
            poses3d_flat = jnp.einsum(
                'bank,nN->baNk', poses3d_flat, jnp.asarray(joint_transform_matrix),
                precision='highest')

        # 2D projection with distortion (`multiperson_model.py:181-190`).
        poses2d_normalized = camera_ops.to_homogeneous(
            distortion_ops.distort_points(
                camera_ops.project(poses3d_flat),
                dist_flat[:, jnp.newaxis, jnp.newaxis, :]))
        poses2d_flat = jnp.einsum(
            'bank,bjk->banj', poses2d_normalized, k_flat[:, :2, :],
            precision='highest')

        poses3d = poses3d_flat.reshape(
            n_images, max_boxes, num_aug, spec.n_joints_out, 3)
        poses2d = poses2d_flat.reshape(
            n_images, max_boxes, num_aug, spec.n_joints_out, 2)
        valid = box_valid

        if suppress_implausible_poses:
            keep = jax.vmap(
                lambda p3, p2, bx, vl: plausibility.suppress_implausible_poses(
                    p3, p2, bx, vl, jnp.asarray(joint2bone_mat),
                    jnp.asarray(mean_bones)))(poses3d, poses2d, boxes, valid)
            valid = jnp.logical_and(valid, keep)

        # Camera -> world (`multiperson_model.py:207-211`).
        inv_ext = jnp.linalg.inv(extrinsic_matrix)  # [B, 4, 4]
        poses3d = jnp.einsum(
            'bmank,bjk->bmanj', camera_ops.to_homogeneous(poses3d),
            inv_ext[:, :3, :], precision='highest')

        # Skeleton selection (static gather).
        sel = jnp.asarray(np.asarray(skeleton_indices, np.int32))
        poses3d = poses3d[..., sel, :]
        poses2d = poses2d[..., sel, :]

        if average_aug:
            poses3d = jnp.mean(poses3d, axis=-3)
            poses2d = jnp.mean(poses2d, axis=-3)

        return dict(boxes=boxes, poses3d=poses3d, poses2d=poses2d, valid=valid)

    return fn


class PoseEstimator:
    """Public multi-person API: `detect_poses` / `estimate_poses`, single and
    batched — the L5 surface of SURVEY.md §1 (`multiperson_model.py:42-101,
    465-529`), with padded+masked batching instead of ragged tensors.
    """

    def _place_state(self, state, shardings=None):
        """Puts a host (numpy) variable tree on device ONCE at construction.

        Model state is threaded through every serving call as a jit
        ARGUMENT (keeping weights out of the compiled program); host arrays
        there would be re-transferred on EVERY dispatch — harmless on a
        PCIe-local chip, but a multi-second tax per call on a
        network-attached device (measured: the fused pipeline dropped 60x
        when fed numpy trees). Honors tensor-parallel shardings when given;
        under a plain data mesh the state is replicated."""
        if state is None:
            return None
        leaves = jax.tree_util.tree_leaves(state)
        if not any(isinstance(x, np.ndarray) for x in leaves):
            return state  # already device-resident (or abstract)
        if shardings is not None:
            return jax.device_put(state, shardings)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            return jax.device_put(
                state, NamedSharding(self._mesh, PartitionSpec()))
        return jax.device_put(state)

    def __init__(
            self, crop_model_fn, joint_info: JointInfo, cfg: ModelConfig,
            aug_cfg: AugConfig = AugConfig(), detector=None,
            skeleton_registry: Optional[SkeletonRegistry] = None,
            bone_mean_lengths: Optional[np.ndarray] = None,
            joint_transform_matrix: Optional[np.ndarray] = None,
            crop_model_state=None, mesh=None, crop_state_shardings=None):
        """`crop_model_fn(crop_state, crops, intrinsics, sample_valid)` with
        the model variables passed via `crop_model_state` (preferred: keeps
        weights out of the compiled program). A legacy 3-argument closure
        (weights bound inside) is also accepted with crop_model_state=None.

        With `mesh` (a jax.sharding.Mesh with a 'data' axis), inference is
        data-parallel: the image/box batch is sharded over 'data' and model
        state replicated — detect/estimate scale across chips with no other
        changes (the multi-chip serving analogue of the reference's
        single-node MirroredStrategy, SURVEY §2.10).

        `crop_state_shardings` (a crop_model_state-shaped pytree of
        NamedShardings, e.g. `parallel.mesh.tp_shardings(mesh, variables)`)
        additionally opts into tensor-parallel serving: large kernels live
        split over the mesh's 'model' axis instead of replicated — for
        backbones too large to replicate per chip. Default None = weights
        replicated (the usual serving configuration)."""
        self.cfg = cfg
        self._mesh = mesh
        self._crop_state_sh = crop_state_shardings
        self._aug_cfg = aug_cfg
        self.joint_info = joint_info
        self.detector = detector
        import inspect
        n_args = len(inspect.signature(crop_model_fn).parameters)
        if n_args == 3:
            legacy_fn = crop_model_fn
            crop_model_fn = lambda state, c, k, v: legacy_fn(c, k, v)
        self.crop_model_state = self._place_state(
            crop_model_state, shardings=crop_state_shardings)
        if detector is not None:
            # Pre-place the detector weights too: the fused detect path
            # passes them as jit arguments every call; the detector is
            # always replicated (no TP shardings apply to it).
            detector.variables = self._place_state(detector.variables)
        # The raw crop model (the reference's `crop_model.predict_multi`
        # surface), exposed for crop-level benchmark prediction.
        self.crop_model_fn_with_state = crop_model_fn
        self.crop_model_fn = (
            lambda c, k, v: crop_model_fn(self.crop_model_state, c, k, v))
        self.skeletons = skeleton_registry or SkeletonRegistry(joint_info)
        self.per_skeleton_joint_names = self.skeletons.per_skeleton_joint_names
        self.per_skeleton_joint_edges = self.skeletons.per_skeleton_joint_edges
        # docs/API.md names this attribute `per_skeleton_edges`, the code
        # surface `per_skeleton_joint_edges`; expose both.
        self.per_skeleton_edges = self.per_skeleton_joint_edges
        if bone_mean_lengths is None:
            # No dataset-derived priors supplied. The reference always
            # ships measured means (a trainval pickle frozen into the
            # SavedModel, `plausibility_check.py:12-16`); train via
            # apps/train.py --export-dir to get the same. Warn loudly —
            # detect_poses(suppress_implausible_poses=True) would filter
            # through these approximations.
            import warnings
            # The shipped asset is ONLY consulted on an exact joint
            # names+edges match, never by edge count (any same-count
            # skeleton would alias, and its differently-ordered edges
            # would be checked against the wrong priors).
            from metrabs_tpu.pipeline import bone_priors
            asset = bone_priors.priors_for_joint_info(joint_info)
            if asset is not None:
                bone_mean_lengths = asset
                warnings.warn(
                    'PoseEstimator: no bone_mean_lengths provided; the '
                    'plausibility filter will use the built-in APPROXIMATE '
                    'anthropometric priors asset '
                    '(metrabs_tpu/assets/bone_priors.json), not '
                    'dataset-derived means. Ship dataset-derived priors '
                    '(apps/train.py accumulates them automatically, or '
                    'pipeline.plausibility.compute_bone_mean_lengths).',
                    stacklevel=2)
            else:
                bone_mean_lengths = np.full(
                    len(joint_info.edges), 300.0, np.float32)
                warnings.warn(
                    'PoseEstimator: no bone_mean_lengths provided for a '
                    'joint set matching no built-in skeleton; the '
                    'plausibility filter falls back to a FLAT 300mm prior '
                    'for every bone, which makes '
                    'detect_poses(suppress_implausible_poses=True) '
                    'unreliable. Provide dataset-derived means '
                    '(apps/train.py accumulates them automatically, or '
                    'pipeline.plausibility.compute_bone_mean_lengths).',
                    stacklevel=2)
        n_out = (joint_transform_matrix.shape[1]
                 if joint_transform_matrix is not None else joint_info.n_joints)
        spec = EstimatorSpec(
            cfg=cfg, aug_cfg=aug_cfg,
            n_joints_model=joint_info.n_joints, n_joints_out=n_out)
        self._core = estimate_poses_batched_fn(
            crop_model_fn, spec, joint_info.mirror_mapping,
            joint_info.joint2bone_matrix(), bone_mean_lengths,
            joint_transform_matrix)
        self._jitted = {}

    def _get_jitted(self, **static_kwargs):
        key = tuple(sorted(static_kwargs.items()))
        if key not in self._jitted:
            if self._mesh is not None:
                repl = mesh_helpers.replicated(self._mesh)
                state_sh = (self._crop_state_sh
                            if self._crop_state_sh is not None else repl)
                batch = mesh_helpers.batch_sharding(self._mesh)
                self._jitted[key] = jax.jit(
                    functools.partial(self._core, **static_kwargs),
                    # (crop_state, images, boxes, box_valid, K, dist, ext,
                    #  world_up, fov): batch-dim args sharded, rest replicated.
                    in_shardings=(state_sh, batch, batch, batch, batch, batch,
                                  batch, repl, repl))
            else:
                self._jitted[key] = jax.jit(
                    functools.partial(self._core, **static_kwargs))
        return self._jitted[key]

    def _prepare_camera_args(self, n_images, intrinsic_matrix, distortion_coeffs,
                             extrinsic_matrix, world_up_vector):
        if intrinsic_matrix is None:
            intrinsic_matrix = np.tile(-np.ones((1, 3, 3), np.float32), (n_images, 1, 1))
        else:
            intrinsic_matrix = np.broadcast_to(
                np.asarray(intrinsic_matrix, np.float32).reshape(-1, 3, 3),
                (n_images, 3, 3))
        if distortion_coeffs is None:
            distortion_coeffs = np.zeros((n_images, 12), np.float32)
        else:
            d = np.asarray(distortion_coeffs, np.float32)
            d = d.reshape(1, -1) if d.ndim == 1 else d
            d = np.pad(d, ((0, 0), (0, 12 - d.shape[1])))
            distortion_coeffs = np.broadcast_to(d, (n_images, 12))
        if extrinsic_matrix is None:
            extrinsic_matrix = np.broadcast_to(
                np.eye(4, dtype=np.float32), (n_images, 4, 4))
        else:
            extrinsic_matrix = np.broadcast_to(
                np.asarray(extrinsic_matrix, np.float32).reshape(-1, 4, 4),
                (n_images, 4, 4))
        world_up_vector = np.asarray(world_up_vector, np.float32)
        return intrinsic_matrix, distortion_coeffs, extrinsic_matrix, world_up_vector

    def estimate_poses_batched(
            self, images, boxes, box_valid=None, intrinsic_matrix=None,
            distortion_coeffs=None, extrinsic_matrix=None,
            world_up_vector=(0, -1, 0), default_fov_degrees=55.0,
            internal_batch_size=64, antialias_factor=1, num_aug=5,
            average_aug=True, skeleton=''):
        """images: [B, H, W, 3] uint8; boxes: [B, max_boxes, 4] (x, y, w, h).

        Returns dict(boxes [B,max,5], poses3d, poses2d, valid [B,max]) with
        the aug axis present iff average_aug=False. User-supplied boxes get
        confidence 1.0 and are never plausibility-filtered
        (`multiperson_model.py:89-101`, SURVEY.md §8.13).
        """
        boxes5, box_valid = self._boxes5_from(boxes, box_valid)
        return self._run(
            images, boxes5, box_valid, intrinsic_matrix, distortion_coeffs,
            extrinsic_matrix, world_up_vector, default_fov_degrees,
            internal_batch_size, antialias_factor, num_aug, average_aug,
            skeleton, suppress=False)

    def estimate_poses_stream(
            self, images, boxes, box_valid=None, intrinsic_matrix=None,
            distortion_coeffs=None, extrinsic_matrix=None,
            world_up_vector=(0, -1, 0), default_fov_degrees=55.0,
            internal_batch_size=64, antialias_factor=1, num_aug=5,
            average_aug=True, skeleton=''):
        """estimate_poses_batched over a STREAM of K frame-batches in ONE
        device dispatch (`detect_poses_stream` analogue): `images` is
        [K, B, H, W, 3], `boxes` [K, B, max_boxes, 4], `box_valid`
        [K, B, max_boxes] (or None = all valid). Camera arguments are per
        frame-slot [B, ...], shared across K. Outputs carry a leading K
        axis; semantics match K independent batched calls."""
        images = jnp.asarray(images)
        if images.ndim != 5:
            raise ValueError(f'images must be [K, B, H, W, 3], '
                             f'got shape {images.shape}')
        boxes5, box_valid = self._boxes5_from(boxes, box_valid)
        n_images = images.shape[1]
        (intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
         world_up_vector) = self._prepare_camera_args(
            n_images, intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
            world_up_vector)
        fn = self._get_estimate_stream_jitted(
            num_aug=int(num_aug), average_aug=bool(average_aug),
            antialias_factor=int(antialias_factor),
            internal_batch_size=int(internal_batch_size),
            skeleton_indices=tuple(int(i) for i in self.skeletons.indices(skeleton)),
            suppress_implausible_poses=False)
        return fn(self.crop_model_state, images, jnp.asarray(boxes5),
                  jnp.asarray(box_valid), jnp.asarray(intrinsic_matrix),
                  jnp.asarray(distortion_coeffs), jnp.asarray(extrinsic_matrix),
                  jnp.asarray(world_up_vector),
                  jnp.float32(default_fov_degrees))

    @staticmethod
    def _boxes5_from(boxes, box_valid):
        """[..., 4] user boxes -> ([..., 5] with confidence 1, validity);
        all-valid when box_valid is None. Works for [B, n, 4] and the
        stream layout [K, B, n, 4] alike."""
        boxes = np.asarray(boxes, np.float32)
        if box_valid is None:
            box_valid = np.ones(boxes.shape[:-1], bool)
        boxes5 = np.concatenate([boxes, np.ones_like(boxes[..., :1])], axis=-1)
        return boxes5, box_valid

    def _get_estimate_stream_jitted(self, **static_kwargs):
        key = ('estimate-stream',) + tuple(sorted(static_kwargs.items()))
        if key not in self._jitted:
            core = functools.partial(self._core, **static_kwargs)

            def stream(crop_state, images_k, boxes5_k, valid_k,
                       intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
                       world_up_vector, default_fov_degrees):
                return jax.lax.map(
                    lambda xs: core(
                        crop_state, xs[0], xs[1], xs[2], intrinsic_matrix,
                        distortion_coeffs, extrinsic_matrix, world_up_vector,
                        default_fov_degrees),
                    (images_k, boxes5_k, valid_k))

            if self._mesh is not None:
                # Mirror _get_jitted's data-parallel shardings: [K, B, ...]
                # operands shard their SECOND (frame-batch) axis over
                # 'data', per-frame-slot camera args their first.
                repl = mesh_helpers.replicated(self._mesh)
                state_sh = (self._crop_state_sh
                            if self._crop_state_sh is not None else repl)
                kb = mesh_helpers.stream_batch_sharding(self._mesh)
                b = mesh_helpers.batch_sharding(self._mesh)
                self._jitted[key] = jax.jit(
                    stream,
                    in_shardings=(state_sh, kb, kb, kb, b, b, b, repl, repl))
            else:
                self._jitted[key] = jax.jit(stream)
        return self._jitted[key]

    def detect_poses_batched(
            self, images, intrinsic_matrix=None, distortion_coeffs=None,
            extrinsic_matrix=None, world_up_vector=(0, -1, 0),
            default_fov_degrees=55.0, internal_batch_size=64,
            antialias_factor=1, num_aug=5, average_aug=True, skeleton='',
            detector_threshold=0.3, detector_nms_iou_threshold=0.7,
            max_detections=16, detector_flip_aug=False,
            suppress_implausible_poses=True, fused=True):
        """Detection + estimation. With `fused` (default) both run as ONE
        jit-compiled program — no host round-trip between the detector and
        the estimator (the reference's single-SavedModel-graph property,
        `multiperson_model.py:60-73`).

        Compilation is specialized per input resolution (orig_h, orig_w) and
        per (max_detections, num_aug, ...) static config: fixed-camera
        serving compiles once; feeds with VARYING frame sizes compile one
        program per size and will thrash the in-process cache — resize or
        letterbox to a canonical resolution upstream for such sources
        (apps/demo_video.py --letterbox does this; the persistent
        compilation cache makes recurring sizes cheap across restarts).

        Tuning (measured on v5e, scripts/bench_fused_sweep.py): the default
        internal_batch_size=64 keeps chunk-skip granularity for sparse
        scenes; dense-heavy serving gains ~9% from 256 (fewer chunk conds).
        cfg.warp_precision='bf16' adds ~40% dense fps at ~u8-quantization
        pixel error — validate pose deltas on trained weights first."""
        if self.detector is None:
            raise ValueError('No detector attached to this estimator.')
        if max_detections <= 0:
            # The reference's -1 = "keep all" is not expressible under
            # static shapes; fail with guidance instead of a shape error.
            raise ValueError(
                'max_detections must be a positive static capacity (the '
                "reference's -1/unlimited has no fixed-shape equivalent; "
                'use a generous cap, e.g. 150 = the pose-NMS maximum)')
        flip_vertical = (detector_flip_aug
                         and self._aug_cfg.detector_flip_vertical_too)
        if not fused:
            boxes5, box_valid = self.detector.detect_batched(
                images, threshold=detector_threshold,
                nms_iou_threshold=detector_nms_iou_threshold,
                max_detections=max_detections, flip_aug=detector_flip_aug,
                flip_vertical=flip_vertical)
            return self._run(
                images, boxes5, box_valid, intrinsic_matrix, distortion_coeffs,
                extrinsic_matrix, world_up_vector, default_fov_degrees,
                internal_batch_size, antialias_factor, num_aug, average_aug,
                skeleton, suppress=suppress_implausible_poses)

        return self._dispatch_fused(
            images, stream=False, flip_vertical=flip_vertical,
            intrinsic_matrix=intrinsic_matrix,
            distortion_coeffs=distortion_coeffs,
            extrinsic_matrix=extrinsic_matrix,
            world_up_vector=world_up_vector,
            default_fov_degrees=default_fov_degrees,
            internal_batch_size=internal_batch_size,
            antialias_factor=antialias_factor, num_aug=num_aug,
            average_aug=average_aug, skeleton=skeleton,
            detector_threshold=detector_threshold,
            detector_nms_iou_threshold=detector_nms_iou_threshold,
            max_detections=max_detections,
            detector_flip_aug=detector_flip_aug,
            suppress_implausible_poses=suppress_implausible_poses)

    def _dispatch_fused(self, images, *, stream, flip_vertical,
                        intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
                        world_up_vector, default_fov_degrees,
                        internal_batch_size, antialias_factor, num_aug,
                        average_aug, skeleton, detector_threshold,
                        detector_nms_iou_threshold, max_detections,
                        detector_flip_aug, suppress_implausible_poses):
        """Shared argument marshalling for the fused detect paths: the
        per-batch jit and the K-batch stream differ only in which jitted
        wrapper runs and where the (B, H, W) axes sit."""
        images = jnp.asarray(images)
        bd = 1 if stream else 0  # frame-batch axis position
        n_images = images.shape[bd]
        (intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
         world_up_vector) = self._prepare_camera_args(
            n_images, intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
            world_up_vector)
        get_jitted = (self._get_fused_stream_jitted if stream
                      else self._get_fused_jitted)
        fn = get_jitted(
            num_aug=int(num_aug), average_aug=bool(average_aug),
            antialias_factor=int(antialias_factor),
            internal_batch_size=int(internal_batch_size),
            skeleton_indices=tuple(int(i) for i in self.skeletons.indices(skeleton)),
            suppress_implausible_poses=bool(suppress_implausible_poses),
            max_detections=int(max_detections),
            detector_flip_aug=bool(detector_flip_aug),
            flip_vertical=bool(flip_vertical),
            orig_h=int(images.shape[bd + 1]),
            orig_w=int(images.shape[bd + 2]))
        return fn(self.detector.variables, self.crop_model_state, images,
                  jnp.float32(detector_threshold),
                  jnp.float32(detector_nms_iou_threshold),
                  jnp.asarray(intrinsic_matrix), jnp.asarray(distortion_coeffs),
                  jnp.asarray(extrinsic_matrix), jnp.asarray(world_up_vector),
                  jnp.float32(default_fov_degrees))

    def detect_poses_stream(
            self, images, intrinsic_matrix=None, distortion_coeffs=None,
            extrinsic_matrix=None, world_up_vector=(0, -1, 0),
            default_fov_degrees=55.0, internal_batch_size=64,
            antialias_factor=1, num_aug=5, average_aug=True, skeleton='',
            detector_threshold=0.3, detector_nms_iou_threshold=0.7,
            max_detections=16, detector_flip_aug=False,
            suppress_implausible_poses=True):
        """detect_poses_batched over a STREAM of K frame-batches in ONE
        device dispatch: `images` is [K, B, H, W, 3] uint8 and the K
        batches run as a sequential on-device `lax.scan`-style loop
        (lax.map), so per-call host dispatch/transfer overhead is paid
        once per K batches instead of per batch. Camera arguments are per
        frame-slot [B, ...], shared across the K batches (the
        fixed-camera serving case). Outputs carry a leading K axis.

        Semantics are identical to calling detect_poses_batched K times
        (tested); use this for throughput-oriented offline/video
        processing, the per-batch API for latency-oriented serving."""
        if self.detector is None:
            raise ValueError('No detector attached to this estimator.')
        if max_detections <= 0:
            raise ValueError(
                'max_detections must be a positive static capacity (the '
                "reference's -1/unlimited has no fixed-shape equivalent)")
        flip_vertical = (detector_flip_aug
                         and self._aug_cfg.detector_flip_vertical_too)
        images = jnp.asarray(images)
        if images.ndim != 5:
            raise ValueError(f'images must be [K, B, H, W, 3], '
                             f'got shape {images.shape}')
        return self._dispatch_fused(
            images, stream=True, flip_vertical=flip_vertical,
            intrinsic_matrix=intrinsic_matrix,
            distortion_coeffs=distortion_coeffs,
            extrinsic_matrix=extrinsic_matrix,
            world_up_vector=world_up_vector,
            default_fov_degrees=default_fov_degrees,
            internal_batch_size=internal_batch_size,
            antialias_factor=antialias_factor, num_aug=num_aug,
            average_aug=average_aug, skeleton=skeleton,
            detector_threshold=detector_threshold,
            detector_nms_iou_threshold=detector_nms_iou_threshold,
            max_detections=max_detections,
            detector_flip_aug=detector_flip_aug,
            suppress_implausible_poses=suppress_implausible_poses)

    def detect_poses_pipelined(self, image_batches, *, in_flight=2,
                               fused=False, **kwargs):
        """detect_poses_batched over an ITERABLE of [B, H, W, 3] frame
        batches with `in_flight` batches kept dispatched ahead of host
        materialization — a generator yielding per-batch host-numpy dicts
        in order.

        Every jit call in the unfused path is async (the detector and
        estimator programs of batch k+1 enqueue while batch k still runs),
        so the host readback of batch k-1 overlaps device compute of later
        batches: per-batch wall time approaches max(device time, transfer
        time) instead of their sum. This recovers most of the fused
        single-program win (`multiperson_model.py:42-73`) on transports
        where the fused program cannot ship (the dev tunnel rejects
        oversized compile requests for flagship-size fused graphs) and is
        the latency-tolerant analogue of `detect_poses_stream` when frames
        arrive incrementally rather than as one [K, B, ...] block.

        `fused=True` pipelines the fused one-program path instead (useful
        to hide host transfer when that program is transportable). Camera
        arguments in `kwargs` are shared across batches (fixed-camera
        serving); semantics per batch are identical to
        `detect_poses_batched` (tested)."""
        if self.detector is None:
            raise ValueError('No detector attached to this estimator.')
        if in_flight < 1:
            raise ValueError('in_flight must be >= 1')
        from collections import deque
        pending = deque()

        def materialize(result):
            return {k: np.asarray(v) for k, v in result.items()}

        for images in image_batches:
            pending.append(
                self.detect_poses_batched(images, fused=fused, **kwargs))
            if len(pending) > in_flight:
                yield materialize(pending.popleft())
        while pending:
            yield materialize(pending.popleft())

    def _make_fused_fn(self, *, max_detections, detector_flip_aug,
                       flip_vertical, orig_h, orig_w, **static_kwargs):
        detector = self.detector

        def fused(det_vars, crop_state, images, det_threshold, det_nms_iou,
                  intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
                  world_up_vector, default_fov_degrees):
            boxes5, box_valid = detector._detect_core(
                det_vars, images, det_threshold, det_nms_iou,
                max_detections=max_detections, flip_aug=detector_flip_aug,
                flip_vertical=flip_vertical, orig_h=orig_h, orig_w=orig_w)
            return self._core(
                crop_state, images, boxes5, box_valid, intrinsic_matrix,
                distortion_coeffs, extrinsic_matrix, world_up_vector,
                default_fov_degrees, **static_kwargs)

        return fused

    def _fused_shardings(self, images_spec):
        """Data-parallel in_shardings for the fused arg list (det_vars,
        crop_state, images, thr, nms_thr, K, dist, ext, up, fov): weights
        and scalars replicated, per-frame args sharded over 'data'."""
        from jax.sharding import NamedSharding
        repl = mesh_helpers.replicated(self._mesh)
        state_sh = (self._crop_state_sh
                    if self._crop_state_sh is not None else repl)
        b = mesh_helpers.batch_sharding(self._mesh)
        imgs = NamedSharding(self._mesh, images_spec)
        return (repl, state_sh, imgs, repl, repl, b, b, b, repl, repl)

    def _get_fused_jitted(self, **kw):
        key = ('fused',) + tuple(sorted(kw.items()))
        if key not in self._jitted:
            fused = self._make_fused_fn(**kw)
            if self._mesh is not None:
                from jax.sharding import PartitionSpec as P
                self._jitted[key] = jax.jit(
                    fused, in_shardings=self._fused_shardings(P('data')))
            else:
                self._jitted[key] = jax.jit(fused)
        return self._jitted[key]

    def _get_fused_stream_jitted(self, **kw):
        key = ('fused-stream',) + tuple(sorted(kw.items()))
        if key not in self._jitted:
            fused = self._make_fused_fn(**kw)

            def stream(det_vars, crop_state, images_k, *rest):
                # Sequential on-device loop over the leading K axis: one
                # host dispatch runs K frame-batches, amortizing per-call
                # dispatch/transfer overhead (measured ~30-40 ms/call on
                # the tunneled dev chip, ~ms on attached hosts).
                return jax.lax.map(
                    lambda im: fused(det_vars, crop_state, im, *rest),
                    images_k)

            if self._mesh is not None:
                from jax.sharding import PartitionSpec as P
                self._jitted[key] = jax.jit(
                    stream,
                    in_shardings=self._fused_shardings(P(None, 'data')))
            else:
                self._jitted[key] = jax.jit(stream)
        return self._jitted[key]

    def _run(self, images, boxes5, box_valid, intrinsic_matrix,
             distortion_coeffs, extrinsic_matrix, world_up_vector,
             default_fov_degrees, internal_batch_size, antialias_factor,
             num_aug, average_aug, skeleton, suppress):
        images = jnp.asarray(images)
        n_images = images.shape[0]
        (intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
         world_up_vector) = self._prepare_camera_args(
            n_images, intrinsic_matrix, distortion_coeffs, extrinsic_matrix,
            world_up_vector)
        fn = self._get_jitted(
            num_aug=int(num_aug), average_aug=bool(average_aug),
            antialias_factor=int(antialias_factor),
            internal_batch_size=int(internal_batch_size),
            skeleton_indices=tuple(int(i) for i in self.skeletons.indices(skeleton)),
            suppress_implausible_poses=bool(suppress))
        return fn(self.crop_model_state, images, jnp.asarray(boxes5),
                  jnp.asarray(box_valid), jnp.asarray(intrinsic_matrix),
                  jnp.asarray(distortion_coeffs), jnp.asarray(extrinsic_matrix),
                  jnp.asarray(world_up_vector), jnp.float32(default_fov_degrees))

    # ---- single-image wrappers (`multiperson_model.py:465-529`) ----

    def estimate_poses(self, image, boxes, **kwargs):
        """Single image; returns host numpy dict compacted to valid rows."""
        boxes = np.asarray(boxes, np.float32)
        result = self.estimate_poses_batched(
            jnp.asarray(image)[jnp.newaxis], boxes[np.newaxis], **kwargs)
        return self._squeeze_single(result)

    def detect_poses(self, image, **kwargs):
        result = self.detect_poses_batched(jnp.asarray(image)[jnp.newaxis], **kwargs)
        return self._squeeze_single(result)

    @staticmethod
    def _squeeze_single(result):
        out = {k: np.asarray(v)[0] for k, v in result.items()}
        valid = out.pop('valid').astype(bool)
        return {k: v[valid] for k, v in out.items()}
