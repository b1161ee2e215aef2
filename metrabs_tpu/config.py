"""Static configuration for the metrabs-tpu framework.

The reference implementation drives everything through a global ~80-entry FLAGS
singleton (`metrabs_tf/init.py:91-253`) that is read from deep inside traced
graphs. Here configuration is an explicit, hashable, frozen dataclass that is
closed over at `jax.jit` trace time, so every numeric hyperparameter is a
compile-time constant for XLA and functions stay pure.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters of the single-person crop model.

    Defaults mirror the reference (`metrabs_tf/init.py:123-227`,
    `metrabs_pytorch/config/config.yaml`): 256px crops, stride-32 backbone with
    centered striding, 8 depth voxels, a 2200mm metric bounding cube and a 0.5
    blend between the 2D- and 3D-based absolute reconstructions inside the FOV.
    """

    proc_side: int = 256
    stride_train: int = 32
    stride_test: int = 32
    centered_stride: bool = True
    depth: int = 8
    box_size_mm: float = 2200.0
    mix_3d_inside_fov: float = 0.5
    weak_perspective: bool = False
    backbone: str = 'mobilenetv3-small'
    # nn.scan-stacked repeated backbone blocks (fast compiles). Set False for
    # the flat blocks_{i} parameter layout that the torch weight importer
    # produces (io/weights_import.py); the value is recorded in packaged
    # model manifests so load_pose_estimator rebuilds the matching layout.
    backbone_scan_blocks: bool = True
    # Rematerialize backbone blocks in the backward pass (jax.checkpoint):
    # ~1/3 extra forward FLOPs for O(1)-per-block activation HBM. Enables
    # large batch/resolution training on one chip; inference is unaffected
    # (remat only changes autodiff). Parameter trees are identical.
    backbone_remat: bool = False
    model_class: str = 'Metrabs'
    # Number of joints the head predicts (reference: joint_info.n_joints).
    n_joints: int = 17
    # Compute dtype for the backbone. The reference uses float16 mixed
    # precision on GPU (`init.py:166-168`); TPU prefers bfloat16. The
    # soft-argmax decode and reconstruction always run in float32.
    dtype: str = 'bfloat16'
    # Crop-resample backend: 'auto' picks the Pallas MXU kernel
    # (ops/warp_pallas.py) on TPU and the XLA gather elsewhere; 'gather'
    # forces the XLA path; 'tiled' forces the kernel; 'tiled-interpret' runs
    # the kernel in interpreter mode (CPU tests of the TPU code path).
    warp_backend: str = 'auto'
    # Matmul precision inside the tiled warp: 'high' = bf16x3 hi/lo-split
    # dots (~1e-5 max pixel error — numerically f32-equivalent, half the
    # MXU passes of 'highest'); 'highest' = exact f32 (6-pass); 'bf16' =
    # single-pass (~4e-3 max pixel error ~= the u8 source quantization,
    # fastest — measure pose delta on trained weights before serving).
    warp_precision: str = 'high'
    # Serving-only folded-BN layout (io/bn_fold.py): BatchNorm affines are
    # folded into the conv weights at load time and the BN ops vanish from
    # the graph (~8% of the L@384 forward, PROBE_INFER_r04 bn_identity).
    # Training packages always record False; load_pose_estimator flips it
    # (with the matching variables transform) for supported families.
    bn_fold: bool = False


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """Test-time augmentation setup.

    In the reference these are packaging-time flags frozen into the SavedModel
    (`metrabs_tf/multiperson/save_model.py:21-24`, read inside the traced graph
    at `multiperson_model.py:141-158`). Here they are explicit pipeline
    construction parameters, defaulting to the released models' values.
    """

    rot_aug_degrees: float = 25.0
    rot_aug_360: bool = False
    rot_aug_360_half: bool = False
    detector_flip_vertical_too: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference defaults: `metrabs_tf/init.py`)."""

    batch_size: int = 32
    batch_size_2d: int = 32
    batch_size_test: int = 150
    training_steps: int = 400_000
    base_learning_rate: float = 2.121e-4
    weight_decay: float = 3e-3
    ema_momentum: float = 1.0
    grad_accum_steps: int = 1
    # Max-norm projection of conv kernels after every update (the
    # reference's Keras MinMaxNorm kernel constraint, `builder.py:54-60`;
    # its FLAGS.constrain_kernel_norm is undefined in init.py, i.e. off by
    # default — same here with inf = off).
    constrain_kernel_norm: float = float('inf')
    dual_finetune_lr: bool = False
    # Dtype of Adam's first-moment accumulator (optax mu_dtype). 'bfloat16'
    # halves that third of optimizer memory (~1/3 of opt state); the
    # second moment stays float32 (bf16 squared-gradient accumulation
    # underflows). '' keeps float32.
    optimizer_mu_dtype: str = ''
    loss2d_factor: float = 0.2
    absloss_factor: float = 0.1
    absloss_start_step: int = 5000
    mean_relative: bool = True
    ghost_bn_splits: Tuple[int, ...] = ()
    seed: int = 1
    # Run the final N optimizer steps with the model in inference mode
    # (BatchNorm uses frozen moving statistics, no dropout), matching the
    # reference's SwitchToInferenceModeCallback recipe
    # (`metrabs_tf/main.py:131-134`). 0 disables.
    finetune_in_inference_mode: int = 0
    # Latent-joint / manifold fine-tuning modes (`init.py:235-251`).
    transform_coords: bool = False
    predict_all_and_latents: bool = False
    regularize_to_manifold: bool = False
    loss_manif_factor: float = 1.0
    loss_manif_factor2d: float = 1.0
    teacher_loss_factor: float = 1.0
    teacher_start_step: int = 5000
    allhead_aegt_loss_factor: float = 1.0
    stop_gradient_latent: bool = True


DEFAULT_MODEL_CONFIG = ModelConfig()
DEFAULT_AUG_CONFIG = AugConfig()
DEFAULT_TRAIN_CONFIG = TrainConfig()
