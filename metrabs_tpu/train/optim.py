"""Optimizer and LR schedules (optax re-design of `metrabs_tf/main.py:196-283`).

The reference builds: Adam(+decoupled weight decay scaled by
wd / sqrt(total_steps) / base_lr, eps 1e-8) with a two-phase exponential-decay
LR, optionally wrapped in gradient accumulation, EMA (Polyak) weight
averaging and float16 loss scaling. Here the same chain is optax:
 - adamw with the identical effective decay;
 - optax.MultiSteps for accumulation;
 - an EMA of params tracked alongside (used for eval/export);
 - loss scaling is unnecessary in bfloat16 on TPU (grads are f32), so it is
   intentionally omitted — the reference needed it only for float16 GPUs.
Dual-LR fine-tuning (`build_multi_optimizer`) maps to optax.multi_transform
with a backbone/head partition.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metrabs_tpu.config import TrainConfig


def _two_phase_schedule(tcfg: TrainConfig, phase1_fraction: float) -> Callable:
    """Two-phase exponential decay: to base/3 over the first
    `phase1_fraction` of training, then from base/30 with decay rate 0.3
    over the remainder."""
    total = tcfg.training_steps
    n1 = phase1_fraction * total
    n2 = total - n1
    b = tcfg.base_learning_rate

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        phase1 = b * (1 / 3) ** (step / n1)
        phase2 = (b / 30) * 0.3 ** ((step - n1) / n2)
        return jnp.where(step < n1, phase1, phase2)

    return schedule


def lr_schedule(tcfg: TrainConfig) -> Callable:
    """Training LR (`main.py:241-256`): phase switch at 92% of training."""
    return _two_phase_schedule(tcfg, 0.92)


def lr_schedule_finetune_high(tcfg: TrainConfig) -> Callable:
    """Head LR for dual-LR fine-tuning (`main.py:258-273`): phase switch at
    50% of training."""
    return _two_phase_schedule(tcfg, 0.5)


def lr_schedule_finetune_low(tcfg: TrainConfig) -> Callable:
    """Backbone LR for dual-LR fine-tuning (`main.py:276-283`)."""
    total = tcfg.training_steps
    b = tcfg.base_learning_rate

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return (b / 30) * 0.3 ** (step / total)

    return schedule


def _adam(tcfg: TrainConfig, schedule: Callable) -> optax.GradientTransformation:
    # max(1) guards the export-only training_steps=0 case (the decay rate
    # is never applied then, but inf would still warn at build).
    weight_decay = (tcfg.weight_decay / np.sqrt(max(tcfg.training_steps, 1))
                    / tcfg.base_learning_rate)
    mu_dtype = (jnp.dtype(tcfg.optimizer_mu_dtype)
                if getattr(tcfg, 'optimizer_mu_dtype', '') else None)
    return optax.adamw(
        learning_rate=schedule, eps=1e-8, weight_decay=weight_decay,
        mu_dtype=mu_dtype)


def build_optimizer(
        tcfg: TrainConfig,
        backbone_path: str = 'backbone') -> optax.GradientTransformation:
    """The full optimizer chain. With dual_finetune_lr, parameters under
    `backbone_path` get the low schedule, everything else the high one."""
    if tcfg.dual_finetune_lr:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: 'backbone' if any(
                    getattr(k, 'key', None) == backbone_path for k in path)
                else 'heads', params)

        tx = optax.multi_transform(
            {'backbone': _adam(tcfg, lr_schedule_finetune_low(tcfg)),
             'heads': _adam(tcfg, lr_schedule_finetune_high(tcfg))},
            label_fn)
    else:
        tx = _adam(tcfg, lr_schedule(tcfg))

    if tcfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.grad_accum_steps)
    return tx


def ema_update(ema_params, new_params, momentum: float):
    """Polyak averaging of parameters (`ema_momentum`; 1 disables)."""
    if momentum >= 1.0:
        return new_params
    return jax.tree_util.tree_map(
        lambda e, p: momentum * e + (1.0 - momentum) * p, ema_params, new_params)


def project_kernel_norms(params, max_norm: float,
                         backbone_path: str = 'backbone'):
    """Max-norm projection of conv kernels (the reference's Keras
    MinMaxNorm(0, max) constraint on EffNetV2 convs, `builder.py:54-60`):
    any 4D kernel [H, W, I, O] whose per-output-channel norm over (H, W, I)
    exceeds `max_norm` is rescaled onto the ball. Depthwise kernels
    ([H, W, 1, C]) reduce over the same axes, matching the reference's
    axis=[0, 1] depthwise constraint. Non-4D leaves (biases, BN, dense)
    pass through unchanged, as in Keras where only convs carry the
    constraint.

    The reference passes the constraint ONLY to the backbone (the head
    conv and any detector are unconstrained, `builder.py:54-60` constructs
    just the effnetv2 model with it), so when the tree has a top-level
    `backbone_path` subtree only that subtree is projected (same key that
    `build_optimizer`'s dual-LR partition uses). Known parity divergence,
    gated by `constrain_kernel_norm`: the reference wires the constraint
    only in `build_effnetv2` (resnet/mobilenet builders ignore it,
    `builder.py:50-96`); here the flag projects whichever backbone family
    is in use. The reference never sets the flag for non-EffNetV2 runs,
    so the defaults coincide."""
    def proj(x):
        if x.ndim != 4:
            return x
        norms = jnp.sqrt(jnp.sum(jnp.square(
            x.astype(jnp.float32)), axis=(0, 1, 2), keepdims=True))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
        return (x.astype(jnp.float32) * scale).astype(x.dtype)

    if isinstance(params, dict) and backbone_path in params:
        out = dict(params)
        out[backbone_path] = jax.tree_util.tree_map(
            proj, params[backbone_path])
        return out
    return jax.tree_util.tree_map(proj, params)
