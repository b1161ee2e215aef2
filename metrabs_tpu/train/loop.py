"""Training state and the jitted/shardable train step.

TPU-native replacement for the reference's fleras `ModelTrainer.fit_epochless`
loop (`metrabs_tf/main.py:140-145`, `models/metrabs.py:144-225`): one pure
`train_step(state, batch3d, batch2d, rng) -> (state, losses)` function,
jit-compiled with batch axes sharded over the mesh's 'data' axis and state
replicated. Gradient all-reduce is implicit (XLA psum over ICI); ghost-BN
(per-shard batch statistics) comes from the backbone's GhostBatchNorm when
its splits align with the data shards.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from metrabs_tpu.config import ModelConfig, TrainConfig
from metrabs_tpu.train import losses as losses_mod
from metrabs_tpu.train import optim
from metrabs_tpu.utils.joint_info import JointInfo


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any


def create_train_state(model, tx, rng, cfg: ModelConfig,
                       sample_batch_size: int = 2,
                       with_intrinsics: bool = True) -> TrainState:
    """`with_intrinsics=False` for models whose __call__ takes only an image
    (Metro has no intrinsics input, `metrabs_tf/models/metro.py:24-27`)."""
    dummy_img = jnp.zeros(
        (sample_batch_size, cfg.proc_side, cfg.proc_side, 3),
        jnp.dtype(cfg.dtype))
    # Both inits are jitted: eager dispatch pays per-op RTT on networked
    # (axon) TPU runtimes — a large backbone takes minutes eager, seconds
    # jitted (and optax.init alone is hundreds of zeros_like dispatches).
    init_fn = jax.jit(functools.partial(model.init, train=False))
    if with_intrinsics:
        dummy_k = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None],
                           (sample_batch_size, 1, 1))
        variables = init_fn({'params': rng}, dummy_img, dummy_k)
    else:
        variables = init_fn({'params': rng}, dummy_img)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        opt_state=jax.jit(tx.init)(params), ema_params=params)


def load_affine_weights(path: str) -> Dict[str, Any]:
    """Loads affine-combining-autoencoder weights (`init.py:225-234`): an
    npz with w1 [n_joints, n_latents] (encoder) and w2 [n_latents, n_joints]
    (decoder/recombination), keyed as the Metrabs 'constants' collection."""
    import numpy as np
    ws = np.load(path)
    return {'encoder_weights': np.asarray(ws['w1'], np.float32),
            'recombination_weights': np.asarray(ws['w2'], np.float32)}


def make_train_step(
        model, tx, joint_info3d: JointInfo, joint_info2d: JointInfo,
        cfg: ModelConfig, tcfg: TrainConfig,
        bn_inference: bool = False,
        affine_weights: Optional[Dict[str, Any]] = None) -> Callable:
    """Builds the pure train step.

    batch3d: image [n,S,S,3], intrinsics [n,3,3], coords3d_true [n,J,3],
             joint_validity_mask [n,J]
    batch2d: image [m,S,S,3], intrinsics [m,3,3], coords2d_true [m,J2,2],
             joint_validity_mask [m,J2]
    The two streams are concatenated and run through the backbone+head
    together (`models/metrabs.py:156-212`).

    Step-count semantics under gradient accumulation: state.step counts
    MICRO-steps, and the loss gates (the 500-step weak-persp warmup,
    absloss_start_step, teacher_start_step) compare against it UNscaled.
    This matches the reference exactly — fleras' train_counter also ticks
    per micro-step and `metrabs_tf/main.py` scales validation/finetune
    windows by grad_accum_steps but not these gates — so configs written
    for the reference transfer unchanged; scale the gate values yourself
    if you want them in units of optimizer updates.

    With `bn_inference` the forward pass runs in inference mode — BatchNorm
    consumes the frozen moving statistics (batch_stats never update) and
    dropout/stochastic depth are off — while gradients still flow; this is
    the SwitchToInferenceMode phase of the published training recipe
    (`metrabs_tf/main.py:131-134`).

    The latent/manifold fine-tuning modes (`models/metrabs.py:169-191,
    228-245`) need the affine-combining-autoencoder weights: pass
    `affine_weights` = {'encoder_weights': [J, L], 'recombination_weights':
    [L, J]} (the model's 'constants' collection, or `load_affine_weights`).
    They are closed over as literal constants — like the reference's
    tf.constant (`init.py:232-234`); a [J, L] matrix is a few KB, far below
    the HLO-constant-embedding danger zone that applies to model params.
      - transform_coords: the head predicts L latent points; the absolute
        reconstruction is decoded to joints before every loss.
      - predict_all_and_latents: latent and all-joints heads reconstruct
        independently and train with the hybrid student-teacher losses.
      - regularize_to_manifold: plain joints head + pred-vs-AE-reconstruction
        penalty.
    """
    index_groups = losses_mod.get_2d_joint_index_groups(joint_info3d, joint_info2d)

    latent_mode = getattr(model, 'latent_mode', '')
    if tcfg.predict_all_and_latents and latent_mode != 'predict_all_and_latents':
        raise ValueError(
            f'TrainConfig.predict_all_and_latents requires a model built with '
            f"latent_mode='predict_all_and_latents', got {latent_mode!r}")
    if tcfg.transform_coords and latent_mode != 'transform_coords':
        raise ValueError(
            f'TrainConfig.transform_coords requires a model built with '
            f"latent_mode='transform_coords', got {latent_mode!r}")
    needs_ae = bool(latent_mode) or tcfg.regularize_to_manifold
    w_dec = w_enc = None
    if needs_ae:
        if affine_weights is None:
            raise ValueError(
                'latent/manifold training modes need the autoencoder weights: '
                "pass affine_weights={'encoder_weights': [J, L], "
                "'recombination_weights': [L, J]}")
        w_dec = jnp.asarray(affine_weights['recombination_weights'], jnp.float32)
        w_enc = jnp.asarray(affine_weights['encoder_weights'], jnp.float32)

    def train_step(state: TrainState, batch3d: Dict, batch2d: Dict,
                   rng: jax.Array) -> Tuple[TrainState, Dict]:
        rng_mix, rng_dropout = jax.random.split(rng)
        n3 = batch3d['image'].shape[0]

        image_both = jnp.concatenate(
            [batch3d['image'], batch2d['image']], axis=0).astype(
            jnp.dtype(cfg.dtype))
        intr_both = jnp.concatenate(
            [batch3d['intrinsics'], batch2d['intrinsics']], axis=0)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            if latent_mode:
                # The module's setup() declares the 'constants' collection,
                # so apply() must be given it even though backbone_and_head
                # doesn't read it; the values are the AE weights.
                variables['constants'] = dict(
                    recombination_weights=w_dec, encoder_weights=w_enc)
            if bn_inference:
                features, head2d, head3d = model.apply(
                    variables, image_both, train=False,
                    method=model.backbone_and_head)
                mutated = {}
            else:
                (features, head2d, head3d), mutated = model.apply(
                    variables, image_both, train=True,
                    method=model.backbone_and_head,
                    mutable=['batch_stats'], rngs={'dropout': rng_dropout})

            # Random 2D/3D mixing factor during training
            # (`models/metrabs.py:165-167`).
            mix = jax.random.uniform(rng_mix, (image_both.shape[0], 1, 1))

            if latent_mode == 'predict_all_and_latents':
                # Latent and all-joints heads reconstruct independently
                # (`models/metrabs.py:169-184`; latent slots come first, as
                # in Metrabs.__call__).
                n_lat = model.n_latents
                abs_lat = losses_mod.reconstruct_absolute_trainmode(
                    head2d[:, :n_lat], head3d[:, :n_lat], intr_both, mix,
                    state.step, cfg=cfg)
                abs_all = losses_mod.reconstruct_absolute_trainmode(
                    head2d[:, n_lat:], head3d[:, n_lat:], intr_both, mix,
                    state.step, cfg=cfg)
                losses = losses_mod.compute_losses_latents_and_all(
                    abs_all[:n3], abs_lat[:n3], abs_all[n3:], abs_lat[n3:],
                    batch3d, batch2d, index_groups, cfg=cfg, tcfg=tcfg,
                    step=state.step, recombination_weights=w_dec,
                    encoder_weights=w_enc)
                return losses['loss'], (mutated, losses)

            coords_abs_both = losses_mod.reconstruct_absolute_trainmode(
                head2d, head3d, intr_both, mix, state.step, cfg=cfg)
            if latent_mode == 'transform_coords':
                # Decode latent points to joints after reconstruction
                # (`models/metrabs.py:190-191`).
                coords_abs_both = jnp.einsum(
                    'bjc,jJ->bJc', coords_abs_both, w_dec, precision='highest')

            preds_abs = coords_abs_both[:n3]
            preds_abs_2d = coords_abs_both[n3:]
            losses = losses_mod.compute_losses(
                preds_abs, preds_abs_2d, batch3d, batch2d, index_groups,
                cfg=cfg, tcfg=tcfg, step=state.step,
                reconstruction_weights=(
                    jnp.matmul(w_enc, w_dec, precision='highest')
                    if tcfg.regularize_to_manifold else None))
            return losses['loss'], (mutated, losses)

        return _apply_gradients(state, loss_fn, tx, tcfg)

    return train_step


def _apply_gradients(state: TrainState, loss_fn, tx,
                     tcfg: TrainConfig) -> Tuple[TrainState, Dict]:
    """Shared optimizer tail of every train step: grad, optimizer update,
    EMA blend (once per APPLIED update under optax.MultiSteps accumulation —
    the reference's Keras EMA sits behind the accumulator)."""
    grads, (mutated, losses) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if tcfg.constrain_kernel_norm != float('inf'):
        # Projected constraint AFTER the update, like Keras applies kernel
        # constraints (`builder.py:54-60` MinMaxNorm on conv kernels).
        new_params = optim.project_kernel_norms(
            new_params, tcfg.constrain_kernel_norm)
    new_ema = optim.ema_update(state.ema_params, new_params, tcfg.ema_momentum)
    if tcfg.grad_accum_steps > 1 and tcfg.ema_momentum < 1.0:
        # Under optax.MultiSteps only every k-th micro-step applies an
        # optimizer update; blending the EMA on the k-1 no-op micro-steps
        # would shrink the effective horizon to momentum**k per applied
        # step vs the reference's per-update Keras EMA. mini_step wraps
        # to 0 exactly when the accumulated update was just applied.
        applied = new_opt_state.mini_step == 0
        new_ema = jax.tree_util.tree_map(
            lambda e, c: jnp.where(applied, c, e),
            state.ema_params, new_ema)
    new_state = TrainState(
        step=state.step + 1, params=new_params,
        batch_stats=mutated.get('batch_stats', state.batch_stats),
        opt_state=new_opt_state, ema_params=new_ema)
    return new_state, losses


def make_train_step_metro(
        model, tx, joint_info3d: JointInfo, joint_info2d: JointInfo,
        cfg: ModelConfig, tcfg: TrainConfig,
        bn_inference: bool = False) -> Callable:
    """Train step for the Metro model (root-relative-only 3D head, no
    intrinsics input): the `MetroTrainer.forward_train/compute_losses`
    equivalent (`metrabs_tf/models/metro.py:60-107`). Both streams run the
    backbone+head together; the 3D batch gets the root-relative L1 and the
    2D batch the mean/stdev-aligned weak 2D loss."""
    from metrabs_tpu.models import metro as metro_mod

    index_groups = losses_mod.get_2d_joint_index_groups(
        joint_info3d, joint_info2d)

    def train_step(state: TrainState, batch3d: Dict, batch2d: Dict,
                   rng: jax.Array) -> Tuple[TrainState, Dict]:
        _, rng_dropout = jax.random.split(rng)
        n3 = batch3d['image'].shape[0]
        image_both = jnp.concatenate(
            [batch3d['image'], batch2d['image']], axis=0).astype(
            jnp.dtype(cfg.dtype))

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            if bn_inference:
                coords = model.apply(variables, image_both, train=False)
                mutated = {}
            else:
                coords, mutated = model.apply(
                    variables, image_both, train=True,
                    mutable=['batch_stats'], rngs={'dropout': rng_dropout})
            losses = metro_mod.compute_metro_losses(
                coords[:n3], coords[n3:], batch3d, batch2d, index_groups,
                cfg=cfg, tcfg=tcfg)
            return losses['loss'], (mutated, losses)

        return _apply_gradients(state, loss_fn, tx, tcfg)

    return train_step


def make_train_step_model25d(
        model, tx, joint_info3d: JointInfo, joint_info2d: JointInfo,
        cfg: ModelConfig, tcfg: TrainConfig,
        bn_inference: bool = False) -> Callable:
    """Train step for Model25D: the `Model25DTrainer` equivalent
    (`metrabs_tf/models/twofive.py:70-122`). Training supervises the raw
    2.5D head output (2D pixel L1 + relative-z L1 + weak 2D); the LM
    bone-length absolute solve runs only at inference, exactly as the
    reference's compute_losses never touches coords3d_pred_abs."""
    from metrabs_tpu.models import model25d as m25_mod

    index_groups = losses_mod.get_2d_joint_index_groups(
        joint_info3d, joint_info2d)

    def train_step(state: TrainState, batch3d: Dict, batch2d: Dict,
                   rng: jax.Array) -> Tuple[TrainState, Dict]:
        _, rng_dropout = jax.random.split(rng)
        n3 = batch3d['image'].shape[0]
        image_both = jnp.concatenate(
            [batch3d['image'], batch2d['image']], axis=0).astype(
            jnp.dtype(cfg.dtype))

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            if bn_inference:
                coords25d = model.apply(
                    variables, image_both, train=False,
                    method=model.forward_25d)
                mutated = {}
            else:
                coords25d, mutated = model.apply(
                    variables, image_both, train=True,
                    method=model.forward_25d,
                    mutable=['batch_stats'], rngs={'dropout': rng_dropout})
            losses = m25_mod.compute_model25d_losses(
                coords25d[:n3], coords25d[n3:], batch3d, batch2d,
                index_groups, cfg=cfg, tcfg=tcfg)
            return losses['loss'], (mutated, losses)

        return _apply_gradients(state, loss_fn, tx, tcfg)

    return train_step


def make_sharded_train_step(train_step, mesh, donate_state=None,
                            state_shardings=None):
    """jit the train step with batches sharded over the mesh's data axis and
    state replicated; XLA inserts the gradient psum over ICI.

    `state_shardings` (a TrainState-shaped pytree of NamedShardings, e.g.
    from `parallel.mesh.tp_shardings`) opts into tensor parallelism: large
    kernels live sharded over the mesh's 'model' axis and the updated state
    comes back with the same placement, so parameters/optimizer moments
    never materialize unsharded. Default None = fully replicated state
    (the reference-parity pure-DP configuration).

    With `donate_state` the input state is DONATED: params/opt_state/EMA
    buffers update in place instead of being copied every step (~3x the
    parameter bytes of HBM traffic saved). Default OFF: XLA:CPU's in-process
    collectives crash with donated replicated operands on the virtual mesh,
    and the axon-tunneled TPU backend rejects donation (InvalidArgument,
    measured 2026-08); enable on directly-attached TPU runtimes."""
    from metrabs_tpu.parallel import mesh as mesh_helpers

    if donate_state is None:
        donate_state = False
    batch_sh = mesh_helpers.batch_sharding(mesh)
    repl = mesh_helpers.replicated(mesh)
    state_sh = repl if state_shardings is None else state_shardings
    return jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate_state else ())
