"""Training driver CLI (the `metrabs_tf/main.py --train` equivalent).

Wires the data pipeline, sharded train step, checkpointing, EMA, metrics
logging and final export into one entry point. Datasets come in as pickles of
Example3D / Example2D lists (one file per dataset for round-robin mixing).

  python -m metrabs_tpu.apps.train \
      --ds3d h36m.pkl,muco.pkl --ds2d mpii.pkl,coco.pkl \
      --checkpoint-dir runs/exp1 --training-steps 400000 \
      --backbone efficientnetv2-s [--sections 4,6 --sections2d 8,8] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--ds3d', required=True, help='comma-separated Example3D pickles')
    p.add_argument('--ds2d', required=True, help='comma-separated Example2D pickles')
    p.add_argument('--sections', default=None,
                   help='round-robin counts per 3D dataset (default: equal split)')
    p.add_argument('--sections2d', default=None)
    p.add_argument('--checkpoint-dir', required=True)
    p.add_argument('--backbone', default='efficientnetv2-s')
    p.add_argument('--proc-side', type=int, default=256)
    p.add_argument('--depth', type=int, default=8)
    p.add_argument('--n-joints', type=int, default=17)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--batch-size-2d', type=int, default=32)
    p.add_argument('--training-steps', type=int, default=400_000)
    p.add_argument('--base-learning-rate', type=float, default=2.121e-4)
    p.add_argument('--grad-accum-steps', type=int, default=1)
    p.add_argument('--ema-momentum', type=float, default=1.0)
    p.add_argument('--constrain-kernel-norm', type=float,
                   default=float('inf'),
                   help='max-norm projection of conv kernels after each '
                        'update (Keras MinMaxNorm constraint, '
                        '`builder.py:54-60`); inf (default) = off')
    p.add_argument('--dual-finetune-lr', action='store_true')
    p.add_argument('--ghost-bn-splits', type=int, default=1)
    p.add_argument('--seed', type=int, default=1)
    p.add_argument('--workers', type=int, default=12)
    p.add_argument('--checkpoint-period', type=int, default=2000)
    p.add_argument('--log-period', type=int, default=100)
    p.add_argument('--ds3d-val', default=None,
                   help='held-out Example3D pickle for periodic in-training '
                        'validation (`main.py:84-93`)')
    p.add_argument('--validate-period', type=int, default=0,
                   help='run the validation metric pass every N optimizer '
                        'steps (0 = off)')
    p.add_argument('--batch-size-test', type=int, default=150)
    p.add_argument('--load-path', default=None)
    p.add_argument('--init-path', default=None)
    p.add_argument('--load-backbone-from', default=None,
                   help='package dir (or crop_model.msgpack): warm-start '
                        'the backbone from an exported crop model, grafting '
                        'the source head joints into the last head slots '
                        '(set_last_point_weights) like the reference '
                        'backbone warm start (`main.py:186-191`); skipped '
                        'for --transform-coords, as there')
    p.add_argument('--export-dir', default=None)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--finetune-in-inference-mode', type=int, default=0,
                   help='freeze BN to inference mode for the final N steps '
                        '(metrabs_tf/main.py:131-134)')
    p.add_argument('--no-remat', action='store_true',
                   help='disable backbone block rematerialization. Remat is '
                        'ON by default for training: measured ~2x step '
                        'throughput (766 -> 1496 crops/s, EffNetV2-S@256 '
                        'batch 32+32 on v5e — the backward pass is '
                        'HBM-bound, so storing fewer activations wins '
                        'despite the recompute) and it unblocks batch 128.')
    p.add_argument('--optimizer-mu-dtype', default='',
                   help="Adam first-moment dtype, e.g. 'bfloat16' "
                        '(second moment stays float32)')
    p.add_argument('--distributed', action='store_true',
                   help='multi-host: jax.distributed.initialize() from the '
                        'TPU pod environment; batch sizes are GLOBAL and '
                        'each process loads its local shard')
    p.add_argument('--model-parallel', type=int, default=1,
                   help='mesh extent of the model axis: kernels are sharded '
                        'over it (parallel.mesh.tp_shardings) and the data '
                        'axis shrinks accordingly. 1 (default) = pure DP, '
                        'the reference-parity configuration')
    p.add_argument('--tp-min-size', type=int, default=2 ** 16,
                   help='smallest kernel (elements) sharded over the model '
                        'axis; smaller leaves stay replicated')
    p.add_argument('--absloss-factor', type=float, default=None,
                   help='weight of the absolute-pose loss once active '
                        '(reference FLAGS.absloss_factor, `init.py:232`; '
                        'default 0.1)')
    p.add_argument('--absloss-start-step', type=int, default=None,
                   help='optimizer step after which the absolute-pose loss '
                        'switches on (reference '
                        'FLAGS.absloss_start_step, `init.py:231`; default '
                        '5000). Must be < --training-steps for the '
                        'absolute channel to train at all.')
    p.add_argument('--model-class', default='metrabs',
                   choices=('metrabs', 'metro', 'model25d'),
                   help='crop-model architecture (`main.py:177-180`): '
                        'metrabs (absolute, default), metro (root-relative '
                        'only), model25d (2.5D head + bone-length depth)')
    p.add_argument('--bone-lengths', default=None,
                   help='model25d: npz with `lengths` [n_bones] ideal bone '
                        'lengths in mm (bones = the 3D joint set\'s edges), '
                        'optionally `bones` [n_bones, 2] joint-index pairs '
                        '(`main.py:173-175`, dataset mean bones)')
    # Latent-joint / manifold fine-tuning (`init.py:235-251`): all three
    # modes need --affine-weights (npz with w1 [J,L] encode, w2 [L,J] decode).
    p.add_argument('--affine-weights', default=None)
    p.add_argument('--transform-coords', action='store_true')
    p.add_argument('--predict-all-and-latents', action='store_true')
    p.add_argument('--regularize-to-manifold', action='store_true')
    # Augmentation hyperparameters (the reference's FLAGS surface,
    # `init.py:127-153`; defaults = LoadConfig defaults = reference
    # defaults). Synthetic/controlled datasets often need these reduced —
    # e.g. random-erase occlusion deletes thin structures entirely.
    p.add_argument('--no-geom-aug', action='store_true',
                   help='disable rotation/scale/shift/flip augmentation')
    p.add_argument('--no-color-aug', action='store_true')
    p.add_argument('--rot-aug-degrees', type=float, default=None)
    p.add_argument('--scale-aug-up', type=float, default=None)
    p.add_argument('--scale-aug-down', type=float, default=None)
    p.add_argument('--shift-aug', type=float, default=None)
    p.add_argument('--occlude-aug-prob', type=float, default=None)
    p.add_argument('--occlude-aug-prob-2d', type=float, default=None)
    p.add_argument('--background-aug-prob', type=float, default=None)
    p.add_argument('--partial-visibility-prob', type=float, default=None)
    return p.parse_args(argv)


def build_load_config(args):
    """LoadConfig from CLI overrides (None = keep the reference default)."""
    from metrabs_tpu.data.loading import LoadConfig

    overrides = {}
    if args.no_geom_aug:
        overrides['geom_aug'] = False
    if args.no_color_aug:
        overrides['color_aug'] = False
    for field in ('rot_aug_degrees', 'scale_aug_up', 'scale_aug_down',
                  'shift_aug', 'occlude_aug_prob', 'occlude_aug_prob_2d',
                  'background_aug_prob', 'partial_visibility_prob'):
        value = getattr(args, field)
        if value is not None:
            overrides[field] = value
    return LoadConfig(**overrides)


def warm_start_backbone(state, path, cfg, apply_head_surgery: bool):
    """Backbone warm start from an exported crop model (`main.py:186-191`):
    grafts the source backbone params/batch_stats into the fresh state and,
    for Metrabs heads, writes the source head's joints into the LAST slots
    of this model's head (set_last_point_weights) so a bigger-joint-set
    model can fine-tune from a smaller one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.io.checkpoints import load_model_msgpack
    from metrabs_tpu.models.metrabs import set_last_point_weights

    mp = (os.path.join(path, 'crop_model.msgpack')
          if os.path.isdir(path) else path)
    loaded = load_model_msgpack(mp)['variables']

    def graft(dst, collection):
        src = loaded.get(collection, {})
        if 'backbone' not in src or not isinstance(dst, dict) \
                or 'backbone' not in dst:
            return dst
        shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(x.shape), t)
        if shapes(src['backbone']) != shapes(dst['backbone']):
            raise SystemExit(
                f'--load-backbone-from: {collection}/backbone tree does not '
                f'match the configured backbone ({cfg.backbone})')
        out = dict(dst)
        out['backbone'] = jax.tree_util.tree_map(jnp.asarray, src['backbone'])
        return out

    params = graft(state.params, 'params')
    batch_stats = graft(state.batch_stats, 'batch_stats')
    if apply_head_surgery:
        try:
            conv = loaded['params']['heatmap_heads']['conv_final']
        except (KeyError, TypeError):
            conv = None
            print('load-backbone-from: source has no metrabs head; '
                  'backbone grafted, head left at init', flush=True)
        if conv is not None:
            params = jax.tree_util.tree_map(jnp.asarray, set_last_point_weights(
                params, np.asarray(conv['kernel']), np.asarray(conv['bias']),
                depth=cfg.depth, n_points=cfg.n_joints))
    # EMA tracks params; keep it consistent with the warm-started values
    # (create_train_state initializes ema_params = params).
    return dataclasses.replace(
        state, params=params, batch_stats=batch_stats,
        ema_params=params if state.ema_params is not None else None)


def main(argv=None):
    args = parse_args(argv)
    import jax
    if args.distributed:
        # Multi-host data parallelism over DCN: the mesh below then spans
        # all processes' devices; gradient psum rides ICI within a slice and
        # DCN across (SURVEY.md §5 distributed-comms plan).
        jax.distributed.initialize()
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    import orbax.checkpoint as ocp

    from metrabs_tpu.config import AugConfig, ModelConfig, TrainConfig
    from metrabs_tpu.data.loading import LoadConfig, load_and_transform2d, \
        load_and_transform3d
    from metrabs_tpu.data.pipeline import (
        ParallelBatchLoader, roundrobin_iterate)
    from metrabs_tpu.io import checkpoints as ckpt_mod
    from metrabs_tpu.io.packaging import save_pose_estimator_package
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.parallel import mesh as mesh_mod
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14, SkeletonRegistry
    from metrabs_tpu.train import loop as loop_mod, optim

    cfg = ModelConfig(
        proc_side=args.proc_side, depth=args.depth, n_joints=args.n_joints,
        dtype=args.dtype, backbone=args.backbone,
        backbone_remat=not args.no_remat)
    tcfg = TrainConfig(
        batch_size=args.batch_size, batch_size_2d=args.batch_size_2d,
        training_steps=args.training_steps,
        base_learning_rate=args.base_learning_rate,
        grad_accum_steps=args.grad_accum_steps,
        ema_momentum=args.ema_momentum, dual_finetune_lr=args.dual_finetune_lr,
        ghost_bn_splits=(args.ghost_bn_splits,), seed=args.seed,
        finetune_in_inference_mode=args.finetune_in_inference_mode,
        optimizer_mu_dtype=args.optimizer_mu_dtype,
        transform_coords=args.transform_coords,
        predict_all_and_latents=args.predict_all_and_latents,
        regularize_to_manifold=args.regularize_to_manifold,
        constrain_kernel_norm=args.constrain_kernel_norm,
        batch_size_test=args.batch_size_test,
        **{k: v for k, v in (('absloss_factor', args.absloss_factor),
                             ('absloss_start_step', args.absloss_start_step))
           if v is not None})
    if (args.model_class == 'metrabs'
            and tcfg.absloss_start_step
            >= args.training_steps * args.grad_accum_steps):
        print(f'WARNING: absloss_start_step ({tcfg.absloss_start_step}) >= '
              f'total steps ({args.training_steps * args.grad_accum_steps}) '
              f'— the ABSOLUTE-pose loss will never activate in this run '
              f'(pass --absloss-start-step < total steps)', flush=True)

    affine_weights = None
    latent_mode = ''
    if args.transform_coords:
        latent_mode = 'transform_coords'
    elif args.predict_all_and_latents:
        latent_mode = 'predict_all_and_latents'
    if args.model_class != 'metrabs' and (
            latent_mode or args.regularize_to_manifold):
        raise SystemExit('latent/manifold modes apply to the metrabs model '
                         'class only')
    if latent_mode or args.regularize_to_manifold:
        if not args.affine_weights:
            raise SystemExit('--affine-weights is required for latent/'
                             'manifold modes (`init.py:225-235`)')
        from metrabs_tpu.train.loop import load_affine_weights
        affine_weights = load_affine_weights(args.affine_weights)
        n_latents = affine_weights['recombination_weights'].shape[0]
    else:
        n_latents = 0

    # Joint sets: 3D = model joints (H36M-17 built-in; packaged sets via
    # skeleton registry), 2D = LSP-14-compatible weak annotations.
    joint_info3d, joint_info2d = H36M_17, LSP_14

    # Data streams.
    def load_lists(spec):
        lists = []
        for path in spec.split(','):
            with open(path, 'rb') as f:
                lists.append(pickle.load(f))
        return lists

    lists3d = load_lists(args.ds3d)
    lists2d = load_lists(args.ds2d)
    rng_np = np.random.default_rng(args.seed)

    def sections(spec, n_lists, total):
        if spec:
            out = [int(x) for x in spec.split(',')]
            assert len(out) == n_lists and sum(out) == total, (out, total)
            return out
        base = total // n_lists
        out = [base] * n_lists
        out[0] += total - base * n_lists
        return out

    it3d = roundrobin_iterate(
        lists3d, sections(args.sections, len(lists3d), args.batch_size), rng_np)
    it2d = roundrobin_iterate(
        lists2d, sections(args.sections2d, len(lists2d), args.batch_size_2d),
        rng_np)

    # Per-process (local) batch sizes; the sharded step sees global arrays.
    n_proc = jax.process_count()
    assert args.batch_size % n_proc == 0 and args.batch_size_2d % n_proc == 0, (
        'global batch sizes must divide the process count')
    local_bs = args.batch_size // n_proc
    local_bs2 = args.batch_size_2d // n_proc
    if n_proc > 1:
        # Every process runs the SAME round-robin order (same seed) and takes
        # its own slice of each global block — distinct examples per process,
        # not n_proc augmentation-jittered duplicates of one local stream.
        from metrabs_tpu.data.pipeline import shard_example_stream
        it3d = shard_example_stream(
            it3d, args.batch_size, jax.process_index(), n_proc)
        it2d = shard_example_stream(
            it2d, args.batch_size_2d, jax.process_index(), n_proc)

    lcfg = build_load_config(args)
    loader3 = ParallelBatchLoader(
        lambda ex, r: load_and_transform3d(ex, joint_info3d, True, r, cfg, lcfg),
        it3d, batch_size=local_bs, n_workers=args.workers,
        seed=args.seed + 101 * jax.process_index())
    loader2 = ParallelBatchLoader(
        lambda ex, r: load_and_transform2d(ex, joint_info2d, True, r, cfg, lcfg),
        it2d, batch_size=local_bs2, n_workers=args.workers,
        seed=args.seed + 1 + 101 * jax.process_index())

    # Model + optimizer + sharded step (model class per `main.py:177-180`).
    backbone = build_backbone(
        cfg.backbone, ghost_splits=args.ghost_bn_splits,
        dtype=jnp.dtype(cfg.dtype), remat=cfg.backbone_remat,
        stride_test=(cfg.stride_test
                     if cfg.stride_test != cfg.stride_train else None))
    tx = optim.build_optimizer(tcfg)
    bones_25d = bone_lengths_ideal = None
    if args.model_class == 'metrabs':
        model = Metrabs(cfg=cfg, backbone=backbone,
                        latent_mode=latent_mode, n_latents=n_latents)
        make_step = lambda **kw: loop_mod.make_train_step(
            model, tx, joint_info3d, joint_info2d, cfg, tcfg,
            affine_weights=affine_weights, **kw)
        with_intrinsics = True
    elif args.model_class == 'metro':
        from metrabs_tpu.models.metro import Metro
        model = Metro(cfg=cfg, backbone=backbone)
        make_step = lambda **kw: loop_mod.make_train_step_metro(
            model, tx, joint_info3d, joint_info2d, cfg, tcfg, **kw)
        with_intrinsics = False
    else:  # model25d
        if not args.bone_lengths:
            raise SystemExit('--bone-lengths (npz) is required for '
                             '--model-class model25d (`main.py:173-175`)')
        from metrabs_tpu.models.model25d import Model25D
        bl = np.load(args.bone_lengths)
        bones_25d = (tuple(tuple(map(int, b)) for b in bl['bones'])
                     if 'bones' in bl else joint_info3d.edges)
        bone_lengths_ideal = tuple(float(x) for x in bl['lengths'])
        if len(bone_lengths_ideal) != len(bones_25d):
            raise SystemExit(
                f'{len(bone_lengths_ideal)} bone lengths for '
                f'{len(bones_25d)} bones')
        model = Model25D(cfg=cfg, backbone=backbone, bones=bones_25d,
                         bone_lengths_ideal=bone_lengths_ideal)
        make_step = lambda **kw: loop_mod.make_train_step_model25d(
            model, tx, joint_info3d, joint_info2d, cfg, tcfg, **kw)
        with_intrinsics = True
    state = loop_mod.create_train_state(
        model, tx, jax.random.PRNGKey(args.seed), cfg,
        with_intrinsics=with_intrinsics)
    if args.load_backbone_from:
        # Reference order: warm start at build, checkpoint restore (below)
        # still takes precedence (`main.py:186-191,393-408`).
        state = warm_start_backbone(
            state, args.load_backbone_from, cfg,
            apply_head_surgery=(args.model_class == 'metrabs'
                                and not args.transform_coords))
        print(f'warm-started backbone from {args.load_backbone_from}',
              flush=True)
    step_fn = make_step()
    mesh = mesh_mod.make_mesh(n_model=args.model_parallel)
    state_shardings = (
        mesh_mod.tp_shardings(mesh, state, min_size=args.tp_min_size)
        if args.model_parallel > 1 else None)
    sharded_step = loop_mod.make_sharded_train_step(
        step_fn, mesh, state_shardings=state_shardings)
    # Final-phase step with BN frozen in inference mode
    # (`metrabs_tf/main.py:131-134`); switched in by step index below.
    sharded_step_inf = None
    if tcfg.finetune_in_inference_mode:
        sharded_step_inf = loop_mod.make_sharded_train_step(
            make_step(bn_inference=True), mesh,
            state_shardings=state_shardings)

    # Checkpoint restore (precedence: load_path > latest > init_path).
    manager = ckpt_mod.make_checkpoint_manager(
        args.checkpoint_dir, save_interval_steps=args.checkpoint_period)
    restored, start_step = ckpt_mod.restore_train_state(
        manager, jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state),
        load_path=args.load_path, init_path=args.init_path)
    if restored is not None:
        state = restored
        print(f'restored checkpoint at step {start_step}', flush=True)

    log_path = os.path.join(args.checkpoint_dir, 'train_log.jsonl')
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed + 2)

    def batch_fields(b, keys):
        return {k: v for k, v in b.items() if k in keys}

    # Double-buffered device feeding: batches are put to the device (sharded
    # over the mesh's data axis) one step ahead of consumption.
    from metrabs_tpu.data.pipeline import device_prefetch
    from metrabs_tpu.parallel.mesh import batch_sharding
    sharding = batch_sharding(mesh)
    # model25d additionally supervises the 2D pixel coords of the 3D batch
    # (`twofive.py:105-107`).
    feed3_keys = ('image', 'intrinsics', 'coords3d_true',
                  'joint_validity_mask')
    if args.model_class == 'model25d':
        feed3_keys += ('coords2d_true',)

    # Accumulate dataset mean bone lengths from the GT batches as they
    # stream by (host-side, before device put) so the exported package
    # ships dataset-derived plausibility priors — the reference's
    # bone_length_file pickle (`plausibility_check.py:12-16`) derived from
    # trainval, not invented constants.
    from metrabs_tpu.pipeline.plausibility import BoneLengthStats
    bone_stats = BoneLengthStats(joint_info3d.edges)

    def _accumulate_bones(gen):
        for b in gen:
            bone_stats.update(b['coords3d_true'], b['joint_validity_mask'])
            yield b

    feed3 = device_prefetch(
        _accumulate_bones(batch_fields(b, feed3_keys) for b in loader3),
        sharding)
    feed2 = device_prefetch(
        (batch_fields(b, ('image', 'intrinsics', 'coords2d_true',
                          'joint_validity_mask')) for b in loader2), sharding)

    # Periodic validation over a held-out 3D set (`main.py:84-93,143-145`):
    # a forward-only metric pass through the eval harness, logged alongside
    # the training losses.
    val_examples = None
    if args.ds3d_val and args.validate_period:
        if args.model_class != 'metrabs':
            raise SystemExit('--ds3d-val validation supports the metrabs '
                             'crop model (absolute metrics)')
        with open(args.ds3d_val, 'rb') as f:
            val_examples = pickle.load(f)

    def run_validation(step_idx):
        from metrabs_tpu.eval.harness import (
            evaluate_predictions, predict_dataset)
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats

        def crop_fn(vs, crops, K, valid):
            return model.apply(vs, crops, K, train=False, sample_valid=valid)

        preds = predict_dataset(
            crop_fn, val_examples, joint_info3d, cfg,
            crop_model_state=variables, batch_size=tcfg.batch_size_test,
            n_workers=args.workers)
        m = evaluate_predictions(preds, joint_info=joint_info3d)
        rec = dict(step=step_idx, **{f'val_{k}': v for k, v in m.items()})
        if jax.process_index() == 0:
            print(json.dumps(rec), flush=True)
            with open(log_path, 'a') as f:
                f.write(json.dumps(rec) + '\n')

    total_steps = args.training_steps * args.grad_accum_steps
    # Step index at which BN switches to frozen inference mode
    # ((training_steps - N) * grad_accum_steps, `main.py:132-134`).
    switch_step = total_steps + 1
    if tcfg.finetune_in_inference_mode:
        switch_step = ((args.training_steps - tcfg.finetune_in_inference_mode)
                       * args.grad_accum_steps)
    t_last = time.time()
    try:
        with mesh:
            for i in range(int(state.step), total_steps):
                b3 = next(feed3)
                b2 = next(feed2)
                active_step = (sharded_step_inf
                               if i >= switch_step else sharded_step)
                state, losses = active_step(
                    state, b3, b2, jax.random.fold_in(rng, i))
                if (i + 1) % args.log_period == 0:
                    loss = float(losses['loss'])
                    dt = time.time() - t_last
                    t_last = time.time()
                    rec = dict(step=i + 1, loss=loss,
                               steps_per_sec=args.log_period / dt)
                    if jax.process_index() == 0:
                        print(json.dumps(rec), flush=True)
                        with open(log_path, 'a') as f:
                            f.write(json.dumps(rec) + '\n')
                if (val_examples is not None
                        and (i + 1) % (args.validate_period
                                       * args.grad_accum_steps) == 0):
                    run_validation(i + 1)
                if manager.should_save(i + 1):
                    manager.save(i + 1, args=ocp.args.StandardSave(state))
    finally:
        # Always save on interrupt (`main.py:155-157`); force=True because
        # the manager's save_interval_steps would silently skip off-interval
        # steps otherwise.
        final_step = int(state.step)
        if manager.latest_step() != final_step:
            manager.save(final_step, args=ocp.args.StandardSave(state),
                         force=True)
        manager.wait_until_finished()
        loader3.close()
        loader2.close()

    if args.export_dir:
        variables = {'params': state.ema_params
                     if tcfg.ema_momentum < 1 else state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        if latent_mode:
            # The deployed model decodes latent points with the AE weights
            # (Metrabs 'constants' collection).
            variables['constants'] = dict(
                recombination_weights=affine_weights['recombination_weights'],
                encoder_weights=affine_weights['encoder_weights'])
        # Parameters are replicated across the mesh, so process 0 holds a
        # complete copy and exports alone.
        # Ship dataset-derived mean bone lengths when the run actually saw
        # GT batches; edges never observed (NaN) or a 0-step run fall back
        # to None and the estimator warns loudly at load time.
        bone_means = bone_stats.mean_lengths()
        if bone_stats.n_samples == 0 or not np.isfinite(bone_means).all():
            bone_means = None
        if jax.process_index() == 0:
            save_pose_estimator_package(
                args.export_dir, cfg=cfg, aug_cfg=AugConfig(),
                crop_model_variables=variables, joint_info=joint_info3d,
                skeleton_registry=SkeletonRegistry(joint_info3d),
                latent_mode=latent_mode, n_latents=n_latents,
                model_class=args.model_class, bones_25d=bones_25d,
                bone_lengths_ideal=bone_lengths_ideal,
                bone_mean_lengths=bone_means)
            print(f'exported package to {args.export_dir}')


if __name__ == '__main__':
    main()
