"""Op-level device-time attribution of the TRAINING step via jax.profiler.

The companion to scripts/profile_trace_cropmodel.py for the flagship
training config (VERDICT r3 #3a): runs the dual-stream Metrabs train step
(EffNetV2-L@384 by default, adamw+EMA, remat default-on) under a profiler
trace and aggregates EXCLUSIVE device op durations by category via
scripts/_tracelib.py. Combined with the step FLOP count (XLA cost
analysis, same method as scripts/mfu_experiments.py) this attributes the
training-MFU gap per op class instead of asserting "HBM-bound" from the
remat speedup alone.

  python scripts/profile_trace_train.py [--batch 16] [--no-remat]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._tracelib import exclusive_op_durations, load_latest_trace


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--backbone', default='efficientnetv2-l')
    parser.add_argument('--res', type=int, default=384)
    parser.add_argument('--batch', type=int, default=16,
                        help='per-stream batch (the step runs batch+batch)')
    parser.add_argument('--iters', type=int, default=3)
    parser.add_argument('--no-remat', action='store_true')
    parser.add_argument('--bn-bf16-stats', action='store_true',
                        help='BN batch statistics in bf16 (the r5 MFU '
                             'lever; EffNetV2 only) - compare the convert/'
                             'elementwise category share against the '
                             'default f32-reduction trace')
    parser.add_argument('--platform', default='',
                        help="'' keeps the default (TPU if attached); the "
                             "JAX_PLATFORMS env var is ignored under the "
                             "axon plugin, so this must be a flag")
    parser.add_argument('--outdir', default='/tmp/jax_trace_train')
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
    from metrabs_tpu.train import loop as loop_mod
    from metrabs_tpu.train import optim

    res, n = args.res, args.batch
    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=args.backbone,
                      backbone_remat=not args.no_remat)
    if args.bn_bf16_stats:
        from metrabs_tpu.models.backbones.efficientnet_v2 import \
            EfficientNetV2
        backbone = EfficientNetV2(
            model_name=args.backbone, dtype=jnp.bfloat16,
            remat=not args.no_remat, bn_bf16_stats=True)
    else:
        backbone = build_backbone(
            args.backbone, dtype=jnp.bfloat16, remat=not args.no_remat)
    model = Metrabs(cfg=cfg, backbone=backbone)
    tcfg = TrainConfig(training_steps=400_000)
    tx = optim.build_optimizer(tcfg)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, cfg, tcfg)
    state = jax.jit(lambda: loop_mod.create_train_state(
        model, tx, jax.random.PRNGKey(0), cfg))()

    rng = np.random.default_rng(0)
    K = np.array([[250.0, 0, res / 2], [0, 250.0, res / 2], [0, 0, 1]],
                 np.float32)
    batch3d = dict(
        image=jnp.asarray(rng.uniform(size=(n, res, res, 3)), jnp.float32),
        intrinsics=jnp.tile(jnp.asarray(K)[None], (n, 1, 1)),
        coords3d_true=jnp.asarray(
            rng.normal(size=(n, 17, 3)) * 200 + np.array([0, 0, 3000]),
            jnp.float32),
        joint_validity_mask=jnp.ones((n, 17), bool))
    batch2d = dict(
        image=jnp.asarray(rng.uniform(size=(n, res, res, 3)), jnp.float32),
        intrinsics=jnp.tile(jnp.asarray(K)[None], (n, 1, 1)),
        coords2d_true=jnp.asarray(
            rng.uniform(10, res - 10, size=(n, 14, 2)), jnp.float32),
        joint_validity_mask=jnp.ones((n, 14), bool))

    step = jax.jit(
        lambda st, b3, b2: step_fn(st, b3, b2, jax.random.PRNGKey(0)))

    def run_once(st):
        st, losses = step(st, batch3d, batch2d)
        jax.block_until_ready(losses['loss'])
        return st

    state = run_once(state)  # compile + warm
    with jax.profiler.trace(args.outdir):
        for _ in range(args.iters):
            state = run_once(state)

    events = load_latest_trace(args.outdir)
    if events is None:
        print('NO TRACE FILES — device profiling unsupported on this runtime')
        return

    def category(name):
        n_ = name.lower()
        if 'while' in n_:
            return 'while bookkeeping (scan/remat)'
        if 'depthwise' in n_:
            return 'depthwise-conv'
        if 'convolution' in n_ or 'conv' in n_ or 'dot' in n_:
            return 'conv/dot (MXU fwd+bwd)'
        if 'all-reduce' in n_ or 'psum' in n_:
            return 'collectives'
        if 'reduce' in n_ or 'mean' in n_:
            return 'reduce'
        if 'scatter' in n_ or 'select-and-scatter' in n_:
            return 'pool-backward scatter'
        if 'fusion' in n_ or 'add' in n_ or 'multiply' in n_:
            return 'fusion (elementwise/BN/opt)'
        if 'copy' in n_ or 'transpose' in n_ or 'reshape' in n_ \
                or 'bitcast' in n_:
            return 'layout/copy'
        return 'other'

    totals = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for name, dur_us in exclusive_op_durations(events):
        dur = dur_us / 1e3
        totals[category(name)] += dur
        by_name[name[:80]] += dur
        total += dur
    print(f'total device time: {total:.2f} ms over {args.iters} steps '
          f'({total / args.iters:.2f} ms/step at batch {n}+{n})')
    for cat, ms in totals.most_common():
        print(f'  {cat:32s} {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%')
    print('\ntop 20 ops:')
    for name, ms in by_name.most_common(20):
        print(f'  {ms:9.2f} ms  {name}')


if __name__ == '__main__':
    main()
