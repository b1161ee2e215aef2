"""Training-MFU experiments at the flagship config (VERDICT r3 #3).

Measures the dual-stream train step (Metrabs, EffNetV2-L@384 by default,
adamw+EMA) across remat-policy, optimizer-dtype, and batch variants on the
real chip, with per-variant:
  - ms/step and crops/s from an on-device lax.scan timing loop (the only
    timing that is honest over the tunnel — CLAUDE.md rule 3),
  - achieved TFLOP/s and MFU from the standard model-FLOPs definition
    (3x the forward FLOPs: fwd + 2x-fwd backward), where the forward
    count comes from XLA cost analysis of the UNSCANNED inference
    forward on the CPU backend — the same validated method as bench.py.

FLOP accounting note (measured 2026-08-19, this script's first version
got it wrong): HLO cost analysis of the TRAINING step is unusable for
MFU on two counts. (1) lax.scan lowers to a while loop whose body the
analysis counts ONCE, not trip_count times — the scanned-blocks layout
undercounts EffNetV2-S@128 4.9x (22.8 vs 111.8 GFLOP/step). (2) The
backward of strided/dilated convs lowers to convs over zero-dilated
inputs whose padded FLOPs the analysis counts at face value — the
unscanned no-remat step counts 13.7x the forward (theoretical: 3x).
So: MFU here = measured_crops_per_sec * 3 * fwd_flops_per_crop / peak
(the PaLM-style model-FLOPs definition; remat recompute NOT credited),
plus an informational hw_flops utilization crediting remat's extra
forward (4x fwd) for remat variants.

Remat-policy family: conv nets have no useful dots-targeted
jax.checkpoint policy (the FLOPs live in conv_general_dilated, which the
dots_* policies ignore); the lever that exists on this workload is WHERE
block remat stops (`EfficientNetV2.remat_until_block`) — early high-res
stages dominate activation memory, late wide stages dominate FLOPs.

  python scripts/mfu_experiments.py                      # full sweep
  python scripts/mfu_experiments.py --variants remat_all no_remat
  python scripts/mfu_experiments.py --platform cpu --backbone \
      efficientnetv2-s --res 128 --batch 4 --iters 2     # smoke

Writes MFU_r04.json (one record per variant, partial results kept on
crash) and prints a PARITY-ready markdown table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197.0  # v5e MXU peak (bench.py)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--backbone', default='efficientnetv2-l')
    parser.add_argument('--res', type=int, default=384)
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--iters', type=int, default=6)
    parser.add_argument('--platform', default='',
                        help="'' keeps the default (TPU if attached)")
    parser.add_argument('--variants', nargs='+', default=None,
                        help='subset of variant names to run')
    parser.add_argument('--out', default='/root/repo/MFU_r04.json')
    parser.add_argument('--flops-batch', type=int, default=4,
                        help='batch for the CPU flops lowering (scaled '
                             'linearly to --batch)')
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import threading
    _init_done = threading.Event()

    def _watchdog():
        timeout = int(os.environ.get('MFU_INIT_TIMEOUT', '300'))
        if not _init_done.wait(timeout):
            print(f'mfu: backend init did not complete in {timeout}s '
                  f'(tunnel down?); aborting', file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    print(jax.devices(), flush=True)
    _init_done.set()

    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.models.backbones.efficientnet_v2 import EfficientNetV2
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
    from metrabs_tpu.train import loop as loop_mod
    from metrabs_tpu.train import optim

    res, n = args.res, args.batch
    is_effnet = args.backbone.startswith('efficientnetv2')

    def make_backbone(remat, remat_until=10_000, bn_bf16_stats=False):
        if is_effnet:
            return EfficientNetV2(
                model_name=args.backbone, dtype=jnp.bfloat16,
                scan_blocks=True, remat=remat, remat_until_block=remat_until,
                bn_bf16_stats=bn_bf16_stats)
        if bn_bf16_stats:
            raise ValueError('bn_bf16_stats variant is wired for EffNetV2')
        return build_backbone(args.backbone, dtype=jnp.bfloat16, remat=remat)

    # EffNetV2-L stage boundaries (cumulative blocks: 4,11,18,28,47,72,79).
    VARIANTS = {
        'remat_all': dict(remat=True),
        'no_remat': dict(remat=False),
        'remat_first18': dict(remat=True, remat_until=18),
        'remat_first28': dict(remat=True, remat_until=28),
        'remat_first47': dict(remat=True, remat_until=47),
        'mu_bf16': dict(remat=True, mu_dtype='bfloat16'),
        'remat_first28_mu_bf16': dict(remat=True, remat_until=28,
                                      mu_dtype='bfloat16'),
        # r5 lever (VERDICT r4 #6b): BN batch statistics reduced in bf16
        # instead of flax's f32-upcast reductions — targets the
        # "BN-stats converts" slice of the r4 roofline
        # (scripts/profile_trace_train.py: 59% of the step is
        # O(1)-intensity HBM traffic). Accuracy bound:
        # tests/test_bn_bf16_stats.py.
        'bn_stats_bf16': dict(remat=True, bn_bf16_stats=True),
        'bn_stats_bf16_mu_bf16': dict(remat=True, bn_bf16_stats=True,
                                      mu_dtype='bfloat16'),
    }
    names = args.variants or list(VARIANTS)

    rng = np.random.default_rng(0)
    K = np.array([[250.0, 0, res / 2], [0, 250.0, res / 2], [0, 0, 1]],
                 np.float32)

    def make_batches(nb):
        batch3d = dict(
            image=jnp.asarray(rng.uniform(size=(nb, res, res, 3)),
                              jnp.float32),
            intrinsics=jnp.tile(jnp.asarray(K)[None], (nb, 1, 1)),
            coords3d_true=jnp.asarray(
                rng.normal(size=(nb, 17, 3)) * 200 + np.array([0, 0, 3000]),
                jnp.float32),
            joint_validity_mask=jnp.ones((nb, 17), bool))
        batch2d = dict(
            image=jnp.asarray(rng.uniform(size=(nb, res, res, 3)),
                              jnp.float32),
            intrinsics=jnp.tile(jnp.asarray(K)[None], (nb, 1, 1)),
            coords2d_true=jnp.asarray(
                rng.uniform(10, res - 10, size=(nb, 14, 2)), jnp.float32),
            joint_validity_mask=jnp.ones((nb, 14), bool))
        return batch3d, batch2d

    def build(variant):
        cfg = ModelConfig(proc_side=res, depth=8, n_joints=17,
                          dtype='bfloat16', backbone=args.backbone,
                          backbone_remat=variant.get('remat', True))
        tcfg = TrainConfig(
            training_steps=400_000,
            optimizer_mu_dtype=variant.get('mu_dtype', ''))
        model = Metrabs(cfg=cfg, backbone=make_backbone(
            variant.get('remat', True), variant.get('remat_until', 10_000),
            variant.get('bn_bf16_stats', False)))
        tx = optim.build_optimizer(tcfg)
        step_fn = loop_mod.make_train_step(
            model, tx, H36M_17, LSP_14, cfg, tcfg)
        return model, tx, cfg, step_fn

    _fwd_flops_cache = {}

    def fwd_flops_per_crop():
        """Forward FLOPs/crop from the UNSCANNED inference lowering on the
        CPU backend (bench.py's validated method; see the module docstring
        for why the training-step HLO count is unusable)."""
        if 'v' in _fwd_flops_cache:
            return _fwd_flops_cache['v']
        cfg = ModelConfig(proc_side=res, depth=8, n_joints=17,
                          dtype='bfloat16', backbone=args.backbone)
        if is_effnet:
            bb = EfficientNetV2(model_name=args.backbone,
                                dtype=jnp.bfloat16, scan_blocks=False)
        else:
            bb = build_backbone(args.backbone, dtype=jnp.bfloat16)
        model = Metrabs(cfg=cfg, backbone=bb)
        nb = args.flops_batch
        params = jax.eval_shape(lambda: model.init(
            {'params': jax.random.PRNGKey(0)},
            jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None]))
        img = jax.ShapeDtypeStruct((nb, res, res, 3), jnp.bfloat16)
        intr = jax.ShapeDtypeStruct((nb, 3, 3), jnp.float32)
        # bench.py's exact method: PRE-compile cost analysis of the CPU
        # lowering (no compile happens; the axon backend returns None
        # pre-compile, and post-compile TPU counts include layout padding —
        # measured +11% at nb=1 vs this count).
        lowered = jax.jit(
            lambda p, i, k: model.apply(p, i, k, train=False),
            backend='cpu').lower(params, img, intr)
        costs = lowered.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        f = float(costs['flops']) / nb
        _fwd_flops_cache['v'] = f
        return f

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get('variants', {})

    for name in names:
        variant = VARIANTS[name]
        print(f'=== {name}: {variant}', flush=True)
        t_start = time.time()
        try:
            model, tx, cfg, step_fn = build(variant)
            state = jax.jit(lambda: loop_mod.create_train_state(
                model, tx, jax.random.PRNGKey(0), cfg))()
            b3, b2 = make_batches(n)

            def make(k):
                @jax.jit
                def run(st, x3, x2):
                    def body(carry, _):
                        new_st, losses = step_fn(
                            carry, x3, x2, jax.random.PRNGKey(0))
                        return new_st, losses['loss']
                    _, losses = jax.lax.scan(body, st, jnp.arange(k))
                    return losses
                return run

            run_n, run_1 = make(args.iters), make(1)

            def t(fn):
                t0 = time.perf_counter()
                np.asarray(fn(state, b3, b2))
                return time.perf_counter() - t0

            t(run_1), t(run_n)  # warm
            t1 = min(t(run_1) for _ in range(3))
            tn = min(t(run_n) for _ in range(3))
            ms = (tn - t1) / (args.iters - 1) * 1e3
            crops_s = 2 * n / ms * 1e3
            rec = dict(ms_per_step=round(ms, 2),
                       crops_per_sec=round(crops_s, 1),
                       batch=f'{n}+{n}', res=res, backbone=args.backbone)
            try:
                fwd = fwd_flops_per_crop()
                model_tflops = crops_s * 3 * fwd / 1e12
                rec.update(
                    fwd_flops_per_crop=fwd,
                    model_tflops=round(model_tflops, 1),
                    mfu_pct=round(100 * model_tflops / PEAK_BF16_TFLOPS, 1))
                if variant.get('remat', True):
                    hw = crops_s * 4 * fwd / 1e12  # + remat recompute fwd
                    rec.update(hw_tflops=round(hw, 1),
                               hw_util_pct=round(
                                   100 * hw / PEAK_BF16_TFLOPS, 1))
            except Exception as e:  # flops analysis is best-effort
                rec['flops_error'] = repr(e)
            print(f'  {rec}', flush=True)
        except Exception as e:
            rec = dict(error=repr(e)[:500])
            print(f'  FAILED: {rec["error"][:200]}', flush=True)
        rec['wall_s'] = round(time.time() - t_start, 1)
        results[name] = rec
        with open(args.out, 'w') as f:
            json.dump(dict(config=vars(args), variants=results), f, indent=1)

    # PARITY-ready table.
    print('\n| variant | ms/step | crops/s | MFU % |')
    print('|---|---|---|---|')
    for name, rec in results.items():
        if 'error' in rec:
            print(f'| {name} | FAILED ({rec["error"][:60]}) | | |')
        else:
            print(f'| {name} | {rec["ms_per_step"]} | {rec["crops_per_sec"]} '
                  f'| {rec.get("mfu_pct", "n/a")} |')


if __name__ == '__main__':
    main()
