"""Training-MFU experiments at the flagship config (VERDICT r3 #3).

Measures the dual-stream train step (Metrabs, EffNetV2-L@384 by default,
adamw+EMA) across remat-policy, optimizer-dtype, and batch variants on the
real chip, with per-variant:
  - ms/step and crops/s from an on-device lax.scan timing loop (the only
    timing that is honest over the tunnel — CLAUDE.md rule 3),
  - achieved TFLOP/s and MFU from XLA cost analysis of the step HLO
    (flops lowered for the CPU backend at a small batch and scaled
    linearly — verified with a two-point linearity check),
  - compiled peak-memory figures (memory_analysis) where the backend
    reports them.

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

    def make_backbone(remat, remat_until=10_000):
        if is_effnet:
            return EfficientNetV2(
                model_name=args.backbone, dtype=jnp.bfloat16,
                scan_blocks=True, remat=remat, remat_until_block=remat_until)
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
            variant.get('remat', True), variant.get('remat_until', 10_000)))
        tx = optim.build_optimizer(tcfg)
        step_fn = loop_mod.make_train_step(
            model, tx, H36M_17, LSP_14, cfg, tcfg)
        return model, tx, cfg, step_fn

    def flops_per_step(variant):
        """Step flops via CPU-backend lowering at a small batch, scaled
        linearly (conv/matmul flops are linear in batch; the two-point
        check below guards the assumption)."""
        model, tx, cfg, step_fn = build(variant)
        cpu = jax.devices('cpu')[0]

        def count(nb):
            b3, b2 = jax.eval_shape(lambda: make_batches(nb))
            state_shape = jax.eval_shape(
                lambda: loop_mod.create_train_state(
                    model, tx, jax.random.PRNGKey(0), cfg))
            lowered = jax.jit(
                lambda st, x3, x2: step_fn(st, x3, x2, jax.random.PRNGKey(0)),
                device=cpu).lower(state_shape, b3, b2)
            return float(lowered.compile().cost_analysis()['flops'])

        f1 = count(args.flops_batch)
        f2 = count(args.flops_batch * 2)
        lin = f2 / (2 * f1)
        if not 0.95 < lin < 1.05:
            print(f'  WARNING: flops nonlinearity {lin:.3f}', flush=True)
        return f1 / args.flops_batch * n, lin

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
                fl, lin = flops_per_step(variant)
                tflops = fl / (ms / 1e3) / 1e12
                rec.update(flops_per_step=fl, flops_linearity=round(lin, 4),
                           achieved_tflops=round(tflops, 1),
                           mfu_pct=round(100 * tflops / PEAK_BF16_TFLOPS, 1))
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
