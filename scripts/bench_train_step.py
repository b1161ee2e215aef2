"""Train-step throughput on the real chip (on-device scan timing).

Measures the full dual-stream train step (EffNetV2-S@256, adamw + EMA) at
several batch sizes, and an adam mu_dtype=bf16 variant — the ROADMAP #3
"training throughput" evidence base.

  python scripts/bench_train_step.py [--batch 32 64] [--backbone ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--backbone', default='efficientnetv2-s')
    parser.add_argument('--res', type=int, default=256)
    parser.add_argument('--batch', type=int, nargs='+', default=[32, 64])
    parser.add_argument('--iters', type=int, default=8)
    parser.add_argument('--remat', action='store_true',
                        help='rematerialize backbone blocks (backward-pass '
                             'recompute; enables larger batches)')
    parser.add_argument('--mu-dtype', default='',
                        help="optimizer_mu_dtype, e.g. 'bfloat16'")
    parser.add_argument('--grad-accum', type=int, default=1,
                        help='grad_accum_steps (optax.MultiSteps); compare '
                             'k steps at batch n against 1 step at k*n to '
                             'see the accumulation overhead')
    args = parser.parse_args()
    if args.iters < 2:
        parser.error('--iters must be >= 2 (throughput is the t_N - t_1 '
                     'difference)')

    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
    from metrabs_tpu.train import loop as loop_mod
    from metrabs_tpu.train import optim

    res = args.res
    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=args.backbone, backbone_remat=args.remat)
    tcfg = TrainConfig(training_steps=400000,
                       optimizer_mu_dtype=args.mu_dtype,
                       grad_accum_steps=args.grad_accum)
    model = Metrabs(cfg=cfg, backbone=build_backbone(args.backbone,
                                                     remat=args.remat))
    tx = optim.build_optimizer(tcfg)
    state = jax.jit(
        lambda: loop_mod.create_train_state(
            model, tx, jax.random.PRNGKey(0), cfg))()
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, cfg, tcfg)

    def run_case(n):
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

        def make(k):
            # Batches are jit ARGUMENTS: closed-over device arrays lower as
            # HLO constants (~200 MB at batch 128) and blow up the remote
            # compile request (CLAUDE.md rule 1).
            @jax.jit
            def run(state, b3, b2):
                def body(carry, i):
                    st = carry
                    new_st, losses = step_fn(
                        st, b3, b2, jax.random.PRNGKey(0))
                    return new_st, losses['loss']
                st, losses = jax.lax.scan(body, state, jnp.arange(k))
                return losses
            return run
        run_n, run_1 = make(args.iters), make(1)
        np.asarray(run_1(state, batch3d, batch2d))
        np.asarray(run_n(state, batch3d, batch2d))

        def t(fn):
            t0 = time.perf_counter()
            np.asarray(fn(state, batch3d, batch2d))
            return time.perf_counter() - t0
        t1 = min(t(run_1) for _ in range(3))
        tn = min(t(run_n) for _ in range(3))
        ms = (tn - t1) / (args.iters - 1) * 1e3
        print(f'batch {n}+{n}: {ms:7.2f} ms/step = {2 * n / ms * 1e3:7.1f} '
              f'crops/s', flush=True)

    print(jax.devices())
    for n in args.batch:
        run_case(n)


if __name__ == '__main__':
    main()
