"""Probe: does splitting XLA's expand-conv+depthwise fusion speed up MBConv?

Trace evidence (scripts/profile_trace_cropmodel.py on EffNetV2-L@384 b128):
XLA fuses the 1x1 EXPAND conv (44 GFLOP of MXU work at stage-5 shape) into
the depthwise-conv kernel (emitter EmitDepthwiseAllBatchInLanes), and the
combined op runs at 18% MFU / 21% HBM — neither roofline. The early
FusedMBConv stages, where the convs emit as ordinary MXU fusions, run at
~85% MFU. This script measures one MBConv inner chain (expand 1x1 +
BN/silu + dw3x3 + BN/silu + SE-mean + project 1x1) at the stage-4..7
shapes of L@384 with `jax.lax.optimization_barrier` inserted at candidate
fusion boundaries, on-device scan timing (CLAUDE.md rule 3).

  python scripts/probe_mbconv_barrier.py [--stage 5] [--iters 30]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# L@384 MBConv stage shapes: (H, W, C_in, expand)
STAGES = {
    4: (24, 24, 96, 4),    # blocks 19-28 input 96->192; first block C_in=96
    5: (24, 24, 224, 6),   # blocks 29-47
    6: (12, 12, 384, 6),   # blocks 48-72
    7: (12, 12, 640, 6),   # blocks 73-79
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--stage', type=int, default=5)
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--iters', type=int, default=30)
    p.add_argument('--platform', default='')
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import threading
    done = threading.Event()

    def watchdog():
        if not done.wait(int(os.environ.get('PROBE_INIT_TIMEOUT', '300'))):
            print('backend init timed out', file=sys.stderr)
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    print(jax.devices(), flush=True)
    done.set()

    import jax.numpy as jnp
    import numpy as np

    h, w, cin, expand = STAGES[args.stage]
    n = args.batch
    cexp = cin * expand
    cse = max(1, cin // 4)
    rng = np.random.default_rng(0)

    def mk(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape) * 0.05, dtype)

    weights = dict(
        w_exp=mk(1, 1, cin, cexp), dwk=mk(3, 3, 1, cexp),
        s0=mk(cexp, dtype=jnp.float32), b0=mk(cexp, dtype=jnp.float32),
        s1=mk(cexp, dtype=jnp.float32), b1=mk(cexp, dtype=jnp.float32),
        w_se1=mk(1, 1, cexp, cse), b_se1=mk(cse, dtype=jnp.float32),
        w_se2=mk(1, 1, cse, cexp), b_se2=mk(cexp, dtype=jnp.float32),
        w_proj=mk(1, 1, cexp, cin), s2=mk(cin, dtype=jnp.float32),
        b2=mk(cin, dtype=jnp.float32))
    x0 = mk(n, h, w, cin)

    def conv(x, k, groups=1, pad='SAME'):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, feature_group_count=groups,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def block(v, x, barrier_after_expand, barrier_after_dw):
        u = conv(x, v['w_exp'])
        u = (jax.nn.silu(u.astype(jnp.float32) * v['s0'] + v['b0'])
             .astype(jnp.bfloat16))
        if barrier_after_expand:
            u = jax.lax.optimization_barrier(u)
        d = conv(u, v['dwk'], groups=cexp)
        d = (jax.nn.silu(d.astype(jnp.float32) * v['s1'] + v['b1'])
             .astype(jnp.bfloat16))
        if barrier_after_dw:
            d = jax.lax.optimization_barrier(d)
        m = jnp.mean(d.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = jax.nn.silu(conv(m.astype(jnp.bfloat16), v['w_se1'])
                        .astype(jnp.float32) + v['b_se1'])
        s = jax.nn.sigmoid(conv(s.astype(jnp.bfloat16), v['w_se2'])
                           .astype(jnp.float32) + v['b_se2'])
        d = d * s.astype(jnp.bfloat16)
        y = conv(d, v['w_proj'])
        y = (y.astype(jnp.float32) * v['s2'] + v['b2']).astype(jnp.bfloat16)
        return x + y

    variants = {
        'fused_default': (False, False),
        'barrier_expand': (True, False),
        'barrier_dw': (False, True),
        'barrier_both': (True, True),
    }

    results = {}
    for name, (be, bd) in variants.items():
        fn = functools.partial(block, barrier_after_expand=be,
                               barrier_after_dw=bd)

        @jax.jit
        def run(v, x, xs):
            def body(carry, _):
                # Non-foldable chain: output feeds the next iteration.
                return fn(v, carry), ()
            y, _ = jax.lax.scan(body, x, xs)
            # Scalar readback: returning y itself would drag the full
            # ~28 MB activation over the tunnel each call and swamp the
            # timing (the first run of this probe measured negative
            # per-block deltas for exactly that reason).
            return jnp.sum(y.astype(jnp.float32))

        def t(k):
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(weights, x0, jnp.arange(int(k))))
                best = min(best, time.perf_counter() - t0)
            return best

        t(1); t(args.iters)  # warm/compile
        t1, tn = t(1), t(args.iters)
        ms = (tn - t1) / (args.iters - 1) * 1e3
        # FLOPs: expand + dw + SE convs + project.
        fl = 2 * n * h * w * (cin * cexp + 9 * cexp + cexp * cin) \
            + 2 * n * (cexp * cse + cse * cexp)
        results[name] = (ms, fl / (ms / 1e3) / 1e12)
        print(f'stage{args.stage} {name:16s} {ms:7.3f} ms/block '
              f'{results[name][1]:6.1f} TFLOP/s', flush=True)


if __name__ == '__main__':
    main()
