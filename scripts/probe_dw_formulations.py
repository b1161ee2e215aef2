"""Probe: alternative depthwise-conv formulations for the MBConv chain.

Motivation (trace, scripts/profile_trace_cropmodel.py @ L@384 b128): the
depthwise-conv kernels (EmitDepthwiseAllBatchInLanes, with the 1x1 expand
conv fused in) are ~46% of the crop-model forward and run at 18% MFU /
21% HBM — they sit at the VPU roofline. The handwritten Pallas chain lost
3.4x to XLA's emitter (ops/mbconv_pallas.py MEASURED NEGATIVE RESULT), so
the remaining idea is a different XLA formulation: express the 3x3
depthwise conv as 9 shifted elementwise FMAs over the padded tensor,
which XLA fuses into one elementwise loop (bf16 or f32 accumulation),
instead of the dedicated depthwise emitter.

Measured chain = the real inference semantics of MBConv's inner segment
(expand 1x1 -> BN.silu [bf16, flax dtype semantics] -> dw 3x3 -> BN.silu
-> SE -> project 1x1 -> residual), at EffNetV2-L@384 stage shapes.

Timing: chained lax.scan over the block, T(n) measured for n and 2n
back-to-back in ONE process, ms = (T(2n) - T(n)) / n — the subtraction
cancels the ~30-40 ms tunnel dispatch and the chaining defeats CSE
(CLAUDE.md rules 3/9/10). min over --reps repetitions.

  python scripts/probe_dw_formulations.py [--stage 5] [--n 40] [--reps 4]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# L@384 MBConv stage shapes: (H, W, C_in, expand)
STAGES = {
    4: (24, 24, 96, 4),
    5: (24, 24, 224, 6),
    6: (12, 12, 384, 6),
    7: (12, 12, 640, 6),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--stage', type=int, default=5)
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--n', type=int, default=40)
    p.add_argument('--reps', type=int, default=4)
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
        s0=mk(cexp), b0=mk(cexp), s1=mk(cexp), b1=mk(cexp),
        w_se1=mk(1, 1, cexp, cse), b_se1=mk(cse),
        w_se2=mk(1, 1, cse, cexp), b_se2=mk(cexp),
        w_proj=mk(1, 1, cexp, cin), s2=mk(cin), b2=mk(cin))
    x0 = mk(n, h, w, cin)

    def conv(x, k, groups=1):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME', feature_group_count=groups,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def dw_conv(u, dwk):
        return conv(u, dwk, groups=cexp)

    def dw_shift9(u, dwk, acc_dtype):
        up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((n, h, w, cexp), acc_dtype)
        for dy in range(3):
            for dx in range(3):
                tap = up[:, dy:dy + h, dx:dx + w, :].astype(acc_dtype)
                out = out + tap * dwk[dy, dx, 0].astype(acc_dtype)
        return out.astype(jnp.bfloat16)

    def block(v, x, dw_fn, barrier_after_expand=False):
        # bf16 compute throughout = flax dtype=bfloat16 inference semantics.
        u = conv(x, v['w_exp'])
        u = jax.nn.silu(u * v['s0'] + v['b0'])
        if barrier_after_expand:
            # Keeps XLA from fusing the expand conv into the depthwise
            # emitter (EmitDepthwiseAllBatchInLanes) — the f32-elementwise
            # probe (probe_mbconv_barrier.py) measured this 20% faster.
            u = jax.lax.optimization_barrier(u)
        d = dw_fn(u, v['dwk'])
        d = jax.nn.silu(d * v['s1'] + v['b1'])
        m = jnp.mean(d, axis=(1, 2), keepdims=True)
        s = jax.nn.silu(conv(m, v['w_se1']) + v['b_se1'])
        s = jax.nn.sigmoid(conv(s, v['w_se2']) + v['b_se2'])
        d = d * s
        y = conv(d, v['w_proj'])
        y = y * v['s2'] + v['b2']
        return x + y

    variants = {
        'dw_emitter': (dw_conv, False),
        'dw_emitter_barrier': (dw_conv, True),
        'shift9_bf16': (functools.partial(dw_shift9, acc_dtype=jnp.bfloat16),
                        False),
        'shift9_f32': (functools.partial(dw_shift9, acc_dtype=jnp.float32),
                       False),
    }

    for name, (dw_fn, barrier) in variants.items():
        fn = functools.partial(block, dw_fn=dw_fn,
                               barrier_after_expand=barrier)

        @jax.jit
        def run(v, x, xs):
            def body(carry, _):
                return fn(v, carry), ()
            y, _ = jax.lax.scan(body, x, xs)
            # Scalar readback: returning y itself would drag the full
            # ~200 MB activation over the tunnel and swamp the timing.
            return jnp.sum(y.astype(jnp.float32))

        def t(k):
            t0 = time.perf_counter()
            np.asarray(run(weights, x0, jnp.arange(int(k))))
            return time.perf_counter() - t0

        t(args.n), t(2 * args.n)  # compile both shapes
        best = float('inf')
        for _ in range(args.reps):
            t1 = t(args.n)
            t2 = t(2 * args.n)
            best = min(best, (t2 - t1) / args.n)
        ms = best * 1e3
        fl = 2 * n * h * w * (cin * cexp + 9 * cexp + cexp * cin) \
            + 4 * n * cexp * cse
        print(f'stage{args.stage} {name:14s} {ms:7.3f} ms/block '
              f'{fl / (ms / 1e3) / 1e12:6.1f} TFLOP/s', flush=True)


if __name__ == '__main__':
    main()
