"""Benchmark: crops/sec/chip of the flagship crop model on real TPU hardware.

The north-star metric (BASELINE.json): single-chip throughput of the
EfficientNetV2-L 384px crop model (the metrabs_eff2l_y4 configuration's
compute core — backbone + heads + soft-argmax + absolute reconstruction).
Prints exactly one JSON line. The reference publishes no throughput numbers
(its FPS columns are empty, BASELINE.md), so vs_baseline is reported as 1.0.

Env overrides: BENCH_BACKBONE (default efficientnetv2-l), BENCH_RES (384),
BENCH_BATCH (32), BENCH_ITERS (20).
"""

import json
import os
import sys
import time


def main():
    import jax
    # Persistent XLA compile cache: EffNetV2-L@384 cold-compiles in tens of
    # minutes over the axon tunnel; cached runs start in seconds.
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs

    backbone_name = os.environ.get('BENCH_BACKBONE', 'efficientnetv2-l')
    res = int(os.environ.get('BENCH_RES', '384'))
    batch = int(os.environ.get('BENCH_BATCH', '32'))
    iters = int(os.environ.get('BENCH_ITERS', '20'))

    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=backbone_name)
    model = Metrabs(cfg=cfg, backbone=build_backbone(backbone_name))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None])

    # Methodology notes for the networked (axon) TPU:
    #  - params must be jit ARGUMENTS: closures embed weights as HLO constants
    #    and overflow the tunnel's remote-compile request (HTTP 413);
    #  - host-side timing loops are unreliable over the tunnel (async dispatch
    #    measures RPC rate, not compute), so the iteration loop runs ON DEVICE
    #    as a lax.scan chained through a non-foldable data dependency, and the
    #    result is read back to the host. Throughput = (t_N - t_1) difference
    #    to cancel the round-trip/readback constant.
    def make_runner(n_iters):
        @jax.jit
        def run(p, image, intrinsics):
            def body(img, _):
                poses = model.apply(p, img, intrinsics, train=False)
                feedback = (jnp.tanh(jnp.sum(poses)) * 1e-12).astype(img.dtype)
                return img + feedback, poses[0, 0, 0]
            _, samples = jax.lax.scan(body, image, None, length=n_iters)
            return samples
        return run

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(size=(batch, res, res, 3)), jnp.bfloat16)
    K = jnp.tile(jnp.asarray(np.array(
        [[400.0, 0, res / 2], [0, 400.0, res / 2], [0, 0, 1]], np.float32))[None],
        (batch, 1, 1))

    run_n = make_runner(iters)
    run_1 = make_runner(1)

    # Warmup/compile both programs.
    np.asarray(run_1(params, image, K))
    np.asarray(run_n(params, image, K))

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn(params, image, K))  # host read: cannot be faked
        return time.perf_counter() - t0

    t_1 = min(timed(run_1) for _ in range(3))
    t_n = min(timed(run_n) for _ in range(3))
    crops_per_sec = batch * (iters - 1) / max(t_n - t_1, 1e-9)
    print(json.dumps({
        'metric': f'crops/sec/chip ({backbone_name} {res}px bf16 crop-model forward)',
        'value': round(crops_per_sec, 2),
        'unit': 'crops/s',
        'vs_baseline': 1.0,
    }))


if __name__ == '__main__':
    main()
