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

    @jax.jit
    def predict(image, intrinsics):
        return model.apply(params, image, intrinsics, train=False)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(size=(batch, res, res, 3)), jnp.bfloat16)
    K = jnp.tile(jnp.asarray(np.array(
        [[400.0, 0, res / 2], [0, 400.0, res / 2], [0, 0, 1]], np.float32))[None],
        (batch, 1, 1))

    # Warmup (compile + one steady-state run).
    jax.block_until_ready(predict(image, K))
    jax.block_until_ready(predict(image, K))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(image, K)
    jax.block_until_ready(out)
    t1 = time.perf_counter()

    crops_per_sec = batch * iters / (t1 - t0)
    print(json.dumps({
        'metric': f'crops/sec/chip ({backbone_name} {res}px bf16 crop-model forward)',
        'value': round(crops_per_sec, 2),
        'unit': 'crops/s',
        'vs_baseline': 1.0,
    }))


if __name__ == '__main__':
    main()
