"""Inference-formulation probes for the headline crop-model forward.

Measures, on the real chip with the bench.py on-device timed-scan
methodology (CLAUDE.md rules: params as jit args, device-chained scan,
min-of-3 host readbacks):

  scan        baseline: nn.scan-stacked repeated blocks (bench.py path)
  unscan      scan_blocks=False — per-block unrolled HLO. The scan layout
              was chosen for COMPILE speed (79 L-blocks); this measures
              whether it costs RUNTIME (dynamic-sliced stacked weights,
              no cross-block specialization).
  bn_id       GhostBatchNorm inference path replaced by identity — an
              UPPER BOUND on what folding BN affine transforms into conv
              kernels could save (numerically wrong on purpose; perf only).
  act_id      silu replaced by identity — upper bound on activation cost.
  batch sweep b128 (baseline) / b192 / b256 — round 2 declared saturation
              at ~128 without publishing larger points.

Usage: python scripts/probe_infer_formulations.py [--backbone B] [--res R]
Writes PROBE_INFER_r04.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp_cache')


def timed_scan_crops_per_sec(model, params, batch, res, iters=24):
    import jax
    import jax.numpy as jnp
    import numpy as np

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
        [[400.0, 0, res / 2], [0, 400.0, res / 2], [0, 0, 1]],
        np.float32))[None], (batch, 1, 1))

    run_n, run_1 = make_runner(iters), make_runner(1)
    np.asarray(run_1(params, image, K))
    np.asarray(run_n(params, image, K))

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn(params, image, K))
        return time.perf_counter() - t0

    t_1 = min(timed(run_1) for _ in range(3))
    t_n = min(timed(run_n) for _ in range(3))
    return batch * (iters - 1) / max(t_n - t_1, 1e-9)


def build_model(backbone_name, res, scan_blocks=True):
    import jax
    import jax.numpy as jnp
    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs

    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=backbone_name)
    model = Metrabs(cfg=cfg, backbone=build_backbone(
        backbone_name, scan_blocks=scan_blocks))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None])
    return model, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--backbone', default='efficientnetv2-l')
    ap.add_argument('--res', type=int, default=384)
    ap.add_argument('--skip', default='', help='comma list of probe names')
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(',')))

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from metrabs_tpu.models.backbones import common

    results = {}

    def record(name, fn):
        if name in skip:
            return
        t0 = time.perf_counter()
        try:
            cps = fn()
            results[name] = {'crops_per_sec': round(cps, 2),
                             'wall_s': round(time.perf_counter() - t0, 1)}
        except Exception as e:  # noqa: BLE001 - probe must report, not die
            results[name] = {'error': repr(e)}
        print(f'{name}: {results[name]}', flush=True)

    # --- baseline + batch sweep (scan layout) ---
    model, params = build_model(args.backbone, args.res, scan_blocks=True)
    for batch in (128, 192, 256):
        record(f'scan_b{batch}', lambda b=batch: timed_scan_crops_per_sec(
            model, params, b, args.res))

    # --- unscanned layout ---
    def unscan():
        m, p = build_model(args.backbone, args.res, scan_blocks=False)
        return timed_scan_crops_per_sec(m, p, 128, args.res)
    record('unscan_b128', unscan)

    # --- BN-identity upper bound (perf only; numerically wrong) ---
    class _IdNorm(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, fold=False):
            # Declare the same variable tree shape is NOT needed for a perf
            # probe; init generates a fresh tree for this patched model.
            if fold:
                c = x.shape[-1]
                one = jnp.ones((c,), x.dtype)
                return one, jnp.zeros((c,), x.dtype)
            return x

    orig_bn = common.batch_norm
    def bn_id():
        common.batch_norm = (
            lambda momentum, epsilon, dtype, name, ghost_splits=1:
            _IdNorm(name=name))
        try:
            m, p = build_model(args.backbone, args.res, scan_blocks=True)
            return timed_scan_crops_per_sec(m, p, 128, args.res)
        finally:
            common.batch_norm = orig_bn
    record('bn_identity_b128', bn_id)

    # --- activation-identity upper bound ---
    orig_silu = nn.silu
    def act_id():
        nn.silu = lambda x: x
        try:
            m, p = build_model(args.backbone, args.res, scan_blocks=True)
            return timed_scan_crops_per_sec(m, p, 128, args.res)
        finally:
            nn.silu = orig_silu
    record('silu_identity_b128', act_id)

    out = {'backbone': args.backbone, 'res': args.res,
           'loadavg_1m': os.getloadavg()[0], 'results': results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'PROBE_INFER_r04.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
