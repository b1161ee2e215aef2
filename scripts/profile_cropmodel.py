"""Ablation profile of the EffNetV2-L@384 crop model on the real chip.

Breaks the forward pass into backbone / heads+decode, and compares MBConv
stages' cost via input-resolution scaling, to attribute the gap between
measured throughput and the bf16 MXU roofline (VERDICT round-1 weak #2).
"""

import sys, time
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.models.backbones.builder import build_backbone
from metrabs_tpu.models.metrabs import Metrabs

BATCH = 128
RES = 384
ITERS = 10


def timed_scan(apply_fn, params, image, extra=None, iters=ITERS):
    def make(n):
        @jax.jit
        def run(p, img):
            def body(im, _):
                out = apply_fn(p, im)
                fb = (jnp.tanh(jnp.sum(out[..., :1].astype(jnp.float32)))
                      * 1e-12).astype(im.dtype)
                return im + fb, out.reshape(-1)[0]
            _, s = jax.lax.scan(body, img, None, length=n)
            return s
        return run
    rn, r1 = make(iters), make(1)
    np.asarray(r1(params, image)); np.asarray(rn(params, image))
    def t(f):
        t0 = time.perf_counter(); np.asarray(f(params, image))
        return time.perf_counter() - t0
    t1 = min(t(r1) for _ in range(3))
    tn = min(t(rn) for _ in range(3))
    return (tn - t1) / (iters - 1)


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    cfg = ModelConfig(proc_side=RES, depth=8, n_joints=17, dtype='bfloat16',
                      backbone='efficientnetv2-l')
    backbone = build_backbone('efficientnetv2-l')
    model = Metrabs(cfg=cfg, backbone=backbone)
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, RES, RES, 3), jnp.bfloat16), jnp.eye(3)[None])
    image = jnp.asarray(rng.uniform(size=(BATCH, RES, RES, 3)), jnp.bfloat16)
    K = jnp.tile(jnp.asarray(np.array(
        [[400.0, 0, RES / 2], [0, 400.0, RES / 2], [0, 0, 1]],
        np.float32))[None], (BATCH, 1, 1))

    t_full = timed_scan(
        lambda p, im: model.apply(p, im, K, train=False), params, image)
    print(f'full model : {t_full*1e3:8.2f} ms/batch '
          f'({BATCH/t_full:7.1f} crops/s)')

    t_bb = timed_scan(
        lambda p, im: model.apply(
            p, im, train=False, method=model.backbone_and_head)[0],
        params, image)
    print(f'bb+head conv: {t_bb*1e3:8.2f} ms/batch '
          f'({BATCH/t_bb:7.1f} crops/s)  -> decode/reconstruct = '
          f'{(t_full-t_bb)*1e3:.2f} ms')

    # Backbone alone (no 1x1 head conv).
    bb_params = {'params': params['params']['backbone'],
                 'batch_stats': params['batch_stats']['backbone']}

    t_bonly = timed_scan(
        lambda p, im: backbone.apply(p, im, train=False), bb_params, image)
    print(f'backbone    : {t_bonly*1e3:8.2f} ms/batch '
          f'({BATCH/t_bonly:7.1f} crops/s)')

    # Resolution scaling: FLOPs scale ~res^2; if time scales slower, the
    # model is latency/VPU-bound in late (small-spatial) stages.
    for res2 in (256, 192):
        im2 = jnp.asarray(
            rng.uniform(size=(BATCH, res2, res2, 3)), jnp.bfloat16)
        t2 = timed_scan(
            lambda p, im: backbone.apply(p, im, train=False), bb_params, im2)
        ratio = t_bonly / t2
        flops_ratio = (RES / res2) ** 2
        print(f'backbone@{res2}: {t2*1e3:8.2f} ms/batch  speedup {ratio:.2f}x '
              f'(flops ratio {flops_ratio:.2f}x)')

    # Batch scaling at fixed res: dispatch/latency share.
    for b2 in (32, 64):
        im2 = jnp.asarray(rng.uniform(size=(b2, RES, RES, 3)), jnp.bfloat16)
        t2 = timed_scan(
            lambda p, im: backbone.apply(p, im, train=False), bb_params, im2)
        print(f'backbone b={b2:3d}: {t2*1e3:8.2f} ms/batch '
              f'({b2/t2:7.1f} crops/s)')


if __name__ == '__main__':
    main()
