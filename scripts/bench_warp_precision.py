"""Microbenchmark: Pallas warp kernel MXU precision variants on the TPU.

Decides the default `warp_precision` (ModelConfig): HIGHEST (6-pass f32)
vs HIGH (3-pass bf16x3, ~f32 accuracy) vs DEFAULT (1-pass bf16). Reports
ms/crop and max |err| vs the XLA gather oracle (float32 exact path).

Timing follows CLAUDE.md rule 3: on-device lax.scan with a non-foldable
feedback dependency, host readback, (t_N - t_1) differencing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._benchlib import feedback, make_crop_homographies, timed_scan

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.ops import warp as warp_ops
from metrabs_tpu.ops import warp_pallas

N_IMG = 8
H, W = 1080, 1920
N_CROPS = int(os.environ.get('BWP_CROPS', '64'))
OUT = 256
ITERS = 8


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(N_IMG, H, W, 3)), jnp.float32)
    image_ids = jnp.asarray(rng.integers(0, N_IMG, size=N_CROPS), jnp.int32)
    k_old, invproj, crop_scales = make_crop_homographies(
        rng, N_CROPS, W, H, OUT)
    dist = jnp.zeros((N_CROPS, 12), jnp.float32)

    @jax.jit
    def oracle(images):
        return warp_ops.warp_images_with_pyramid(
            images, k_old, invproj, dist, crop_scales, image_ids, (OUT, OUT))
    ref = np.asarray(oracle(images))

    # Canvas build alone (built once per frame batch in the estimator and
    # amortized over every chunk's warps).
    def build(images):
        canvas, _, _ = warp_pallas.build_pyramid_canvas(images)
        return feedback(images, canvas[:, :1, :1, :1]), canvas[0, 0, 0, 0]
    t = timed_scan(build, images)
    print(f'canvas build: {t*1e3:8.2f} ms/batch of {N_IMG} frames')

    canvas_np = jax.jit(
        lambda im: warp_pallas.build_pyramid_canvas(im)[0])(images)
    # Static level tables from a 1-frame build (same H, W).
    _, rows, dims = warp_pallas.build_pyramid_canvas(
        jnp.zeros((1, H, W, 3), jnp.float32))

    names = os.environ.get('BWP_PREC', 'HIGHEST,DEFAULT').split(',')
    for name in names:
        prec = getattr(jax.lax.Precision, name, name)

        def tiled(canvas, prec=prec):
            return warp_pallas.warp_images_with_pyramid_tiled(
                None, k_old, invproj, dist, crop_scales, image_ids,
                (OUT, OUT), precision=prec,
                pyramid_canvas=(canvas, rows, dims))

        def run(canvas, prec=prec):
            out = tiled(canvas, prec)
            return feedback(canvas, out), out[0, 0, 0, 0]

        out = np.asarray(jax.jit(tiled)(canvas_np))
        t = timed_scan(run, canvas_np)
        err = np.max(np.abs(out - ref))
        print(f'{name:8s}: {t*1e3:8.2f} ms/batch ({t*1e3/N_CROPS:6.3f} ms/crop'
              f' kernel-only)  max|err| vs oracle {err:.3e}')


if __name__ == '__main__':
    main()
