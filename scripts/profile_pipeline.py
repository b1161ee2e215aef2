"""Stage-level profiling of the inference pipeline on the real TPU.

Times (a) full-image gamma decode + pyramid build, (b) warp coords + gather,
(c) crop-model forward, (d) the fused end-to-end pipeline — to direct kernel
optimization at the true bottleneck.

  python scripts/profile_pipeline.py [--backbone efficientnetv2-s]
      [--n-boxes 10] [--num-aug 5] [--height 1080] [--width 1920]
"""

import argparse
import sys
import time

sys.path.insert(0, '/root/repo')


def bench(fn, *args, iters=10):
    """Times with a host read per call (reliable over the tunnel); reports
    the min to strip RTT jitter. Absolute values include one round trip —
    use for relative stage attribution."""
    import jax
    import numpy as np
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x.ravel()[0]) if hasattr(x, 'ravel') else x, out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--backbone', default='efficientnetv2-s')
    parser.add_argument('--n-boxes', type=int, default=10)
    parser.add_argument('--num-aug', type=int, default=5)
    parser.add_argument('--height', type=int, default=1080)
    parser.add_argument('--width', type=int, default=1920)
    parser.add_argument('--res', type=int, default=256)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.ops import warp as warp_ops
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    from metrabs_tpu.pipeline.skeletons import H36M_17

    rng = np.random.default_rng(0)
    H, W, res = args.height, args.width, args.res
    n_crops = args.n_boxes * args.num_aug
    image_u8 = jnp.asarray(
        rng.integers(0, 255, size=(1, H, W, 3), dtype=np.uint8))

    # (a) gamma decode + pyramid
    @jax.jit
    def decode_and_pyramid(img):
        lin = (img.astype(jnp.float32) / 255.0) ** 2.2
        flat, info, _ = warp_ops.build_flat_pyramid(lin, 3)
        return flat

    t = bench(decode_and_pyramid, image_u8)
    print(f'decode+pyramid ({H}x{W}): {t * 1000:.2f} ms')

    # (b) warp: coords + gather for n_crops crops
    K = np.array([[1500.0, 0, W / 2], [0, 1500.0, H / 2], [0, 0, 1]], np.float32)
    newK = np.array([[250.0, 0, res / 2], [0, 250.0, res / 2], [0, 0, 1]],
                    np.float32)
    invproj = np.linalg.inv(newK)
    lin_img = (np.asarray(image_u8, np.float32) / 255.0) ** 2.2

    @jax.jit
    def warp_only(img_lin):
        return warp_ops.warp_images_with_pyramid(
            img_lin,
            jnp.tile(jnp.asarray(K)[None], (n_crops, 1, 1)),
            jnp.tile(jnp.asarray(invproj)[None], (n_crops, 1, 1)),
            jnp.zeros((n_crops, 12), jnp.float32),
            jnp.full((n_crops,), 0.9, jnp.float32),
            jnp.zeros((n_crops,), jnp.int32), (res, res))

    t = bench(warp_only, jnp.asarray(lin_img))
    print(f'warp pyramid gather ({n_crops} crops {res}px): {t * 1000:.2f} ms')

    # (c) backbone forward
    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=args.backbone)
    model = Metrabs(cfg=cfg, backbone=build_backbone(args.backbone))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None])

    @jax.jit
    def forward(crops, Ks):
        return model.apply(params, crops, Ks, train=False)

    crops = jnp.asarray(rng.uniform(size=(n_crops, res, res, 3)), jnp.bfloat16)
    Ks = jnp.tile(jnp.asarray(newK)[None], (n_crops, 1, 1))
    t = bench(forward, crops, Ks)
    print(f'crop model fwd ({args.backbone}, {n_crops} crops): {t * 1000:.2f} ms')

    # (d) full pipeline
    def crop_fn(c, k, v):
        return model.apply(params, c, k, train=False, sample_valid=v)

    est = PoseEstimator(crop_fn, H36M_17, cfg)
    boxes = np.stack([
        np.array([rng.uniform(0, W - 400), rng.uniform(0, H - 600), 350, 580],
                 np.float32) for _ in range(args.n_boxes)])[None]
    images = np.asarray(image_u8)

    def full():
        return est.estimate_poses_batched(
            images, boxes, num_aug=args.num_aug,
            internal_batch_size=max(64, n_crops))['poses3d']

    t = bench(full, iters=5)
    print(f'full pipeline ({args.n_boxes} boxes x {args.num_aug} aug): '
          f'{t * 1000:.2f} ms -> {n_crops / t:.1f} crops/s e2e')


if __name__ == '__main__':
    main()
