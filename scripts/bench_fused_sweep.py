"""Sweep of fused detect_poses_batched configs on the real chip.

Levers: internal_batch_size (chunking granularity / lax.cond count),
warp_precision ('high' bf16x3 vs 'bf16'), detector dtype (f32 vs bf16).
Reports dense (threshold 0 -> all 16 slots) and sparse (threshold 1) fps on
the bench.py regime (8x1080p, YOLOv4-416 + EffNetV2-S@256, 2 TTA).

  python scripts/bench_fused_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.detect.yolov4 import YOLOv4, PersonDetector
from metrabs_tpu.models.backbones.builder import build_backbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import H36M_17

FRAMES = 8


def build(warp_precision, det_dtype):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 255, size=(FRAMES, 1080, 1920, 3), dtype=np.uint8))
    cfg = ModelConfig(proc_side=256, depth=8, n_joints=17, dtype='bfloat16',
                      backbone='efficientnetv2-s',
                      warp_precision=warp_precision)
    model = Metrabs(cfg=cfg, backbone=build_backbone('efficientnetv2-s'))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, 256, 256, 3), jnp.bfloat16), jnp.eye(3)[None])
    det_model = YOLOv4(num_classes=80, dtype=det_dtype)
    det_vars = jax.jit(lambda: det_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 416, 416, 3), jnp.float32),
        train=False))()
    est = PoseEstimator(
        lambda c, k, v: model.apply(params, c, k, train=False, sample_valid=v),
        H36M_17, cfg, detector=PersonDetector(det_model, det_vars))
    return est, images


def timeit(est, images, ibs, threshold):
    def run():
        return est.detect_poses_batched(
            images, num_aug=2, max_detections=16, internal_batch_size=ibs,
            detector_threshold=threshold)['poses3d']
    jax.block_until_ready(run())
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(run())
        times.append(time.perf_counter() - t0)
    return FRAMES / min(times)


def main():
    print(jax.devices())
    cases = [
        ('high', jnp.float32, 64),
        ('high', jnp.float32, 256),
        ('bf16', jnp.float32, 64),
        ('bf16', jnp.float32, 256),
        ('bf16', jnp.bfloat16, 256),
        ('high', jnp.bfloat16, 64),
    ]
    built = {}
    for prec, det_dtype, ibs in cases:
        key = (prec, str(det_dtype.__name__))
        if key not in built:
            built[key] = build(prec, det_dtype)
        est, images = built[key]
        dense = timeit(est, images, ibs, 0.0)
        sparse = timeit(est, images, ibs, 1.0)
        print(f'warp={prec:5s} det={det_dtype.__name__:9s} ibs={ibs:4d}: '
              f'dense {dense:6.1f} fps   sparse {sparse:6.1f} fps', flush=True)


if __name__ == '__main__':
    main()
