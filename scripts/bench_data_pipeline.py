"""Data-pipeline saturation check (ROADMAP #3): can the host loader keep a
TPU train step fed?

Runs the REAL per-example path — JPEG decode + load_and_transform3d
(camera turn-towards, undistort, zoom warp, augmentations) — through
ParallelBatchLoader and reports batches/s vs the measured device step rate
(scripts/bench_train_step.py). CPU-only; run anywhere.

  python scripts/bench_data_pipeline.py [--batch 32] [--workers 8]
      [--res 256] [--step-ms 83]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--workers', type=int, default=os.cpu_count() or 8)
    parser.add_argument('--res', type=int, default=256)
    parser.add_argument('--n-batches', type=int, default=30)
    parser.add_argument('--step-ms', type=float, default=83.0,
                        help='measured device ms/step to compare against')
    args = parser.parse_args()

    import cv2
    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.data.camera import Camera
    from metrabs_tpu.data.loading import (
        Example3D, LoadConfig, load_and_transform3d)
    from metrabs_tpu.data.pipeline import ParallelBatchLoader
    from metrabs_tpu.pipeline.skeletons import H36M_17

    cfg = ModelConfig(proc_side=args.res, stride_train=32, stride_test=32,
                      n_joints=17)
    lcfg = LoadConfig()

    # Realistic source: 640x480 JPEG decoded per example (the dominant CPU
    # cost of real training); geometry from a plausible camera.
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    ok, enc = cv2.imencode('.jpg', frame, [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    enc = np.asarray(enc)

    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    cam = Camera(intrinsic_matrix=K,
                 extrinsic_matrix=np.eye(4, dtype=np.float32),
                 world_up=(0, -1, 0))
    pose = (rng.normal(size=(17, 3)) * 250 + [0, 0, 4000]).astype(np.float32)
    im_pts = cam.world_to_image(pose)
    x0, y0 = im_pts.min(0) - 20
    x1, y1 = im_pts.max(0) + 20
    bbox = np.array([x0, y0, x1 - x0, y1 - y0], np.float32)

    def load_fn(example, ex_rng):
        image = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                             cv2.COLOR_BGR2RGB)
        ex = Example3D(image_path='synthetic/h36m_bench.jpg', camera=cam,
                       bbox=bbox, world_coords=pose, image=image)
        return load_and_transform3d(ex, H36M_17, True, ex_rng, cfg, lcfg)

    def example_stream():
        while True:
            yield None

    loader = ParallelBatchLoader(
        load_fn, example_stream(), args.batch, n_workers=args.workers,
        prefetch_batches=4)
    next(loader)  # warm the pool
    t0 = time.perf_counter()
    for _ in range(args.n_batches):
        b = next(loader)
    dt = time.perf_counter() - t0
    loader.close()
    per_batch_ms = dt / args.n_batches * 1e3
    ex_per_s = args.batch * args.n_batches / dt
    print(f'loader: {per_batch_ms:.1f} ms/batch of {args.batch} '
          f'({ex_per_s:.0f} examples/s, {args.workers} workers)')
    ratio = args.step_ms / per_batch_ms
    verdict = 'SATURATES' if ratio >= 1.0 else 'STARVES'
    print(f'device step {args.step_ms:.0f} ms -> loader margin {ratio:.2f}x '
          f'({verdict} the device)')
    # Sizing guidance: the dual-stream step consumes 2*batch examples/step.
    per_ex_ms = per_batch_ms * args.workers / args.batch
    need = 2 * args.batch * per_ex_ms / args.step_ms
    print(f'per-example CPU cost ~{per_ex_ms:.1f} ms -> a training host '
          f'needs ~{need:.0f} busy cores to saturate one chip at '
          f'batch {args.batch}+{args.batch}')


if __name__ == '__main__':
    main()
