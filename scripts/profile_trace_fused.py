"""Op-level time attribution of the fused detect_poses_batched program.

Same tracing approach as profile_trace_cropmodel.py, on the bench.py dense
regime (8x1080p frames, YOLOv4-416 + EffNetV2-S@256, 2 TTA, threshold 0 =
all 16 detection slots valid). Buckets: detector net, pyramid canvas build,
warp kernel, crop-model stages, filtering/etc.

  python scripts/profile_trace_fused.py
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._tracelib import exclusive_op_durations, load_latest_trace


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--outdir', default='/tmp/jax_trace_fused')
    parser.add_argument('--iters', type=int, default=3)
    parser.add_argument('--threshold', type=float, default=0.0)
    args = parser.parse_args()

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

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 255, size=(8, 1080, 1920, 3), dtype=np.uint8))
    cfg = ModelConfig(proc_side=256, depth=8, n_joints=17, dtype='bfloat16',
                      backbone='efficientnetv2-s')
    model = Metrabs(cfg=cfg, backbone=build_backbone('efficientnetv2-s'))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, 256, 256, 3), jnp.bfloat16), jnp.eye(3)[None])
    det_model = YOLOv4(num_classes=80, dtype=jnp.float32)
    det_vars = jax.jit(lambda: det_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 416, 416, 3), jnp.float32),
        train=False))()
    est = PoseEstimator(
        lambda c, k, v: model.apply(params, c, k, train=False, sample_valid=v),
        H36M_17, cfg, detector=PersonDetector(det_model, det_vars))

    def run():
        return est.detect_poses_batched(
            images, num_aug=2, max_detections=16,
            detector_threshold=args.threshold)['poses3d']

    np.asarray(run())  # compile
    with jax.profiler.trace(args.outdir):
        for _ in range(args.iters):
            np.asarray(run())

    # Exclusive durations via _tracelib (nested XLA spans double-count raw).
    events = load_latest_trace(args.outdir)
    if events is None:
        print('NO TRACE FILES')
        return

    totals = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for name, dur_us in exclusive_op_durations(events):
            dur = dur_us / 1e3
            n = name.lower()
            if 'custom-call' in n or 'pallas' in n or 'warp' in n:
                cat = 'pallas warp kernel'
            elif 'while' in n:
                cat = 'while (scan: backbone/detector stages)'
            elif 'conv' in n or 'dot' in n:
                cat = 'conv/dot (MXU)'
            elif 'fusion' in n:
                cat = 'fusion (elementwise)'
            elif 'copy' in n or 'transpose' in n or 'bitcast' in n:
                cat = 'layout/copy'
            elif 'sort' in n or 'reduce' in n or 'scatter' in n or 'gather' in n:
                cat = 'sort/reduce/scatter (NMS etc.)'
            elif 'dynamic' in n:
                cat = 'dynamic slice/update'
            else:
                cat = 'other'
            totals[cat] += dur
            by_name[name[:90]] += dur
            total += dur
    print(f'total device time: {total:.2f} ms over {args.iters} iters '
          f'({total / args.iters:.2f} ms/iter)')
    for cat, ms in totals.most_common():
        print(f'  {cat:40s} {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%')
    print('\ntop 25 ops:')
    for name, ms in by_name.most_common(25):
        print(f'  {ms / args.iters:9.2f} ms/iter  {name}')


if __name__ == '__main__':
    main()
