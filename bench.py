"""Benchmark: crops/sec/chip of the flagship crop model on real TPU hardware.

The north-star metric (BASELINE.json): single-chip throughput of the
EfficientNetV2-L 384px crop model (the metrabs_eff2l_y4 configuration's
compute core — backbone + heads + soft-argmax + absolute reconstruction).
Prints exactly one JSON line. The reference publishes no throughput numbers
(its FPS columns are empty, BASELINE.md), so vs_baseline compares against
this repo's own round-1 recording (BENCH_r01: 1040.05 crops/s).

The JSON line also carries the fused system number — detect_poses_batched
(8x1080p frames, YOLOv4-416 + EffNetV2-S@256, 2 TTA, ONE jit program) in
frames/s with its round-1 comparison (PARITY round 1: 14.8 fps) — so driver
records track the pipeline, not just the backbone. Set BENCH_SKIP_FUSED=1
to skip it.

Env overrides: BENCH_BACKBONE (default efficientnetv2-l), BENCH_RES (384),
BENCH_BATCH (128; throughput saturates ~batch 128, +25% over 32 —
scripts/profile_cropmodel.py), BENCH_ITERS (20).
"""

import json
import os
import sys
import time

ROUND1_CROPS_PER_SEC = 1040.05   # BENCH_r01.json
ROUND1_FUSED_FPS = 14.8          # PARITY.md round-1 fused recording


def bench_fused_pipeline():
    """Fused detect_poses_batched fps (the scripts/bench_fused.py config)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.detect.yolov4 import YOLOv4, PersonDetector
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    from metrabs_tpu.pipeline.skeletons import H36M_17

    rng = np.random.default_rng(0)
    frames = 8
    images = jnp.asarray(rng.integers(
        0, 255, size=(frames, 1080, 1920, 3), dtype=np.uint8))
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
    # Weights threaded as jit arguments via crop_model_state (CLAUDE.md
    # rule 1: a closure would embed them as HLO constants in every compiled
    # pipeline variant and bloat the remote-compile requests).
    est = PoseEstimator(
        lambda state, c, k, v: model.apply(
            state, c, k, train=False, sample_valid=v),
        H36M_17, cfg, crop_model_state=params,
        # approx_top_k is the serving-throughput mode benchmarked since r2
        # (the parity default is exact lax.top_k; keep bench comparable).
        detector=PersonDetector(det_model, det_vars, approx_top_k=True))

    def run(threshold):
        return est.detect_poses_batched(
            images, num_aug=2, max_detections=16,
            detector_threshold=threshold)['poses3d']

    # Two deterministic workload regimes (the threshold is a traced scalar,
    # so both share one compiled program):
    #  - dense: threshold 0 forces all 16 detection slots valid per frame
    #    (256 crops/batch — the worst case, and the regime round-1 always
    #    paid because padding was not skipped);
    #  - sparse: threshold 1.0 yields zero valid detections, exposing the
    #    detector + fixed pipeline overhead floor that real few-person
    #    scenes approach thanks to runtime chunk skipping.
    def timeit(threshold):
        jax.block_until_ready(run(threshold))
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = run(threshold)
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        return frames / min(times)

    dense_fps, sparse_fps = timeit(0.0), timeit(1.0)

    # Streamed-serving regime (BENCH_STREAM=K, 0 disables): one device
    # dispatch runs K frame-batches via detect_poses_stream, amortizing the
    # per-call dispatch overhead (~30-40 ms on the tunnel). Compiles an
    # extra large program when the persistent cache is cold.
    stream_k = int(os.environ.get('BENCH_STREAM', '8'))
    stream = None
    if stream_k:
        images_k = jnp.broadcast_to(images[None], (stream_k,) + images.shape)

        def run_stream(threshold):
            return est.detect_poses_stream(
                images_k, num_aug=2, max_detections=16,
                detector_threshold=threshold)['poses3d']

        def timeit_stream(threshold):
            jax.block_until_ready(run_stream(threshold))
            times = []
            for _ in range(8):
                t0 = time.perf_counter()
                np.asarray(run_stream(threshold))
                times.append(time.perf_counter() - t0)
            return frames * stream_k / min(times)

        stream = (timeit_stream(0.0), timeit_stream(1.0))

    return dense_fps, sparse_fps, stream


def main():
    import jax
    # Persistent XLA compile cache: EffNetV2-L@384 cold-compiles in tens of
    # minutes over the axon tunnel; cached runs start in seconds.
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    # Backend-init watchdog: when the axon tunnel is down, jax.devices()
    # blocks forever inside backend setup (observed 2026-08-17). A healthy
    # init takes seconds; bound it so a dead tunnel yields a fast, clearly
    # attributed nonzero exit instead of an indefinite hang. No JSON line is
    # printed on failure — a zero-valued record would read as a perf
    # regression rather than an infrastructure error.
    import threading
    init_done = threading.Event()

    def _watchdog():
        timeout = int(os.environ.get('BENCH_INIT_TIMEOUT', '300'))
        if not init_done.wait(timeout):
            print(f'bench: TPU backend init did not complete within '
                  f'{timeout}s (tunnel unavailable?); aborting',
                  file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    jax.devices()
    init_done.set()
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs

    backbone_name = os.environ.get('BENCH_BACKBONE', 'efficientnetv2-l')
    res = int(os.environ.get('BENCH_RES', '384'))
    batch = int(os.environ.get('BENCH_BATCH', '128'))
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

    fused = None
    if not os.environ.get('BENCH_SKIP_FUSED'):
        try:
            fused = bench_fused_pipeline()
        except Exception as e:  # keep the headline metric robust
            print(f'fused bench failed: {e!r}', file=sys.stderr)

    record = {
        'metric': f'crops/sec/chip ({backbone_name} {res}px bf16 crop-model forward)',
        'value': round(crops_per_sec, 2),
        'unit': 'crops/s',
        'vs_baseline': round(crops_per_sec / ROUND1_CROPS_PER_SEC, 4),
    }
    if fused is not None:
        dense_fps, sparse_fps, stream = fused
        record['fused_detect_fps'] = round(dense_fps, 2)
        record['fused_detect_vs_r01'] = round(dense_fps / ROUND1_FUSED_FPS, 4)
        record['fused_detect_fps_sparse'] = round(sparse_fps, 2)
        if stream is not None:
            record['stream_detect_fps'] = round(stream[0], 2)
            record['stream_detect_fps_sparse'] = round(stream[1], 2)
    print(json.dumps(record))


if __name__ == '__main__':
    main()
