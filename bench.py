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

# v5e bf16 MXU peak per chip, for the MFU fields (PARITY.md "Crop-model MFU
# profile" uses the same roofline).
PEAK_BF16_TFLOPS = 197.0

# VERDICT r2 #4: the 22%-MFU "VPU-bound architecture" claim was measured on
# one backbone only. Track a cross-family table: ResNet-152 is nearly all
# dense convs (if it also lands ~22%, scheduling work reopens; if it lands
# high, the EffNetV2 VPU-ceiling analysis stands).
EXTRA_BACKBONES = (('resnet152', 384, 128), ('mobilenetv3-large', 256, 128))


def bench_crop_model(backbone_name, res, batch, iters):
    """Timed-scan crop-model throughput + MFU for one backbone config.

    Returns (crops_per_sec, mfu_info or None). Methodology notes for the
    networked (axon) TPU:
     - params must be jit ARGUMENTS: closures embed weights as HLO constants
       and overflow the tunnel's remote-compile request (HTTP 413);
     - host-side timing loops are unreliable over the tunnel (async dispatch
       measures RPC rate, not compute), so the iteration loop runs ON DEVICE
       as a lax.scan chained through a non-foldable data dependency, and the
       result is read back to the host. Throughput = (t_N - t_1) difference
       to cancel the round-trip/readback constant.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs

    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=backbone_name)
    # Unrolled block layout: the serving default since round 4 — ~11% faster
    # than the nn.scan-stacked layout at L@384 b128 (PROBE_INFER_r04.json:
    # 1306 -> 1455 crops/s; identical math, tests/test_scan_convert.py) at
    # the cost of a longer one-time compile. BENCH_SCAN_BLOCKS=1 restores
    # the scanned layout for apples-to-apples with BENCH_r01..r03.
    scan_blocks = os.environ.get('BENCH_SCAN_BLOCKS', '') == '1'
    # Folded-BN serving layout (io/bn_fold.py) = the load_pose_estimator
    # default since round 5: BN affines live in the conv weights and the BN
    # ops vanish (~8% of the L@384 forward was BN HBM traffic,
    # PROBE_INFER_r04 bn_identity). BENCH_BN_FOLD=0 restores unfolded.
    bn_fold = os.environ.get('BENCH_BN_FOLD', '1') == '1'
    model = Metrabs(cfg=cfg, backbone=build_backbone(
        backbone_name, scan_blocks=scan_blocks))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None])
    if bn_fold:
        from metrabs_tpu.io.bn_fold import bn_epsilon_for, fold_bn_variables
        # device_put the folded tree: fold_bn_variables works host-side, and
        # numpy params passed as jit arguments would be RE-UPLOADED over the
        # tunnel on every call (~seconds per dispatch — measured as a 60x
        # fused-fps collapse before this line existed).
        params = jax.device_put(fold_bn_variables(
            jax.tree_util.tree_map(np.asarray, params),
            epsilon=bn_epsilon_for(backbone_name)))
        model = Metrabs(cfg=cfg, backbone=build_backbone(
            backbone_name, scan_blocks=scan_blocks, bn_fold=True))

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

    # Achieved TFLOP/s + MFU from XLA's cost analysis of the one-batch
    # forward. Two subtleties: (a) cost_analysis counts a lax.scan body ONCE
    # (not x trip count), so the FLOPs must be measured on the UNSCANNED
    # block layout (same math; pinned equivalent by tests/test_scan_convert);
    # (b) lowered (pre-compile) analysis suffices and avoids a second large
    # remote compile — conv flops don't change under XLA optimization.
    mfu = None
    try:
        flops_model = Metrabs(cfg=cfg, backbone=build_backbone(
            backbone_name, scan_blocks=False))
        flops_params = jax.eval_shape(
            lambda: flops_model.init(
                {'params': jax.random.PRNGKey(0)},
                jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None]))
        # Lower for the CPU backend: flops are a property of the HLO, the
        # CPU lowering analyzes WITHOUT compiling, and the axon (remote TPU)
        # backend returns None from pre-compile cost_analysis.
        lowered = jax.jit(
            lambda p, im, k: flops_model.apply(p, im, k, train=False),
            backend='cpu',
        ).lower(flops_params,
                jax.ShapeDtypeStruct(image.shape, image.dtype),
                jax.ShapeDtypeStruct(K.shape, K.dtype))
        costs = lowered.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        flops_per_batch = float(costs['flops'])
        tflops = flops_per_batch * (crops_per_sec / batch) / 1e12
        mfu = {
            'gflops_per_crop': round(flops_per_batch / batch / 1e9, 2),
            'achieved_tflops': round(tflops, 2),
            'mfu_pct': round(100.0 * tflops / PEAK_BF16_TFLOPS, 2),
        }
    except Exception as e:  # cost_analysis availability varies by backend
        print(f'cost_analysis unavailable for {backbone_name}: {e!r}',
              file=sys.stderr)
    return crops_per_sec, mfu


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
    from metrabs_tpu.pipeline import bone_priors
    from metrabs_tpu.pipeline.skeletons import H36M_17

    rng = np.random.default_rng(0)
    frames = 8
    images = jnp.asarray(rng.integers(
        0, 255, size=(frames, 1080, 1920, 3), dtype=np.uint8))
    cfg = ModelConfig(proc_side=256, depth=8, n_joints=17, dtype='bfloat16',
                      backbone='efficientnetv2-s')
    # Unrolled block layout = the load_pose_estimator serving default since
    # round 4 (see bench_crop_model); BENCH_SCAN_BLOCKS=1 restores scanned.
    scan_blocks = os.environ.get('BENCH_SCAN_BLOCKS', '') == '1'
    bn_fold = os.environ.get('BENCH_BN_FOLD', '1') == '1'
    model = Metrabs(cfg=cfg, backbone=build_backbone(
        'efficientnetv2-s', scan_blocks=scan_blocks))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, 256, 256, 3), jnp.bfloat16), jnp.eye(3)[None])
    det_model = YOLOv4(num_classes=80, dtype=jnp.float32)
    det_vars = jax.jit(lambda: det_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 416, 416, 3), jnp.float32),
        train=False))()
    if bn_fold:
        # Same load-time fold as load_pose_estimator (crop model eps 1e-3,
        # darknet detector eps 1e-5); device_put so the folded numpy trees
        # are not re-uploaded through the tunnel on every dispatch (see
        # bench_crop_model).
        from metrabs_tpu.io.bn_fold import fold_bn_variables
        params = jax.device_put(fold_bn_variables(
            jax.tree_util.tree_map(np.asarray, params), epsilon=1e-3))
        model = Metrabs(cfg=cfg, backbone=build_backbone(
            'efficientnetv2-s', scan_blocks=scan_blocks, bn_fold=True))
        det_vars = jax.device_put(fold_bn_variables(
            jax.tree_util.tree_map(np.asarray, det_vars), epsilon=1e-5))
        det_model = YOLOv4(num_classes=80, dtype=jnp.float32, bn_fold=True)
    # Weights threaded as jit arguments via crop_model_state (CLAUDE.md
    # rule 1: a closure would embed them as HLO constants in every compiled
    # pipeline variant and bloat the remote-compile requests).
    est = PoseEstimator(
        lambda state, c, k, v: model.apply(
            state, c, k, train=False, sample_valid=v),
        H36M_17, cfg, crop_model_state=params,
        bone_mean_lengths=bone_priors.priors_for_joint_info(H36M_17),
        # approx_top_k is the serving-throughput mode benchmarked since r2
        # (the parity default is exact lax.top_k; keep bench comparable).
        detector=PersonDetector(det_model, det_vars, approx_top_k=True))

    def run(threshold, internal_batch_size=64):
        return est.detect_poses_batched(
            images, num_aug=2, max_detections=16,
            internal_batch_size=internal_batch_size,
            detector_threshold=threshold)['poses3d']

    # Two deterministic workload regimes (the threshold is a traced scalar,
    # so both share one compiled program):
    #  - dense: threshold 0 forces all 16 detection slots valid per frame
    #    (256 crops/batch — the worst case, and the regime round-1 always
    #    paid because padding was not skipped);
    #  - sparse: threshold 1.0 yields zero valid detections, exposing the
    #    detector + fixed pipeline overhead floor that real few-person
    #    scenes approach thanks to runtime chunk skipping.
    def timeit(threshold, internal_batch_size=64):
        jax.block_until_ready(run(threshold, internal_batch_size))
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = run(threshold, internal_batch_size)
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        return frames / min(times)

    dense_fps, sparse_fps = timeit(0.0), timeit(1.0)
    # The measured dense +9% config (`estimator.py`: one 256-crop chunk,
    # VERDICT r2 #8) as a tracked variant; separate compiled program.
    dense_fps_ibs256 = (
        None if os.environ.get('BENCH_SKIP_IBS256')
        else timeit(0.0, internal_batch_size=256))

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

    return dense_fps, sparse_fps, dense_fps_ibs256, stream


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

    backbone_name = os.environ.get('BENCH_BACKBONE', 'efficientnetv2-l')
    res = int(os.environ.get('BENCH_RES', '384'))
    batch = int(os.environ.get('BENCH_BATCH', '128'))
    iters = int(os.environ.get('BENCH_ITERS', '20'))

    crops_per_sec, headline_mfu = bench_crop_model(
        backbone_name, res, batch, iters)

    extra = {}
    if not os.environ.get('BENCH_SKIP_EXTRA_BACKBONES'):
        for name, eres, ebatch in EXTRA_BACKBONES:
            try:
                cps, mfu = bench_crop_model(name, eres, ebatch, iters)
                extra[f'{name}@{eres}'] = dict(
                    crops_per_sec=round(cps, 2), **(mfu or {}))
            except Exception as e:
                print(f'extra backbone {name} failed: {e!r}', file=sys.stderr)

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
        # Host-contention indicator: the stream-sparse number especially is
        # fragile to a busy host (observed 606 vs 296 fps same-day,
        # PARITY.md) — round-over-round comparisons need this context.
        'loadavg_1m': round(os.getloadavg()[0], 2),
    }
    if headline_mfu:
        record['headline_mfu'] = headline_mfu
    if extra:
        record['extra_backbones'] = extra
    if fused is not None:
        dense_fps, sparse_fps, dense_fps_ibs256, stream = fused
        record['fused_detect_fps'] = round(dense_fps, 2)
        record['fused_detect_vs_r01'] = round(dense_fps / ROUND1_FUSED_FPS, 4)
        record['fused_detect_fps_sparse'] = round(sparse_fps, 2)
        if dense_fps_ibs256 is not None:
            record['fused_detect_fps_ibs256'] = round(dense_fps_ibs256, 2)
        if stream is not None:
            record['stream_detect_fps'] = round(stream[0], 2)
            record['stream_detect_fps_sparse'] = round(stream[1], 2)
    print(json.dumps(record))


if __name__ == '__main__':
    main()
