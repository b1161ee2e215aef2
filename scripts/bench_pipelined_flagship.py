"""Flagship (EffNetV2-L@384) serving throughput: serial unfused vs
pipelined overlap (VERDICT r3 #4a).

The L@384 fused one-program path cannot ship over the dev tunnel (HTTP
413, see scripts/aot_compile_fused_flagship.py for the soundness proof),
so flagship serving runs the two-program unfused path. Serially that costs
component-sum + a host round-trip per batch (r3: 383.5 ms/batch = 20.9
fps dense). `detect_poses_pipelined` keeps batches in flight so the host
round-trip of batch k-1 overlaps device compute of batch k; this script
measures both paths on identical dense frames.

  python scripts/bench_pipelined_flagship.py [--frames 16] [--batch 8]

Writes PIPELINED_r04.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--backbone', default='efficientnetv2-l')
    p.add_argument('--res', type=int, default=384)
    p.add_argument('--batch', type=int, default=8, help='frames per batch')
    p.add_argument('--n-batches', type=int, default=6)
    p.add_argument('--num-aug', type=int, default=2)
    p.add_argument('--threshold', type=float, default=0.0,
                   help='0.0 = dense (every candidate box survives)')
    p.add_argument('--platform', default='')
    p.add_argument('--host-input', action='store_true',
                   help='feed host numpy frames (measures H2D overlap too; '
                        'over the dev tunnel this is bandwidth-dominated)')
    p.add_argument('--out', default='/root/repo/PIPELINED_r04.json')
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import threading
    done = threading.Event()

    def watchdog():
        if not done.wait(int(os.environ.get('BPF_INIT_TIMEOUT', '300'))):
            print('backend init timed out (tunnel down?)', file=sys.stderr)
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    print(jax.devices(), flush=True)
    done.set()

    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.detect.yolov4 import YOLOv4, PersonDetector
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline import bone_priors
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    from metrabs_tpu.pipeline.skeletons import H36M_17

    res = args.res
    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=args.backbone)
    # Unrolled block layout: the load_pose_estimator serving default since
    # round 4 (+11% crop throughput, PROBE_INFER_r04.json). BPF_SCAN=1
    # restores the scanned layout for apples-to-apples with the first
    # PIPELINED_r04 recording.
    model = Metrabs(cfg=cfg, backbone=build_backbone(
        args.backbone, dtype=jnp.bfloat16,
        scan_blocks=os.environ.get('BPF_SCAN', '') == '1'))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, res, res, 3), jnp.bfloat16), jnp.eye(3)[None])
    det_model = YOLOv4(num_classes=80, dtype=jnp.float32)
    det_vars = jax.jit(lambda: det_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 416, 416, 3), jnp.float32),
        train=False))()
    est = PoseEstimator(
        lambda state, c, k, v: model.apply(state, c, k, train=False,
                                           sample_valid=v),
        H36M_17, cfg, crop_model_state=params,
        detector=PersonDetector(det_model, det_vars, approx_top_k=True),
        bone_mean_lengths=bone_priors.priors_for_joint_info(H36M_17))

    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 255, size=(args.batch, 1080, 1920, 3),
                            dtype=np.uint8) for _ in range(args.n_batches)]
    if not args.host_input:
        # Device-resident frames (the r2/r3 methodology): over the dev
        # tunnel, host->device of 50 MB/batch costs ~4 s/batch and swamps
        # everything — measured 4239 ms/batch serial with host arrays vs
        # 383.5 ms in r3. Production hosts feed frames over local PCIe.
        batches = [jax.device_put(b) for b in batches]
        jax.block_until_ready(batches)
    kwargs = dict(num_aug=args.num_aug, max_detections=16,
                  detector_threshold=args.threshold, fused=False)

    def run_serial():
        outs = []
        for b in batches:
            out = est.detect_poses_batched(b, **kwargs)
            outs.append({k: np.asarray(v) for k, v in out.items()})
        return outs

    def run_pipelined(depth):
        return list(est.detect_poses_pipelined(
            batches, in_flight=depth,
            **{k: v for k, v in kwargs.items() if k != 'fused'}))

    # Warm both paths (compiles), then time min-of-3.
    run_serial()
    run_pipelined(2)

    def timeit(fn):
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    n_frames = args.batch * args.n_batches
    results = {}
    for name, fn in (('serial_unfused', run_serial),
                     ('pipelined_if2', lambda: run_pipelined(2)),
                     ('pipelined_if3', lambda: run_pipelined(3))):
        dt = timeit(fn)
        results[name] = dict(
            s_total=round(dt, 3),
            ms_per_batch=round(dt / args.n_batches * 1e3, 1),
            fps=round(n_frames / dt, 2))
        print(f'{name}: {results[name]}', flush=True)

    # Equivalence spot check.
    a = run_serial()
    b = run_pipelined(2)
    for ga, gb in zip(a, b):
        for k in ga:
            np.testing.assert_allclose(ga[k], gb[k], atol=1e-3, err_msg=k)
    print('pipelined == serial outputs: ok', flush=True)

    with open(args.out, 'w') as f:
        json.dump(dict(config=vars(args), results=results), f, indent=1)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
