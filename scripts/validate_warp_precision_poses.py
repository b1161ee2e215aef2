"""Warp-precision pose-delta validation on TRAINED weights (VERDICT r3 #2).

The Pallas warp kernel's bf16 MXU modes trade pixel-value precision for
throughput (`ops/warp_pallas.py` docstring: 0.204 ms/crop bf16x2 vs 0.266
bf16x3 vs 0.38 f32 at 256px). Whether that pixel noise matters can only be
judged through a TRAINED crop model (a random backbone is chaotic per
PARITY.md); this script loads the package minted by
`scripts/train_to_serve_e2e.py` and measures, per precision mode:
  - max / mean 3D pose delta vs the bf16x3 baseline on the held-out
    synthetic validation people (GT-box estimate_poses_batched protocol),
  - val MPJPE per mode (does accuracy move at all).

Decision rule (applied by hand in PARITY.md): if bf16's max delta is
under ~0.5 mm, bf16 becomes the recommended bf16-serving default.

  python scripts/validate_warp_precision_poses.py \
      [--package runs/train2serve/package] [--val runs/train2serve/ds3d_val.pkl]

Writes WARP_PRECISION_POSES_r04.json.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--package', default='/root/repo/runs/train2serve/package')
    p.add_argument('--val', default='/root/repo/runs/train2serve/ds3d_val.pkl')
    p.add_argument('--num-aug', type=int, default=2)
    p.add_argument('--platform', default='')
    p.add_argument('--out', default='/root/repo/WARP_PRECISION_POSES_r05.json')
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
        if not done.wait(int(os.environ.get('WPP_INIT_TIMEOUT', '300'))):
            print('backend init timed out (tunnel down?)', file=sys.stderr)
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    print(jax.devices(), flush=True)
    done.set()

    import numpy as np

    from metrabs_tpu.io.packaging import load_pose_estimator

    with open(args.val, 'rb') as f:
        val_examples = pickle.load(f)

    # Group the per-person examples back into frames by image identity.
    frames = {}
    for ex in val_examples:
        key = ex.image_path.rsplit('_', 1)[0]
        frames.setdefault(key, []).append(ex)
    frame_list = list(frames.values())
    n_frames = len(frame_list)
    max_people = max(len(v) for v in frame_list)
    h, w = frame_list[0][0].image.shape[:2]
    images = np.stack([v[0].image for v in frame_list])
    boxes = np.zeros((n_frames, max_people, 4), np.float32)
    valid_gt = np.zeros((n_frames, max_people), bool)
    gt = np.zeros((n_frames, max_people, 17, 3), np.float32)
    intr = np.stack([v[0].camera.intrinsic_matrix for v in frame_list])
    for i, people in enumerate(frame_list):
        for k, ex in enumerate(people):
            boxes[i, k] = ex.bbox
            valid_gt[i, k] = True
            gt[i, k] = ex.world_coords

    results = {}
    poses_by_mode = {}
    for mode in ('high', 'bf16x2', 'bf16', 'highest'):
        t0 = time.time()
        est = load_pose_estimator(
            args.package, cfg_overrides={'warp_precision': mode})
        out = est.estimate_poses_batched(
            images, boxes, intrinsic_matrix=intr, num_aug=args.num_aug)
        poses = np.asarray(out['poses3d'])
        poses_by_mode[mode] = poses
        errs = []
        for i in range(n_frames):
            for k in range(max_people):
                if not valid_gt[i, k]:
                    continue
                rr = ((poses[i, k] - poses[i, k, :1])
                      - (gt[i, k] - gt[i, k, :1]))
                errs.append(np.linalg.norm(rr, axis=-1).mean())
        results[mode] = dict(mpjpe_mm=round(float(np.mean(errs)), 3),
                             wall_s=round(time.time() - t0, 1))
        print(f'{mode}: MPJPE {results[mode]["mpjpe_mm"]}mm', flush=True)

    base = poses_by_mode['high']  # bf16x3: today's bf16-serving default
    for mode, poses in poses_by_mode.items():
        delta = np.linalg.norm(poses - base, axis=-1)[valid_gt]
        results[mode].update(
            max_delta_vs_bf16x3_mm=round(float(delta.max()), 4),
            mean_delta_vs_bf16x3_mm=round(float(delta.mean()), 4))
        print(f'{mode}: max|d| {results[mode]["max_delta_vs_bf16x3_mm"]}mm '
              f'mean {results[mode]["mean_delta_vs_bf16x3_mm"]}mm', flush=True)

    # r5 (VERDICT r4 #7): pose deltas of the OTHER serving-stack shortcuts
    # on the same trained weights — load-time BN folding (exact affine
    # rewrite, expect bf16-noise-level deltas) and the scanned-vs-unrolled
    # block layout (identical math, expect ~0) — both vs the serving
    # default (bn_fold ON, unrolled, warp 'high').
    layouts = {
        'serving_default': {},
        'bn_fold_off': {'bn_fold': False},
        'scanned_layout': {'backbone_scan_blocks': True},
    }
    layout_results = {}
    base = None
    for lname, overrides in layouts.items():
        t0 = time.time()
        est = load_pose_estimator(args.package, cfg_overrides=overrides)
        out = est.estimate_poses_batched(
            images, boxes, intrinsic_matrix=intr, num_aug=args.num_aug)
        poses = np.asarray(out['poses3d'])
        if base is None:
            base = poses
        errs = []
        for i in range(n_frames):
            for k in range(max_people):
                if not valid_gt[i, k]:
                    continue
                rr = ((poses[i, k] - poses[i, k, :1])
                      - (gt[i, k] - gt[i, k, :1]))
                errs.append(np.linalg.norm(rr, axis=-1).mean())
        delta = np.linalg.norm(poses - base, axis=-1)[valid_gt]
        layout_results[lname] = dict(
            mpjpe_mm=round(float(np.mean(errs)), 3),
            max_delta_vs_default_mm=round(float(delta.max()), 4),
            mean_delta_vs_default_mm=round(float(delta.mean()), 4),
            wall_s=round(time.time() - t0, 1))
        print(f'layout {lname}: {layout_results[lname]}', flush=True)

    with open(args.out, 'w') as f:
        json.dump(dict(package=args.package, num_aug=args.num_aug,
                       n_people=int(valid_gt.sum()), modes=results,
                       layouts=layout_results), f,
                  indent=1)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
