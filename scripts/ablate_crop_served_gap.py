"""Attribute the crop-eval -> served MPJPE gap (VERDICT r4 weak #2).

Round 4 measured val MPJPE 43.6mm (ideal training-protocol crops) but
86.6mm served root-relative on GT boxes at num_aug=2 — a 2x degradation
through a serving path that is supposed to be train-equivalent
(`multiperson_model.py:292-327`). This script isolates the contributors on
the trained package, all numbers from the SAME held-out scenes:

  crop_eval      val protocol: load_and_transform3d crops at proc_side,
                 absolute metrics (eval/harness.py) — the training-log number
  served_neutral estimate_poses_batched, GT boxes, ONE aug with the TTA
                 schedule REPLACED by identity (gamma 1, scale 1, angle 0,
                 no flip): isolates the serving warp/decode path itself
  served_aug1    stock num_aug=1 — the reference's linspace-midpoint quirk
                 serves gamma=0.8, scale=1.05 (`multiperson_model.py:
                 138-169`, tfu.linspace num=1 -> midpoint)
  served_gamma   gamma=0.8 only (scale 1): the brightness-TTA term
  served_scale   scale=1.05 only (gamma 1): the zoom-TTA term
  served_aug2/5  stock TTA averaging
  near/far       person-size sweep: scenes re-rendered with people at
                 z 2800-3800 (~150-210px tall) vs 5800-7000 (~96-117px),
                 crop_eval + served_neutral each — the resolution term

Writes GAP_ABLATION_r05.json. Run after scripts/train_to_serve_e2e.py:
  python scripts/ablate_crop_served_gap.py [--package runs/train2serve/package]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_t0 = time.time()


def tick(msg):
    print(f'[{time.time() - _t0:7.1f}s] {msg}', flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--package', default='/root/repo/runs/train2serve/package')
    p.add_argument('--val-scenes', type=int, default=16)
    p.add_argument('--record', default='/root/repo/GAP_ABLATION_r05.json')
    p.add_argument('--platform', default='')
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import threading
    _init_done = threading.Event()

    def _watchdog():
        timeout = int(os.environ.get('ABL_INIT_TIMEOUT', '300'))
        if not _init_done.wait(timeout):
            print('ablate: backend init did not complete (tunnel down?); '
                  'aborting', file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    tick(f'devices: {jax.devices()}')
    _init_done.set()

    import numpy as np

    from train_to_serve_e2e import build_split, person_bbox
    from metrabs_tpu.eval.harness import evaluate_predictions, predict_dataset
    from metrabs_tpu.io.packaging import load_crop_model, load_pose_estimator
    from metrabs_tpu.pipeline import tta as tta_mod

    results = {}

    # --- crop-protocol eval (the val-curve protocol) ----------------------
    model, variables, cfg, joint_info, _ = load_crop_model(args.package)

    def crop_fn(vs, crops, K, valid):
        return model.apply(vs, crops, K, train=False, sample_valid=valid)

    def crop_eval(examples):
        preds = predict_dataset(
            crop_fn, examples, joint_info, cfg, crop_model_state=variables,
            batch_size=32, n_workers=3)
        return evaluate_predictions(preds, joint_info=joint_info)

    def served_eval(est, scenes, cam, num_aug):
        imgs = np.stack([s[0] for s in scenes])
        max_people = max(len(s[1]) for s in scenes)
        boxes = np.zeros((len(scenes), max_people, 4), np.float32)
        for i, (_, poses) in enumerate(scenes):
            for k, pose in enumerate(poses):
                boxes[i, k] = person_bbox(cam, pose, margin=18)
        out = est.estimate_poses_batched(
            imgs, boxes, intrinsic_matrix=np.tile(
                cam.intrinsic_matrix[None], (len(scenes), 1, 1)),
            num_aug=num_aug)
        poses3d = np.asarray(out['poses3d'])
        errs, errs_abs = [], []
        for i, (_, poses) in enumerate(scenes):
            for k, gt in enumerate(poses):
                pred = poses3d[i, k]
                rr = (pred - pred.mean(0)) - (gt - gt.mean(0))
                errs.append(np.linalg.norm(rr, axis=-1).mean())
                errs_abs.append(np.linalg.norm(pred - gt, axis=-1).mean())
        return dict(mpjpe=float(np.mean(errs)),
                    mpjpe_abs=float(np.mean(errs_abs)))

    def patched_tta(gamma, scale):
        """Identity-except-(gamma, scale) single-aug TTA params."""
        orig = tta_mod.make_tta_params

        def fake(num_aug, aug_cfg):
            assert num_aug == 1
            return tta_mod.TTAParams(
                gammas=np.array([gamma], np.float32),
                angles=np.zeros(1, np.float32),
                scales=np.array([scale], np.float32),
                should_flip=np.zeros(1, bool),
                rotflip_mats=np.eye(3, dtype=np.float32)[None])
        return orig, fake

    variants = [('served_neutral', 1.0, 1.0), ('served_gamma', 0.8, 1.0),
                ('served_scale', 1.0, 1.05)]

    splits = {
        'val': build_split(1007, args.val_scenes),
        'near': build_split(2007, args.val_scenes, z_range=(2800, 3800)),
        'far': build_split(3007, args.val_scenes, z_range=(5800, 7000)),
    }

    for split_name, (scenes, ex3d, _, cam) in splits.items():
        r = {}
        tick(f'--- split {split_name} ({len(ex3d)} people) ---')
        m = crop_eval(ex3d)
        r['crop_eval'] = dict(mpjpe=m['mean_error'],
                              mpjpe_abs=m.get('mean_error_abs'))
        tick(f'{split_name} crop_eval: {r["crop_eval"]}')

        for vname, gamma, scale in variants:
            orig, fake = patched_tta(gamma, scale)
            tta_mod.make_tta_params = fake
            try:
                # Scanned layout: identical math to the unrolled serving
                # default, minutes less compile per TTA variant (this
                # script compiles ~12 distinct estimate graphs).
                est = load_pose_estimator(
                    args.package,
                    cfg_overrides={'backbone_scan_blocks': True})
                r[vname] = served_eval(est, scenes, cam, num_aug=1)
            finally:
                tta_mod.make_tta_params = orig
            tick(f'{split_name} {vname}: {r[vname]}')

        if split_name == 'val':
            est = load_pose_estimator(args.package)
            for num_aug in (1, 2, 5):
                r[f'served_aug{num_aug}'] = served_eval(
                    est, scenes, cam, num_aug=num_aug)
                tick(f'{split_name} served_aug{num_aug}: '
                     f'{r[f"served_aug{num_aug}"]}')
        results[split_name] = r

    results['wall_s'] = round(time.time() - _t0, 1)
    with open(args.record, 'w') as f:
        json.dump(results, f, indent=2)
    tick(f'record written to {args.record}')
    print('GAP_ABLATION OK')


if __name__ == '__main__':
    main()
