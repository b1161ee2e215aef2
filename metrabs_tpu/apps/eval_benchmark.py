"""Benchmark predict+eval CLI (the `inference_scripts/pred_and_eval_model.sh`
analogue).

Takes a packaged model and a dataset example file, runs the crop model over
the test set and prints the standard metric table.

The examples file is a pickle of `metrabs_tpu.data.loading.Example3D` objects
(dataset adapters produce these; see docs/EVALUATION.md). Predictions are
optionally dumped as NPZ for seed-averaged or external evaluation.

  python -m metrabs_tpu.apps.eval_benchmark \
      --package models/metrabs_eff2s --examples 3dpw_test.pkl \
      --benchmark 3dpw [--pred-out preds.npz] [--mirror-aug]
"""

from __future__ import annotations

import argparse
import json
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--package', required=True)
    parser.add_argument('--examples', required=True)
    parser.add_argument('--benchmark', default='h36m',
                        help='3dpw|h36m|3dhp|mupots|3doh|aspset')
    parser.add_argument('--pred-out', default=None)
    parser.add_argument('--mirror-aug', action='store_true')
    parser.add_argument('--batch-size', type=int, default=64)
    parser.add_argument('--workers', type=int, default=8)
    args = parser.parse_args(argv)

    from metrabs_tpu.eval.harness import (
        BENCHMARK_PROTOCOLS, evaluate_predictions, predict_dataset,
        save_predictions)
    from metrabs_tpu.io.packaging import load_pose_estimator

    estimator = load_pose_estimator(args.package)
    with open(args.examples, 'rb') as f:
        examples = pickle.load(f)

    protocol = BENCHMARK_PROTOCOLS[args.benchmark]

    # The packaged estimator's raw crop model is the prediction engine
    # (the reference's --predict path also runs crop-level, `main.py:439-482`).
    preds = predict_dataset(
        estimator.crop_model_fn_with_state, examples, estimator.joint_info,
        estimator.cfg, crop_model_state=estimator.crop_model_state,
        batch_size=args.batch_size, n_workers=args.workers,
        test_time_mirror_aug=args.mirror_aug)
    if args.pred_out:
        save_predictions(args.pred_out, preds)

    from metrabs_tpu.eval.harness import JOINT_SUBSETS
    metrics = evaluate_predictions(
        preds, joint_info=estimator.joint_info,
        threshold_mm=protocol.pck_threshold_mm,
        # e.g. 3DPW's official 14-joint LSP-like protocol subset.
        joint_subset=(JOINT_SUBSETS[protocol.joint_subset]
                      if protocol.joint_subset else None))
    print(json.dumps({'benchmark': args.benchmark, **metrics}, indent=2))


if __name__ == '__main__':
    main()
