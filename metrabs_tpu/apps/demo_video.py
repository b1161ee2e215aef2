"""Video demo: streaming multi-person estimation (`demos/demo_video.py`
equivalent; cv2.VideoCapture instead of the reference's ffmpeg IODataset).

Frames are batched (--frame-batch) so the fused detect/estimate graph runs at
full device utilization; an optional overlay video is written out.

Usage:
  python -m metrabs_tpu.apps.demo_video --video in.mp4 \
      [--package dir] [--out out.mp4] [--max-frames N] [--fov 55]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--video', required=True)
    parser.add_argument('--package', default=None)
    parser.add_argument('--out', default=None)
    parser.add_argument('--num-aug', type=int, default=2)
    parser.add_argument('--skeleton', default='')
    parser.add_argument('--fov', type=float, default=55.0)
    parser.add_argument('--frame-batch', type=int, default=8)
    parser.add_argument('--max-frames', type=int, default=0)
    parser.add_argument('--max-boxes', type=int, default=8)
    args = parser.parse_args(argv)

    import cv2
    from metrabs_tpu.apps.demo_image import build_default_estimator, draw_poses
    if args.package:
        from metrabs_tpu.io.packaging import load_pose_estimator
        estimator = load_pose_estimator(args.package)
    else:
        estimator = build_default_estimator()

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise FileNotFoundError(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    writer = None
    edges = estimator.skeletons.joint_edges(args.skeleton)

    n_frames = 0
    n_poses_total = 0
    batch = []
    done = False
    while not done:
        ok, frame = cap.read()
        if ok:
            batch.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        # Stop reading when the stream ends or the frame budget is reached,
        # but always flush the pending partial batch first.
        done = (not ok) or bool(
            args.max_frames and n_frames + len(batch) >= args.max_frames)
        if done and args.max_frames:
            batch = batch[:max(0, args.max_frames - n_frames)]
        if batch and (len(batch) == args.frame_batch or done):
            images = np.stack(batch)
            if estimator.detector is not None:
                result = estimator.detect_poses_batched(
                    images, num_aug=args.num_aug, skeleton=args.skeleton,
                    default_fov_degrees=args.fov,
                    max_detections=args.max_boxes)
            else:
                h, w = images.shape[1:3]
                boxes = np.tile(
                    np.array([[[w * .25, h * .05, w * .5, h * .9]]], np.float32),
                    (len(batch), 1, 1))
                result = estimator.estimate_poses_batched(
                    images, boxes, num_aug=args.num_aug, skeleton=args.skeleton,
                    default_fov_degrees=args.fov)
            poses2d = np.asarray(result['poses2d'])
            valid = np.asarray(result['valid'])
            for bi, rgb in enumerate(batch):
                n_poses_total += int(valid[bi].sum())
                if args.out:
                    if writer is None:
                        writer = cv2.VideoWriter(
                            args.out, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                            (rgb.shape[1], rgb.shape[0]))
                    vis = draw_poses(rgb, poses2d[bi][valid[bi]], edges)
                    writer.write(cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
            n_frames += len(batch)
            batch = []
    cap.release()
    if writer is not None:
        writer.release()
    print(json.dumps({'frames': n_frames, 'total_poses': n_poses_total}))


if __name__ == '__main__':
    main()
