"""Live webcam demo (`metrabs_tf/scripts/webcam_demo.py` equivalent).

Builds the camera extrinsics from a physical pitch angle and height above
ground (`webcam_demo.py:54-69`): the world frame is y-up at ground level so
output poses are in meaningful room coordinates.

Usage:
  python -m metrabs_tpu.apps.webcam_demo [--package dir] [--camera-id 0]
      [--pitch-degrees 0] [--height-m 1.0] [--fov 55]
"""

from __future__ import annotations

import argparse

import numpy as np


def camera_extrinsics_from_pitch_height(
        pitch_degrees: float, height_m: float) -> np.ndarray:
    """4x4 world->camera extrinsics for a camera `height_m` above the ground,
    pitched down by `pitch_degrees`, world up = -y (camera convention)."""
    pitch = np.deg2rad(pitch_degrees)
    c, s = np.cos(pitch), np.sin(pitch)
    # Rotation about the camera x-axis.
    R = np.array([[1, 0, 0], [0, c, s], [0, -s, c]], np.float32)
    t_world = np.array([0, -height_m * 1000.0, 0], np.float32)  # y-down world
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = R
    ext[:3, 3] = -R @ t_world
    return ext


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--package', default=None)
    parser.add_argument('--camera-id', type=int, default=0)
    parser.add_argument('--pitch-degrees', type=float, default=0.0)
    parser.add_argument('--height-m', type=float, default=1.0)
    parser.add_argument('--fov', type=float, default=55.0)
    parser.add_argument(
        '--fast-load', action='store_true',
        help='keep the packaged scanned backbone layout instead of the '
             'serving-default unroll: much faster cold compile (~1 min vs '
             'tens of minutes for EffNetV2-L on an empty compile cache) at '
             '~11%% lower crop throughput - right trade for interactive use')
    parser.add_argument('--num-aug', type=int, default=1)
    parser.add_argument('--skeleton', default='')
    parser.add_argument('--max-frames', type=int, default=0,
                        help='stop after N frames (0 = until q pressed)')
    parser.add_argument('--headless', action='store_true')
    args = parser.parse_args(argv)

    import cv2
    from metrabs_tpu.apps.demo_image import build_default_estimator, draw_poses
    if args.package:
        from metrabs_tpu.io.packaging import load_pose_estimator
        estimator = load_pose_estimator(
            args.package,
            cfg_overrides={'backbone_scan_blocks': True} if args.fast_load
            else None)
    else:
        estimator = build_default_estimator()

    extrinsics = camera_extrinsics_from_pitch_height(
        args.pitch_degrees, args.height_m)
    edges = estimator.skeletons.joint_edges(args.skeleton)

    cap = cv2.VideoCapture(args.camera_id)
    if not cap.isOpened():
        raise RuntimeError(f'Cannot open camera {args.camera_id}')
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if estimator.detector is not None:
            result = estimator.detect_poses(
                rgb, num_aug=args.num_aug, skeleton=args.skeleton,
                default_fov_degrees=args.fov, extrinsic_matrix=extrinsics)
        else:
            h, w = rgb.shape[:2]
            boxes = np.array([[w * .25, h * .05, w * .5, h * .9]], np.float32)
            result = estimator.estimate_poses(
                rgb, boxes, num_aug=args.num_aug, skeleton=args.skeleton,
                default_fov_degrees=args.fov, extrinsic_matrix=extrinsics)
        if not args.headless:
            vis = draw_poses(rgb, result['poses2d'], edges)
            cv2.imshow('metrabs-tpu', cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
            if cv2.waitKey(1) & 0xFF == ord('q'):
                break
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cap.release()
    if not args.headless:
        cv2.destroyAllWindows()


if __name__ == '__main__':
    main()
