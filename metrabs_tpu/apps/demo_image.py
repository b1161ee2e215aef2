"""Single-image demo (`demos/demo_image.py` + `metrabs_pytorch/scripts/
demo_image.py` equivalent).

Usage:
  python -m metrabs_tpu.apps.demo_image --image /path/img.jpg \
      --package /path/to/package_dir [--boxes x,y,w,h;x,y,w,h] [--out out.jpg]

Without --package, runs a randomly initialized tiny model (pipeline smoke
test); without --boxes, uses the detector (if packaged) or one full-image box.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_default_estimator():
    """Randomly initialized small estimator (no trained weights shipped)."""
    import jax
    import jax.numpy as jnp
    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    from metrabs_tpu.pipeline.skeletons import H36M_17

    cfg = ModelConfig(proc_side=256, depth=8, n_joints=17, dtype='bfloat16',
                      backbone='mobilenetv3-small')
    model = Metrabs(cfg=cfg, backbone=build_backbone(cfg.backbone))
    params = jax.jit(model.init)(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, 256, 256, 3), jnp.bfloat16), jnp.eye(3)[None])

    def crop_model_fn(crops, intrinsics, sample_valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=sample_valid)

    return PoseEstimator(crop_model_fn, H36M_17, cfg)


def draw_poses(image: np.ndarray, poses2d: np.ndarray, edges) -> np.ndarray:
    import cv2
    out = image.copy()
    for pose in poses2d:
        for i, j in edges:
            p1 = tuple(np.round(pose[i]).astype(int))
            p2 = tuple(np.round(pose[j]).astype(int))
            cv2.line(out, p1, p2, (0, 255, 0), 2)
        for pt in pose:
            cv2.circle(out, tuple(np.round(pt).astype(int)), 3, (255, 0, 0), -1)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--image', required=True)
    parser.add_argument('--package', default=None)
    parser.add_argument('--boxes', default=None,
                        help='person boxes as "x,y,w,h;x,y,w,h;..."')
    parser.add_argument('--out', default=None)
    parser.add_argument('--out-3d', default=None,
                        help='write a matplotlib 3D scene (+2D panel) here')
    parser.add_argument('--num-aug', type=int, default=5)
    parser.add_argument('--skeleton', default='')
    parser.add_argument('--fov', type=float, default=55.0)
    parser.add_argument(
        '--fast-load', action='store_true',
        help='keep the packaged scanned backbone layout instead of the '
             'serving-default unroll: much faster cold compile (~1 min vs '
             'tens of minutes for EffNetV2-L on an empty compile cache) at '
             '~11%% lower crop throughput - right trade for interactive use')
    args = parser.parse_args(argv)

    from metrabs_tpu.data.improc import imread
    image = imread(args.image)

    if args.package:
        from metrabs_tpu.io.packaging import load_pose_estimator
        estimator = load_pose_estimator(
            args.package,
            cfg_overrides={'backbone_scan_blocks': True} if args.fast_load
            else None)
    else:
        estimator = build_default_estimator()

    if args.boxes:
        boxes = np.array(
            [[float(v) for v in b.split(',')] for b in args.boxes.split(';')],
            np.float32)
        result = estimator.estimate_poses(
            image, boxes, num_aug=args.num_aug, skeleton=args.skeleton,
            default_fov_degrees=args.fov)
    elif estimator.detector is not None:
        result = estimator.detect_poses(
            image, num_aug=args.num_aug, skeleton=args.skeleton,
            default_fov_degrees=args.fov)
    else:
        h, w = image.shape[:2]
        boxes = np.array([[w * 0.25, h * 0.05, w * 0.5, h * 0.9]], np.float32)
        result = estimator.estimate_poses(
            image, boxes, num_aug=args.num_aug, skeleton=args.skeleton,
            default_fov_degrees=args.fov)

    print(json.dumps({
        'n_poses': int(result['poses3d'].shape[0]),
        'poses3d_shape': list(result['poses3d'].shape),
        'poses2d_shape': list(result['poses2d'].shape),
        'pose0_pelvis_mm': (result['poses3d'][0, 0].tolist()
                            if result['poses3d'].shape[0] else None)}))

    if args.out:
        import cv2
        edges = estimator.skeletons.joint_edges(args.skeleton)
        vis = draw_poses(image, result['poses2d'], edges)
        cv2.imwrite(args.out, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        print(f'wrote {args.out}')

    if args.out_3d:
        from metrabs_tpu.utils.viz import plot_poses_3d
        edges = estimator.skeletons.joint_edges(args.skeleton)
        plot_poses_3d(result['poses3d'], edges, out_path=args.out_3d,
                      image=image, poses2d=result['poses2d'])
        print(f'wrote {args.out_3d}')


if __name__ == '__main__':
    main()
