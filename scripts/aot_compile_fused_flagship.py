"""AOT-compiles the flagship fused detect_poses program on the CPU backend
(VERDICT r3 #4b).

The EffNetV2-L@384 fused one-program graph hits the dev tunnel's HTTP 413
request-size limit, so it has never executed on the remote chip. This
script proves the PROGRAM is sound independent of the transport: it lowers
the exact fused jit (detector + suppression + warp + crop model + TTA) via
abstract arguments (no weights materialized), compiles it with XLA:CPU,
serializes the StableHLO, and records sizes + compile wall time. A
successful compile + serialized artifact pins the 413 as a transport-layer
limitation, not a program defect.

  python scripts/aot_compile_fused_flagship.py [--backbone efficientnetv2-l]
      [--res 384] [--frame 1080 1920] [--batch 1]

Writes AOT_FUSED_r04.json and the serialized StableHLO to
runs/fused_flagship.stablehlo.
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
    p.add_argument('--frame', type=int, nargs=2, default=(1080, 1920))
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--num-aug', type=int, default=5)
    p.add_argument('--max-detections', type=int, default=16)
    p.add_argument('--out', default='/root/repo/AOT_FUSED_r04.json')
    p.add_argument('--hlo-out', default='/root/repo/runs/fused_flagship.stablehlo')
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig
    from metrabs_tpu.detect.yolov4 import YOLOv4, PersonDetector
    from metrabs_tpu.models.backbones.builder import build_backbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline import bone_priors
    from metrabs_tpu.pipeline.estimator import PoseEstimator
    from metrabs_tpu.pipeline.skeletons import H36M_17

    t0 = time.time()
    res = args.res
    cfg = ModelConfig(proc_side=res, depth=8, n_joints=17, dtype='bfloat16',
                      backbone=args.backbone)
    model = Metrabs(cfg=cfg, backbone=build_backbone(args.backbone,
                                                     dtype=jnp.bfloat16))
    det_model = YOLOv4(num_classes=80, dtype=jnp.bfloat16)

    # Abstract variable trees: eval_shape avoids materializing ~120M params.
    crop_state = jax.eval_shape(
        lambda: model.init({'params': jax.random.PRNGKey(0)},
                           jnp.zeros((1, res, res, 3), jnp.bfloat16),
                           jnp.eye(3)[None]))
    det_vars = jax.eval_shape(
        lambda: det_model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 416, 416, 3), jnp.bfloat16),
                               train=False))
    print(f'[{time.time()-t0:6.1f}s] abstract init done', flush=True)

    detector = PersonDetector(det_model, det_vars, approx_top_k=True)
    est = PoseEstimator(
        lambda state, c, k, v: model.apply(state, c, k, train=False,
                                           sample_valid=v),
        H36M_17, cfg, crop_model_state=crop_state, detector=detector,
        bone_mean_lengths=bone_priors.priors_for_joint_info(H36M_17))

    h, w = args.frame
    n = args.batch
    fn = est._get_fused_jitted(
        num_aug=args.num_aug, average_aug=True, antialias_factor=1,
        internal_batch_size=64,
        skeleton_indices=tuple(int(i) for i in est.skeletons.indices('')),
        suppress_implausible_poses=True,
        max_detections=args.max_detections, detector_flip_aug=False,
        flip_vertical=False, orig_h=h, orig_w=w)

    f32 = jnp.float32
    arg_structs = (
        det_vars, crop_state,
        jax.ShapeDtypeStruct((n, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((), f32), jax.ShapeDtypeStruct((), f32),
        jax.ShapeDtypeStruct((n, 3, 3), f32),
        jax.ShapeDtypeStruct((n, 12), f32),
        jax.ShapeDtypeStruct((n, 4, 4), f32),
        jax.ShapeDtypeStruct((3,), f32),
        jax.ShapeDtypeStruct((), f32))

    t1 = time.time()
    lowered = fn.lower(*arg_structs)
    stablehlo = lowered.as_text(dialect='stablehlo')
    t2 = time.time()
    print(f'[{t2-t0:6.1f}s] lowered: {len(stablehlo)/1e6:.2f} MB StableHLO '
          f'({t2-t1:.1f}s)', flush=True)
    os.makedirs(os.path.dirname(args.hlo_out), exist_ok=True)
    with open(args.hlo_out, 'w') as f:
        f.write(stablehlo)

    t3 = time.time()
    compiled = lowered.compile()
    t4 = time.time()
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = dict(
            temp_bytes=int(getattr(ma, 'temp_size_in_bytes', 0)),
            argument_bytes=int(getattr(ma, 'argument_size_in_bytes', 0)),
            output_bytes=int(getattr(ma, 'output_size_in_bytes', 0)))
    except Exception as e:
        mem = dict(error=repr(e))
    print(f'[{t4-t0:6.1f}s] COMPILED OK on XLA:CPU in {t4-t3:.1f}s; '
          f'memory: {mem}', flush=True)

    record = dict(
        backbone=args.backbone, res=res, frame=list(args.frame),
        batch=n, num_aug=args.num_aug, max_detections=args.max_detections,
        stablehlo_mb=round(len(stablehlo) / 1e6, 3),
        lower_s=round(t2 - t1, 1), compile_s=round(t4 - t3, 1),
        memory=mem, ok=True)
    with open(args.out, 'w') as f:
        json.dump(record, f, indent=1)
    print('AOT_FUSED OK')


if __name__ == '__main__':
    main()
