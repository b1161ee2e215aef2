"""End-to-end learning sanity: the full training stack must be able to learn
pose estimation from synthetic stick-figure images.

Renders a small synthetic dataset (stick figures whose 2D projection is drawn
into the image), trains the tiny crop model for a few hundred steps, and
reports MPJPE before/after on the training set. A large drop demonstrates
that gradients flow correctly through backbone -> heads -> soft-argmax ->
absolute reconstruction -> losses -> optimizer (no real data needed).

  python scripts/overfit_sanity.py [--steps 300] [--platform cpu]

With `--backbone efficientnetv2-s --platform ''` it runs the PRODUCTION
configuration (real backbone, 256px bf16 crops, remat, adamw+EMA) on the
attached TPU — the on-hardware training-convergence record in PARITY.md.
"""

import argparse
import sys
import time

sys.path.insert(0, '/root/repo')


def main():
    parser = argparse.ArgumentParser()
    # 900 steps: the 2x-improvement bar with margin (measured on this
    # environment's jax 0.9: 300 steps reaches only 1.6x, 900 reaches 2.1x
    # with the loss still descending — the exponential-decay schedule length
    # scales with --steps, so more steps also means a slower early decay).
    parser.add_argument('--steps', type=int, default=900)
    parser.add_argument('--platform', default='cpu',
                        help="'' keeps the default (TPU if attached)")
    parser.add_argument('--n-examples', type=int, default=32)
    parser.add_argument('--backbone', default='tiny',
                        help="'tiny' or a builder name like "
                             "'efficientnetv2-s' (implies 256px bf16)")
    parser.add_argument('--proc-side', type=int, default=None)
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    import cv2
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.data.camera import Camera
    from metrabs_tpu.data.loading import Example3D, LoadConfig, load_and_transform3d
    from metrabs_tpu.eval.metrics import compute_pose3d_metrics
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
    from metrabs_tpu.train import loop as loop_mod, optim

    if args.backbone == 'tiny':
        cfg = ModelConfig(proc_side=args.proc_side or 64, stride_train=32,
                          stride_test=32, depth=4, n_joints=17,
                          dtype='float32')
    else:
        # Production configuration: real backbone, bf16 compute, remat.
        cfg = ModelConfig(proc_side=args.proc_side or 256, depth=8,
                          n_joints=17, dtype='bfloat16',
                          backbone=args.backbone)
    tcfg = TrainConfig(training_steps=args.steps, base_learning_rate=1e-3,
                       absloss_start_step=50)
    rng = np.random.default_rng(0)

    def make_camera():
        return Camera(
            optical_center=np.zeros(3, np.float32),
            intrinsic_matrix=np.array(
                [[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32),
            world_up=(0, -1, 0))

    def render_example(i):
        cam = make_camera()
        pose = (rng.normal(size=(17, 3)) * 220 + [0, 0, 3500]).astype(np.float32)
        img = np.full((480, 640, 3), 32, np.uint8)
        pts = cam.world_to_image(pose)
        for a, b in H36M_17.edges:
            cv2.line(img, tuple(np.round(pts[a]).astype(int)),
                     tuple(np.round(pts[b]).astype(int)), (0, 255, 0), 3)
        for j, pt in enumerate(pts):
            color = (255, 30 + j * 12, 30 + j * 12)
            cv2.circle(img, tuple(np.round(pt).astype(int)), 5, color, -1)
        x0, y0 = pts.min(0) - 20
        x1, y1 = pts.max(0) + 20
        return Example3D(
            image_path=f'synthetic/stick_{i}.jpg', camera=cam,
            bbox=np.array([x0, y0, x1 - x0, y1 - y0], np.float32),
            world_coords=pose, image=img)

    examples = [render_example(i) for i in range(args.n_examples)]
    lcfg = LoadConfig(geom_aug=False, occlude_aug_prob=0, color_aug=False,
                      background_aug_prob=0, partial_visibility_prob=0)
    loaded = [load_and_transform3d(ex, H36M_17, False, np.random.default_rng(1),
                                   cfg, lcfg) for ex in examples]
    batch3d = {k: jnp.asarray(np.stack([d[k] for d in loaded]))
               for k in ('image', 'intrinsics', 'coords3d_true',
                         'joint_validity_mask')}
    # 2D stream: reuse the same images with LSP-like projected annotations.
    groups_joints = [3, 2, 1, 4, 5, 6, 16, 15, 14, 11, 12, 13, 8, 10]
    batch2d = dict(
        image=batch3d['image'],
        intrinsics=batch3d['intrinsics'],
        coords2d_true=jnp.asarray(np.stack(
            [d['coords2d_true'][groups_joints] for d in loaded])),
        joint_validity_mask=jnp.ones((args.n_examples, 14), bool))

    if args.backbone == 'tiny':
        backbone = TinyBackbone(width=32, dtype=jnp.float32)
    else:
        from metrabs_tpu.models.backbones.builder import build_backbone
        backbone = build_backbone(args.backbone, dtype=jnp.dtype(cfg.dtype),
                                  remat=cfg.backbone_remat)
    model = Metrabs(cfg=cfg, backbone=backbone)
    tx = optim.build_optimizer(tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(loop_mod.make_train_step(model, tx, H36M_17, LSP_14,
                                               cfg, tcfg))

    @jax.jit
    def evaluate(params, batch_stats):
        variables = {'params': params}
        if batch_stats:
            variables['batch_stats'] = batch_stats
        preds = model.apply(
            variables, batch3d['image'].astype(jnp.dtype(cfg.dtype)),
            batch3d['intrinsics'], train=False)
        return compute_pose3d_metrics(
            preds, batch3d['coords3d_true'], batch3d['joint_validity_mask'])

    m0 = evaluate(state.params, state.batch_stats)
    print(f'before: MPJPE={float(m0["mean_error"]):.1f}mm '
          f'abs={float(m0["mean_error_abs"]):.1f}mm', flush=True)

    t0 = time.time()
    for i in range(args.steps):
        state, losses = step_fn(state, batch3d, batch2d, jax.random.PRNGKey(i))
        if (i + 1) % 100 == 0:
            print(f'step {i+1}: loss={float(losses["loss"]):.4f}', flush=True)
    print(f'{args.steps} steps in {time.time()-t0:.0f}s')

    m1 = evaluate(state.params, state.batch_stats)
    print(f'after:  MPJPE={float(m1["mean_error"]):.1f}mm '
          f'abs={float(m1["mean_error_abs"]):.1f}mm '
          f'PCK150={float(m1["mean_pck"]):.3f}')
    improvement = float(m0['mean_error']) / max(float(m1['mean_error']), 1e-9)
    print(f'rootrel MPJPE improved {improvement:.1f}x')
    assert float(m1['mean_error']) < float(m0['mean_error']) * 0.5, \
        'training failed to learn'
    print('LEARNING SANITY PASSED')


if __name__ == '__main__':
    main()
