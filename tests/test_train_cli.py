"""End-to-end train-CLI smoke tests for the three model classes
(`apps/train.py --model-class`, the reference's FLAGS.model_class
dispatch at `main.py:177-180`): a few real steps on synthetic in-memory
examples, then the exported package must reload."""

import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute XLA CPU compiles; smoke tier = -m 'not oracle and not slow'



def _write_datasets(tmp_path, rng, n=8):
    from metrabs_tpu.data.camera import Camera
    from metrabs_tpu.data.loading import Example2D, Example3D

    cam = Camera(
        optical_center=np.zeros(3, np.float32),
        intrinsic_matrix=np.array(
            [[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32),
        world_up=(0, -1, 0))

    ex3, ex2 = [], []
    for i in range(n):
        pose = (rng.normal(size=(17, 3)) * 200 + [0, 0, 3500]).astype(np.float32)
        img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
        pts = cam.world_to_image(pose)
        x0, y0 = pts.min(0) - 20
        x1, y1 = pts.max(0) + 20
        ex3.append(Example3D(
            image_path=f'syn/{i}.jpg', camera=cam,
            bbox=np.array([x0, y0, x1 - x0, y1 - y0], np.float32),
            world_coords=pose, image=img))
        coords2d = rng.uniform(100, 400, size=(14, 2)).astype(np.float32)
        ex2.append(Example2D(
            image_path=f'syn2d/{i}.jpg',
            bbox=np.array([80, 80, 380, 380], np.float32),
            coords=coords2d, image=img))
    p3 = str(tmp_path / 'ds3.pkl')
    p2 = str(tmp_path / 'ds2.pkl')
    with open(p3, 'wb') as f:
        pickle.dump(ex3, f)
    with open(p2, 'wb') as f:
        pickle.dump(ex2, f)
    return p3, p2


@pytest.mark.parametrize('model_class', ['metrabs', 'metro', 'model25d'])
def test_train_cli_model_classes(tmp_path, rng, model_class):
    from metrabs_tpu.apps import train as train_cli
    from metrabs_tpu.io.packaging import load_crop_model

    p3, p2 = _write_datasets(tmp_path, rng)
    ckpt_dir = str(tmp_path / f'ckpt_{model_class}')
    export_dir = str(tmp_path / f'pkg_{model_class}')
    argv = [
        '--ds3d', p3, '--ds2d', p2, '--checkpoint-dir', ckpt_dir,
        '--backbone', 'tiny', '--proc-side', '64', '--depth', '4',
        '--batch-size', '8', '--batch-size-2d', '8', '--training-steps', '2',
        '--workers', '2', '--dtype', 'float32', '--checkpoint-period', '1',
        '--export-dir', export_dir, '--model-class', model_class]
    if model_class == 'model25d':
        bl_path = str(tmp_path / 'bones.npz')
        from metrabs_tpu.pipeline.skeletons import H36M_17
        np.savez(bl_path, lengths=np.full(len(H36M_17.edges), 300.0, np.float32))
        argv += ['--bone-lengths', bl_path]
    train_cli.main(argv)

    def tiny_builder(name, **kwargs):
        from metrabs_tpu.models.backbones.tiny import TinyBackbone
        import jax.numpy as jnp
        return TinyBackbone(width=32, dtype=jnp.float32)

    model, variables, cfg, joint_info, manifest = load_crop_model(
        export_dir, backbone_builder=tiny_builder)
    assert manifest['model_class'] == model_class
    assert len(joint_info.names) == 17
    # The package must carry dataset-derived plausibility priors
    # accumulated from the GT stream (the reference's bone_length_file
    # asset, `plausibility_check.py:12-16`) — no invented constants.
    bone_means = manifest.get('bone_mean_lengths')
    assert bone_means is not None
    bone_means = np.asarray(bone_means, np.float32)
    assert bone_means.shape == (len(joint_info.edges),)
    assert np.all(np.isfinite(bone_means)) and np.all(bone_means > 0)
    import jax.numpy as jnp
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    if model_class == 'metro':
        out = model.apply(variables, x)
    else:
        out = model.apply(variables, x, jnp.eye(3)[None].repeat(2, 0))
    assert out.shape == (2, 17, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_train_cli_model_parallel(tmp_path, rng):
    """--model-parallel 2: the train CLI over a (data=4, model=2) mesh with
    kernels actually sharded (tp-min-size below the tiny net's kernels);
    a few steps must run, checkpoint, and export a loadable package."""
    from metrabs_tpu.apps import train as train_cli
    from metrabs_tpu.io.packaging import load_crop_model

    p3, p2 = _write_datasets(tmp_path, rng)
    ckpt_dir = str(tmp_path / 'ckpt_tp')
    export_dir = str(tmp_path / 'pkg_tp')
    train_cli.main([
        '--ds3d', p3, '--ds2d', p2, '--checkpoint-dir', ckpt_dir,
        '--backbone', 'tiny', '--proc-side', '64', '--depth', '4',
        '--batch-size', '8', '--batch-size-2d', '8', '--training-steps', '2',
        '--workers', '2', '--dtype', 'float32', '--checkpoint-period', '1',
        '--export-dir', export_dir,
        '--model-parallel', '2', '--tp-min-size', '2048'])

    def tiny_builder(name, **kwargs):
        from metrabs_tpu.models.backbones.tiny import TinyBackbone
        import jax.numpy as jnp
        return TinyBackbone(width=32, dtype=jnp.float32)

    model, variables, cfg, joint_info, manifest = load_crop_model(
        export_dir, backbone_builder=tiny_builder)
    import jax.numpy as jnp
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, jnp.eye(3)[None].repeat(2, 0))
    assert out.shape == (2, 17, 3)
    assert np.all(np.isfinite(np.asarray(out)))
