"""End-to-end predict+eval harness test with synthetic examples."""

import numpy as np
import jax
import jax.numpy as jnp

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.data.camera import Camera
from metrabs_tpu.data.loading import Example3D
from metrabs_tpu.eval.harness import (
    evaluate_predictions, predict_dataset, save_predictions_npz)
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.pipeline.skeletons import H36M_17

CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')


def make_examples(rng, n=6):
    examples = []
    for i in range(n):
        cam = Camera(
            optical_center=np.zeros(3, np.float32),
            intrinsic_matrix=np.array(
                [[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32),
            world_up=(0, -1, 0))
        pose = (rng.normal(size=(17, 3)) * 250 + [0, 0, 4000]).astype(np.float32)
        im_pts = cam.world_to_image(pose)
        x0, y0 = im_pts.min(0) - 20
        x1, y1 = im_pts.max(0) + 20
        examples.append(Example3D(
            image_path=f'synthetic/h36m_{i}.jpg', camera=cam,
            bbox=np.array([x0, y0, x1 - x0, y1 - y0], np.float32),
            world_coords=pose,
            image=rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)))
    return examples


def test_predict_and_evaluate(rng, tmp_path):
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])

    def crop_model_fn(crops, intrinsics, valid):
        return model.apply(params, crops, intrinsics, train=False,
                           sample_valid=valid)

    examples = make_examples(rng)
    preds = predict_dataset(
        crop_model_fn, examples, H36M_17, CFG, batch_size=4, n_workers=2)
    assert preds['poses3d_pred_cam'].shape == (6, 17, 3)
    assert preds['poses3d_true_cam'].shape == (6, 17, 3)
    assert np.all(np.isfinite(preds['poses3d_pred_cam']))

    metrics = evaluate_predictions(preds, joint_info=H36M_17)
    assert 'mean_error' in metrics and 'mean_error_procrustes' in metrics
    assert np.isfinite(metrics['mean_error'])
    # Random model: errors should be large but PA-MPJPE <= MPJPE.
    assert metrics['mean_error_procrustes'] <= metrics['mean_error'] + 1e-3

    save_predictions_npz(str(tmp_path / 'preds.npz'), preds)
    loaded = np.load(tmp_path / 'preds.npz')
    np.testing.assert_allclose(
        loaded['poses3d_pred_cam'], preds['poses3d_pred_cam'])


def test_oracle_model_gets_zero_error(rng):
    """A crop model that returns the ground truth (in crop-camera space) must
    produce ~zero MPJPE through the whole harness — validates the camera
    transform bookkeeping end to end."""
    examples = make_examples(rng, n=4)

    # The harness transforms preds by rot_to_orig_cam; to return GT we need
    # the crop-space GT, which load_and_transform3d provides as
    # coords3d_true. Build an oracle by re-running the loader (no-aug) and
    # serving the matching GT per batch position.
    from metrabs_tpu.data.loading import LoadConfig, load_and_transform3d
    lcfg = LoadConfig(geom_aug=False, occlude_aug_prob=0, color_aug=False,
                      background_aug_prob=0, partial_visibility_prob=0)
    gts = [load_and_transform3d(
        ex, H36M_17, False, np.random.default_rng(0), CFG, lcfg)['coords3d_true']
        for ex in examples]
    gt_stack = np.stack(gts)
    call_counter = {'i': 0}

    def oracle_fn(crops, intrinsics, valid):
        n = crops.shape[0]
        start = call_counter['i']
        call_counter['i'] += n
        return jnp.asarray(gt_stack[start:start + n])

    preds = predict_dataset(
        oracle_fn, examples, H36M_17, CFG, batch_size=4, n_workers=1)
    metrics = evaluate_predictions(preds, joint_info=H36M_17)
    assert metrics['mean_error'] < 1e-2, metrics['mean_error']
    assert metrics['mean_pck'] == 1.0


def test_save_predictions_hdf5_roundtrip(tmp_path):
    import h5py

    from metrabs_tpu.eval.harness import save_predictions

    preds = dict(
        poses3d_pred_cam=np.arange(24, dtype=np.float32).reshape(2, 4, 3),
        image_path=np.array(['a/b.jpg', 'c/d.jpg']))
    path = str(tmp_path / 'preds.h5')
    save_predictions(path, preds)
    with h5py.File(path, 'r') as f:
        np.testing.assert_array_equal(
            f['poses3d_pred_cam'][:], preds['poses3d_pred_cam'])
        assert [s.decode() for s in f['image_path'][:]] == \
            ['a/b.jpg', 'c/d.jpg']
