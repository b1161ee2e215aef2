"""Latent-joint model variants: transform_coords and predict_all_and_latents
forward paths through the Metrabs module and the estimator surface."""

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.config import ModelConfig
from metrabs_tpu.models.backbones.tiny import TinyBackbone
from metrabs_tpu.models.metrabs import Metrabs
from metrabs_tpu.pipeline.estimator import PoseEstimator
from metrabs_tpu.pipeline.skeletons import H36M_17

CFG = ModelConfig(proc_side=64, stride_train=32, stride_test=32, depth=4,
                  n_joints=17, dtype='float32')
N_LATENTS = 8


def make_latent_model(rng, mode):
    model = Metrabs(cfg=CFG, backbone=TinyBackbone(width=16, dtype=jnp.float32),
                    latent_mode=mode, n_latents=N_LATENTS)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None])
    # Fill the autoencoder constants with a plausible decode matrix.
    w2 = rng.normal(size=(N_LATENTS, 17)).astype(np.float32) / N_LATENTS
    w1 = rng.normal(size=(17, N_LATENTS)).astype(np.float32) / 17
    variables = dict(variables)
    variables['constants'] = {
        'recombination_weights': jnp.asarray(w2),
        'encoder_weights': jnp.asarray(w1)}
    return model, variables, w2


def test_transform_coords_forward(rng):
    model, variables, w2 = make_latent_model(rng, 'transform_coords')
    # Head predicts n_latents points.
    kernel = variables['params']['heatmap_heads']['conv_final']['kernel']
    assert kernel.shape[-1] == N_LATENTS * (1 + CFG.depth)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    K = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    out = model.apply(variables, x, K, train=False)
    assert out.shape == (2, 17, 3)  # decoded to the full joint set
    assert np.all(np.isfinite(np.asarray(out)))


def test_predict_all_and_latents_forward(rng):
    model, variables, w2 = make_latent_model(rng, 'predict_all_and_latents')
    kernel = variables['params']['heatmap_heads']['conv_final']['kernel']
    assert kernel.shape[-1] == (N_LATENTS + 17) * (1 + CFG.depth)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    K = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    out = model.apply(variables, x, K, train=False)
    assert out.shape == (2, 17, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_latent_model_through_estimator(rng):
    """The packaged inference path works with a latent-decoding crop model."""
    model, variables, _ = make_latent_model(rng, 'transform_coords')

    def crop_fn(state, crops, K, valid):
        return model.apply(state, crops, K, train=False, sample_valid=valid)

    est = PoseEstimator(crop_fn, H36M_17, CFG, crop_model_state=variables)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    out = est.estimate_poses(img, np.array([[20, 10, 60, 80]], np.float32),
                             num_aug=2)
    assert out['poses3d'].shape == (1, 17, 3)
    assert np.all(np.isfinite(out['poses3d']))
