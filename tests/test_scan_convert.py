"""Flat->scanned converter test: both layouts must produce IDENTICAL outputs
for the same (converted) weights."""

import jax
import jax.numpy as jnp
import numpy as np

from metrabs_tpu.io.scan_convert import flat_to_scanned
from metrabs_tpu.models.backbones.efficientnet_v2 import EfficientNetV2


def test_flat_to_scanned_output_equivalence(rng):
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)

    flat_model = EfficientNetV2(
        model_name='efficientnetv2-s', dtype=jnp.float32, scan_blocks=False)
    flat_vars = flat_model.init({'params': jax.random.PRNGKey(7)}, x, train=False)

    scan_model = EfficientNetV2(
        model_name='efficientnetv2-s', dtype=jnp.float32, scan_blocks=True)
    template = scan_model.init({'params': jax.random.PRNGKey(0)}, x, train=False)

    converted = flat_to_scanned(flat_vars, template)

    y_flat = flat_model.apply(flat_vars, x, train=False)
    y_scan = scan_model.apply(converted, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_flat), np.asarray(y_scan), rtol=1e-5, atol=1e-5)
