"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices, exactly as the driver
does for `__graft_entry__.dryrun_multichip`.
"""

import os

# The reference's EffNetV2 fork needs Keras 2 (Keras 3's attribute tracking
# wraps its Config objects); must be set before the first tensorflow import
# anywhere in the test process (tests/test_tf_oracle_backbone.py).
os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')

xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# Note: the JAX_PLATFORMS env var is not reliable under the axon TPU plugin;
# the config update is what actually forces the host platform.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
