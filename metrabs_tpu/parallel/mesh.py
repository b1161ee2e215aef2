"""Device mesh and sharding helpers.

The reference's only parallelism is single-node data parallelism via
MirroredStrategy + ReductionToOneDevice (`metrabs_tf/main.py:160-163`,
SURVEY.md §2.10). The TPU-native equivalent: one `jax.sharding.Mesh` over the
ICI, batch axes sharded over 'data', parameters replicated, gradient
all-reduce inserted by XLA as psum over ICI. Multi-host extends the same mesh
over DCN via `jax.distributed.initialize` (no code change here — the mesh
just spans more devices).

A second 'model' mesh axis is exposed for sharding the head's output channels
(the (1+depth)*J conv — the widest matmul in the network) when a single
batch element must be split across chips; the reference has no analogous
mechanism (it is pure DP), so 'model'=1 is the parity configuration.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stream_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] stream layout: the per-dispatch K axis replicated, the
    frame-batch axis sharded over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Places every array in the tree with its leading axis sharded."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def tp_shardings(mesh: Mesh, tree, min_size: int = 2 ** 16):
    """Tensor-parallel shardings for a parameter/optimizer/state pytree.

    Rule: a leaf with ndim >= 2, at least `min_size` elements, and a last
    (output-channel) dimension divisible by the mesh's 'model' extent is
    sharded over MODEL_AXIS on that last dim; everything else (BN vectors,
    scalars, counts, small kernels) is replicated. Optimizer moments mirror
    parameter shapes, so applying the same rule to the whole TrainState
    gives them matching shardings with no per-field bookkeeping.

    XLA GSPMD propagates the rest: a conv kernel sharded on out-channels
    yields channel-sharded activations, and the all-gathers/reduce-scatters
    needed at layer boundaries are inserted by the compiler over ICI. The
    reference has no model parallelism at all (pure MirroredStrategy DP,
    `metrabs_tf/main.py:160-163`); 'model'=1 remains the parity default —
    this is the opt-in path for fitting larger backbones/batches per chip.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def sh(x):
        if (n_model > 1 and hasattr(x, 'ndim') and x.ndim >= 2
                and x.size >= min_size and x.shape[-1] % n_model == 0):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(sh, tree)
