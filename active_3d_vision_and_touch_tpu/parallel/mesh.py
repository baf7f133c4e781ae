"""Device-mesh and sharding utilities.

The reference framework is single-GPU (no torch.distributed / NCCL / MPI
anywhere — see SURVEY.md §2.4); this module is where the TPU rebuild goes
beyond it.  Training data-parallelizes over ICI: a 1-D mesh over all local
chips, batches sharded on the leading axis, parameters replicated.  Under
``jit`` XLA inserts the gradient all-reduce over ICI automatically from the
output shardings — no hand-written collectives needed at this model scale.

Larger meshes (multi-host DCN axis) compose by passing an explicit device
array to :func:`data_parallel_mesh`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"


def data_parallel_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding that splits the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(BATCH_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf of a batch pytree with its leading axis
    sharded; non-numeric leaves (names, metadata strings) pass through."""

    def put(x):
        if isinstance(x, (str, bytes)) or x is None:
            return x
        x = jax.numpy.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), sharding), tree
    )
