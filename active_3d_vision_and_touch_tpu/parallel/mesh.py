"""Device-mesh and sharding utilities.

The reference framework is single-GPU (no torch.distributed / NCCL / MPI
anywhere — see SURVEY.md §2.4); this module is where the TPU rebuild goes
beyond it.  Training data-parallelizes over ICI: a 1-D mesh over all local
chips, batches sharded on the leading axis, parameters replicated.  Under
``jit`` XLA inserts the gradient all-reduce over ICI automatically from the
output shardings — no hand-written collectives needed at this model scale.

Multi-host runs add an outer DCN axis (:func:`hybrid_mesh`): the mesh is
(hosts, chips-per-host) so XLA's hierarchical all-reduce keeps the heavy
reduce-scatter/all-gather phases on ICI and crosses DCN once with the
already-reduced shards.  :func:`maybe_init_distributed` wires
``jax.distributed`` from the standard coordinator environment variables and
is a no-op in single-process runs, so the same engine code serves both.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"
DCN_AXIS = "dcn"


def maybe_init_distributed() -> bool:
    """Initialize ``jax.distributed`` when a coordinator is configured
    (JAX_COORDINATOR_ADDRESS or the TPU pod runtime provides one); no-op —
    returning False — for single-process runs so every entry point can call
    this unconditionally."""
    if jax.process_count() > 1:
        return True  # already initialized
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def data_parallel_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (BATCH_AXIS,))


def hybrid_mesh(
    dcn: int | None = None, ici: int | None = None, devices=None
) -> Mesh:
    """2-D ('dcn', 'dp') mesh: outer axis across hosts (data-center
    network), inner axis over each host's chips (ICI).  In a real pod the
    outer dimension equals ``jax.process_count()`` so each row is one
    host's local devices; in a single process it still builds (useful for
    dryruns on virtual devices).  Batches shard over BOTH axes (see
    :func:`batch_sharding`); parameters stay replicated."""
    if devices is None:
        devices = jax.devices()
    if dcn is None:
        dcn = max(jax.process_count(), 1)
    if ici is None:
        ici = len(devices) // dcn
    devices = np.asarray(devices[: dcn * ici]).reshape(dcn, ici)
    return Mesh(devices, (DCN_AXIS, BATCH_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding that splits the leading (batch) axis over every mesh axis —
    a 1-D mesh gives the original ICI DP; a ('dcn','dp') mesh splits the
    global batch host-major so each host's examples live on its chips."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names), *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf of a batch pytree with its leading axis
    sharded; non-numeric leaves (names, metadata strings) pass through.

    Multi-process: each process passes its LOCAL slice of the global batch
    (use ``Loader(..., process_shard=...)``) and the leaves are assembled
    into global arrays via ``jax.make_array_from_process_local_data``."""
    multiprocess = jax.process_count() > 1

    def put(x):
        if isinstance(x, (str, bytes)) or x is None:
            return x
        if multiprocess:
            return jax.make_array_from_process_local_data(
                batch_sharding(mesh, np.ndim(x)), np.asarray(x)
            )
        x = jax.numpy.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), sharding), tree
    )
