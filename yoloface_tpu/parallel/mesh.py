"""Device-mesh and sharding utilities — the framework's parallelism layer.

The reference is a single-MCU superloop whose only concurrency is DMA
double-buffering (SURVEY.md §2c); the workload is embarrassingly parallel
per frame.  The honest TPU-native scaling axis is therefore **data
parallelism over frames/batch**, expressed as a 1-D ``jax.sharding.Mesh``
with XLA collectives riding ICI — no NCCL/MPI analogue is needed.  These
helpers centralize mesh construction and batch/replicated sharding specs for
both the inference pipeline and the trainer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host array (or pytree) batch-sharded onto the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) onto every mesh device."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


# --------------------------------------------------------------------------
# multi-host (DCN) entry points — design in docs/MULTICHIP.md
# --------------------------------------------------------------------------
def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Mesh:
    """Initialize multi-host JAX (one process per host over DCN) and return
    the global 1-D data mesh spanning every chip of every host.

    Single-process call (all args None) is a no-op initialize and returns
    the local mesh — so the same entry point serves 1 host or N hosts.
    Collectives inside a batch stay on ICI; only once the mesh spans hosts
    does the gradient all-reduce ride DCN (see docs/MULTICHIP.md).
    """
    if coordinator_address is not None:
        try:
            # CPU-backend cross-process collectives need gloo (harmless
            # for TPU, whose collectives ride ICI/DCN natively); validated
            # by tools/dcn_smoke.py
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return make_mesh()


def global_batch_from_host_local(local_batch, mesh: Mesh):
    """Assemble a process-local numpy batch into a global batch-sharded
    array: each host contributes its own frames (its own camera streams),
    concatenated logically along the batch axis — the multi-host analogue
    of shard_batch."""
    s = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        local_batch)
