"""1-D data-parallel mesh over all chips.

The reference is single-GPU (SURVEY.md §2.2: no torch.distributed /
DataParallel anywhere); data parallelism is the one axis this workload
needs (the model is ~48M params, replicated).  Design:

- a 1-D `jax.sharding.Mesh` over all visible devices, axis 'data';
- batches sharded on the leading axis via NamedSharding; parameters and
  optimizer state replicated;
- the train step is a plain `jax.jit` over sharded inputs: XLA inserts
  the gradient all-reduce (psum over ICI) automatically, and BatchNorm's
  batch-mean reductions become *global* (cross-chip) means — i.e. exact
  sync-BN, matching the reference's single-device full-batch statistics
  at any device count;
- multi-host: `initialize_distributed` wires `jax.distributed`; each
  host feeds its local shard of the batch (addressable devices only).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a host batch dict with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.device_put(batch, sharding)


def put_global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a global batch from this process's local shard.

    Single-process: a plain sharded device_put.  Multi-process (after
    `initialize_distributed`): every process holds a disjoint per-host
    batch (SemiSupervisedBatcher strided shards) and
    `jax.make_array_from_process_local_data` stitches them into one
    global jax.Array sharded over the full mesh — a bare device_put of
    per-host data cannot build a global array across hosts.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def local_rows(global_array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in feed order.

    `make_array_from_process_local_data` places each process's local data
    on its own devices; concatenating the addressable shards sorted by
    their global row offset recovers exactly the rows this process fed.
    """
    shards = sorted(
        global_array.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (no-op single-host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
