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
