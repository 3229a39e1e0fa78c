"""Multi-host runtime: distributed init + per-host data sharding.

The reference is single-process/single-GPU; scaling across TPU pod hosts
needs (SURVEY.md §2.3):
  * ``jax.distributed.initialize`` (controller-less, env-driven),
  * per-host partitioning of the training cameras (each host feeds its
    local devices; the global batch is the concatenation),
  * helpers to build a global mesh and place host-local batches into a
    globally-sharded array (``jax.make_array_from_process_local_data``).

Single-host calls degrade to no-ops so the same entry points run
everywhere.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX if configured; returns process index.

    With no arguments and no cluster env (JAX_COORDINATOR_ADDRESS etc.),
    this is a no-op single-process setup."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes > 1 or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index()


def host_shard(items: Sequence, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> List:
    """Round-robin partition of a camera/file list across hosts.

    Round-robin (not contiguous blocks) keeps every host's shard spread
    over the full timestamp range, which matters for time-conditioned
    training batches."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items[pi::pc])


def global_mesh(n_data: Optional[int] = None, n_tile: int = 1) -> Mesh:
    """Mesh over ALL devices (across hosts): data-major, tile-minor."""
    devs = np.array(jax.devices())
    if n_data is None:
        n_data = devs.size // n_tile
    return Mesh(devs[:n_data * n_tile].reshape(n_data, n_tile),
                axis_names=("data", "tile"))


def make_global_batch(mesh: Mesh, local_batch):
    """Host-local [B_local, ...] pytree -> globally sharded [B_global, ...]
    arrays along the ``data`` axis."""
    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.tree_util.tree_map(place, local_batch)
