"""Device mesh + sharding helpers for data-parallel DEQ-MPC.

Design (SURVEY.md §2.4): a 1-D (or 2-D chips x hosts) mesh with the
batch axis named "data". Parameters are replicated; batches, solver
state and all per-sample intermediate tensors shard along "data". XLA
inserts the psum for gradients automatically under jit when outputs
(updated params) are replicated — no manual collectives needed.

Multi-host: call `jax.distributed.initialize()` before building the
mesh; each host feeds its local shard (`jax.make_array_from_process_
local_data`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of (bsz, ...) arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        x = jnp.asarray(x)
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Join a multi-host run (PJRT over ICI/DCN). On TPU pods the
    arguments auto-detect from the environment; returns the process
    count. Call once, before any backend use / mesh construction."""
    if jax.process_count() == 1 and (coordinator_address or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
        )
    elif jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run (CPU tests, one chip)
    return jax.process_count()


def replicate_local(tree, mesh: Mesh):
    """Multi-host parameter replication: every process holds an
    identical full copy (e.g. same PRNG init) and contributes it as the
    replicated global array. Single-process, equivalent to `replicate`."""

    def put(x):
        return jax.make_array_from_process_local_data(
            replicated_sharding(mesh), np.asarray(x)
        )

    return jax.tree_util.tree_map(put, tree)


def shard_batch_local(batch, mesh: Mesh, axis_name: str = "data"):
    """Multi-host batch feeding: each process passes its LOCAL shard of
    the global batch (shape (global_bsz / process_count, ...)); returns
    global arrays sharded along the batch axis. Single-process, this is
    equivalent to `shard_batch`."""

    def put(x):
        x = np.asarray(x)
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x
        )

    return jax.tree_util.tree_map(put, batch)
