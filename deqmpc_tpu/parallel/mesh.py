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
