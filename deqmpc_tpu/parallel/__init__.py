"""Multi-chip / multi-host parallelism (SURVEY.md §2.4).

The reference is single-GPU; all its parallelism is the batch axis.
The TPU-native scale-out shards exactly that axis over a
`jax.sharding.Mesh`: per-sample solver state (duals, penalties,
best-iterate masks, factorizations) is embarrassingly parallel, so
the only collectives in a training step are XLA's automatic gradient
all-reduce over the data axis and any metric reductions — which is
what makes near-linear scaling achievable.

Usage:
    mesh = make_mesh()                          # 1-D data mesh
    batch = shard_batch(batch, mesh)            # split batch over chips
    params = replicate(params, mesh)
    train_step = jax.jit(step, in_shardings=..., out_shardings=...)
"""
from .mesh import (batch_sharding, initialize_multihost, make_mesh,
                   replicate, replicate_local, replicated_sharding,
                   shard_batch, shard_batch_local)

__all__ = [
    "batch_sharding",
    "initialize_multihost",
    "make_mesh",
    "replicate",
    "replicate_local",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_local",
]
