"""Flax building blocks for the DEQ layers.

Trunk cells mirror the reference architectures
(`/root/reference/deqmpc/deq_layer.py:113-130` deq_layer, :160-264
input/output layers): an "mlp" trunk (Linear + LayerNorm residual
cell on a flat hidden state) and a "gcn" trunk (Conv1d over the
horizon axis with GroupNorm, acting on per-knot-point embeddings).
Layout is feature-last (B, T-1, C) — the idiomatic XLA layout — with
convs over the time axis.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class UnfoldConv(nn.Module):
    """Conv1d(k, SAME) as unfold + ONE matmul: (B, L, k*Cin) @ (k*Cin,
    Cout). Param shapes/names match nn.Conv ('kernel' (k, Cin, Cout),
    'bias'), so checkpoints are interchangeable. At the trunk's tiny
    spatial extent (L = T-1 = 4..9) XLA's conv path is overhead-bound
    on TPU; a single MXU matmul over the stacked neighborhood is the
    speed-of-light shape. Zero-pad neighbors are built with pads/
    concats only (no gather/scatter)."""

    features: int
    kernel_width: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_width
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        lo = (k - 1) // 2
        z = jnp.zeros(x.shape[:-2] + (1, cin), x.dtype)
        shifts = []
        for off in range(-lo, k - 1 - lo + 1):
            if off < 0:
                s = jnp.concatenate([jnp.repeat(z, -off, axis=-2),
                                     x[..., : x.shape[-2] + off, :]], axis=-2)
            elif off > 0:
                s = jnp.concatenate([x[..., off:, :],
                                     jnp.repeat(z, off, axis=-2)], axis=-2)
            else:
                s = x
            shifts.append(s)
        stacked = jnp.concatenate(shifts, axis=-1).astype(dt)
        w = kernel.reshape(k * cin, self.features).astype(dt)
        return stacked @ w + bias.astype(dt)


def get_act(name: str):
    if name == "relu":
        return nn.relu
    if name == "mish":
        # x * tanh(softplus(x)) — the reference's history variants use
        # Mish cells (`deq_layer.py:561-597`)
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    raise ValueError(name)


class MLPCell(nn.Module):
    """z' = ln3(relu(z + ln2(x + fc2(ln1(relu(fc1(z)))))))
    (`deq_layer.py:113-119`).

    `dtype` is the MATMUL compute dtype (bf16 runs the MXU at full
    rate); params and the norm statistics stay f32 — flax norms with
    dtype=None promote to the f32 param dtype automatically."""

    hdim: int
    expand: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x_inj: Array, z: Array) -> Array:
        y = nn.Dense(self.hdim * self.expand, dtype=self.dtype)(z)
        y = nn.relu(y)
        y = nn.LayerNorm()(y)
        out = nn.LayerNorm()(
            nn.relu(z + nn.LayerNorm()(
                x_inj + nn.Dense(self.hdim, dtype=self.dtype)(y)))
        )
        return out


class ConvCell(nn.Module):
    """gcn trunk cell: Conv1d residual cell over the horizon axis with
    GroupNorm (`deq_layer.py:120-127`). Operates on (B, L, C)."""

    hdim: int
    expand: int = 4
    kernel_width: int = 3
    num_groups: int = 4
    dtype: Any = None  # matmul compute dtype; norms/params stay f32

    @nn.compact
    def __call__(self, x_inj: Array, z: Array) -> Array:
        y = UnfoldConv(self.hdim * self.expand, name="Conv_0",
                       kernel_width=self.kernel_width, dtype=self.dtype)(z)
        y = nn.relu(y)
        y = nn.GroupNorm(num_groups=self.num_groups)(y)
        out = nn.GroupNorm(num_groups=self.num_groups)(
            nn.relu(
                z
                + nn.GroupNorm(num_groups=self.num_groups)(
                    x_inj + UnfoldConv(self.hdim, name="Conv_1",
                                       kernel_width=self.kernel_width,
                                       dtype=self.dtype)(y)
                )
            )
        )
        return out


class MLPInput(nn.Module):
    """inp = LayerNorm(Dense(x_flat)) (`deq_layer.py:162-168`)."""

    hdim: int

    @nn.compact
    def __call__(self, x_flat: Array) -> Array:
        return nn.LayerNorm()(nn.Dense(self.hdim)(x_flat))


class ConvInput(nn.Module):
    """gcn input encoder (`deq_layer.py:171-206`): per-node embedding of
    the trajectory, x0 embedding broadcast over knots, learned time
    embedding, optional extra streams (memory, iteration embedding),
    fused by two convs + GroupNorm."""

    hdim: int
    horizon: int  # T-1 knot points
    kernel_width: int = 3
    num_groups: int = 4
    dtype: Any = None  # matmul compute dtype; norms/params stay f32

    @nn.compact
    def __call__(self, x_nodes: Array, obs: Array, extra: Sequence[Array] = ()) -> Array:
        # x_nodes: (B, T-1, nx); obs: (B, obs_dim)
        node_emb = nn.Sequential(
            [nn.Dense(self.hdim, dtype=self.dtype), nn.LayerNorm(), nn.relu]
        )(x_nodes)
        x0_emb = nn.Sequential(
            [nn.Dense(self.hdim, dtype=self.dtype), nn.LayerNorm(), nn.relu]
        )(obs)
        x0_emb = jnp.broadcast_to(
            x0_emb[:, None], (obs.shape[0], self.horizon, self.hdim)
        )
        t_emb = self.param(
            "time_emb", nn.initializers.normal(1.0), (self.horizon, self.hdim)
        )
        t_emb = jnp.broadcast_to(t_emb[None], x0_emb.shape)
        streams = [node_emb, x0_emb, t_emb, *extra]
        inp = jnp.concatenate(streams, axis=-1)
        inp = UnfoldConv(self.hdim * 4, name="Conv_0",
                         kernel_width=self.kernel_width,
                         dtype=self.dtype)(inp)
        inp = nn.relu(inp)
        inp = UnfoldConv(self.hdim, name="Conv_1",
                         kernel_width=self.kernel_width,
                         dtype=self.dtype)(inp)
        inp = nn.GroupNorm(num_groups=self.num_groups)(inp)
        return inp


class MLPOutput(nn.Module):
    """out = Dense(z) (`deq_layer.py:243-247`)."""

    out_dim: int

    @nn.compact
    def __call__(self, z: Array) -> Array:
        return nn.Dense(self.out_dim)(z)


class ConvOutput(nn.Module):
    """gcn output head (`deq_layer.py:248-254`)."""

    out_dim: int
    hdim: int
    kernel_width: int = 3
    num_groups: int = 4
    dtype: Any = None  # matmul compute dtype; norms/params stay f32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        y = UnfoldConv(self.hdim, name="Conv_0",
                       kernel_width=self.kernel_width, dtype=self.dtype)(z)
        y = nn.GroupNorm(num_groups=self.num_groups)(y)
        y = nn.relu(y)
        # the head's final projection stays f32: its output feeds the
        # solver's reference trajectory directly
        return UnfoldConv(self.out_dim, name="Conv_1", kernel_width=1)(y)


class GatedResidual(nn.Module):
    """Memory update block (`deq_layer_utils.py:87-118`). NOTE: the
    reference's forward returns `z` (the gate/residual branches are
    computed but bypassed, :106-110); we implement the gated update and
    expose `bypass` for exact reference parity."""

    dim: int
    bypass: bool = True

    @nn.compact
    def __call__(self, mem: Array, z: Array) -> Array:
        if self.bypass:
            return z
        mz = jnp.concatenate([mem, z], axis=-1)
        gate = nn.Sequential(
            [nn.Dense(2 * self.dim), nn.LayerNorm(epsilon=1e-3), nn.relu,
             nn.Dense(self.dim), nn.LayerNorm(epsilon=1e-3), nn.sigmoid]
        )(mz)
        res = nn.Sequential(
            [nn.Dense(2 * self.dim), nn.LayerNorm(epsilon=1e-3), nn.relu,
             nn.Dense(self.dim), nn.LayerNorm(epsilon=1e-3)]
        )(mz)
        return mem * (1 - gate) + res * gate
