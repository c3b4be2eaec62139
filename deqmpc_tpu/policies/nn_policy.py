"""Plain behavior-cloning policy (reference `NNPolicy`,
`policies.py:1379-1447`): an MLP mapping the current state to a
T-step trajectory (actions / states / both / configurations, selected
by out_type), trained with the same masked imitation loss."""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class _Trunk(nn.Module):
    hdim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.relu(nn.LayerNorm()(nn.Dense(self.hdim)(x)))
        return nn.Dense(self.out_dim)(x)


class NNPolicy:
    def __init__(self, nx: int, nu: int, nq: int, T: int, dt: float,
                 hdim: int = 128, out_type: int = 1, loss_type: str = "l1"):
        self.nx, self.nu, self.nq, self.T, self.dt = nx, nu, nq, T, dt
        self.out_type = out_type
        self.loss_type = loss_type
        self.deq_reg = 0.0
        if out_type == 0:
            out_dim = nu * T
        elif out_type == 1:
            out_dim = nx * T
        elif out_type == 2:
            out_dim = (nx + nu) * T
        elif out_type == 3:
            out_dim = nq * T
        else:
            raise ValueError(out_type)
        self.net = _Trunk(hdim=hdim, out_dim=out_dim)

    def init(self, rng):
        return self.net.init(rng, jnp.zeros((1, self.nx)))

    def __call__(self, params, x: Array) -> Tuple[Optional[Array], Optional[Array]]:
        """Returns (states, actions) like the reference (either may be
        None depending on out_type)."""
        bsz = x.shape[0]
        out = self.net.apply(params, x)
        T, nx, nu, nq = self.T, self.nx, self.nu, self.nq
        if self.out_type == 0:
            return None, out.reshape(bsz, T, nu)
        if self.out_type == 1:
            return out.reshape(bsz, T, nx), None
        if self.out_type == 2:
            states = out[:, : nx * T].reshape(bsz, T, nx)
            actions = out[:, nx * T :].reshape(bsz, T, nu)
            return states, actions
        # out_type == 3: configurations; velocities by finite differences
        pos = out.reshape(bsz, T, nq)
        vel = (pos[:, 1:] - pos[:, :-1]) / self.dt
        vel = jnp.concatenate([vel, vel[:, -1:]], axis=1)
        return jnp.concatenate([pos, vel], axis=-1), None
