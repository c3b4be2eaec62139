"""Solver data types (pytrees).

Counterparts of the reference's namedtuples and mutable module state
(`/root/reference/qpth/al_utils.py:8-13` QuadCost/LinDx;
`/root/reference/qpth/AL_mpc.py:569-591` lamda_prev/rho_prev/x_init/
u_init). State is an explicit immutable pytree threaded through the
solver — no module mutation — so the whole solve jits and shards.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class QuadCost(NamedTuple):
    """Diagonal-quadratic trajectory cost: sum_t 0.5 xu' diag(Q_t) xu + q_t' xu + f_t.

    Q: (bsz, T, n) diagonal entries; q: (bsz, T, n); f: (bsz, T).
    (The reference's diag fast path, `qpth/AL_mpc.py:249-250`.)
    """

    Q: Array
    q: Array
    f: Array


class LinDx(NamedTuple):
    """Linear(ized) dynamics x_{t+1} = F_t [x_t; u_t] + f_t.

    F: (bsz, T-1, nx, nx+nu); f: (bsz, T-1, nx).
    """

    F: Array
    f: Array


class ALState(NamedTuple):
    """Per-sample augmented-Lagrangian solver state (embarrassingly
    parallel across the batch — needs no cross-chip communication).

    lam: (bsz, ncon) duals [eq block first, then ineq];
    rho: (bsz, 1) penalty weight;
    x:   (bsz, T, nx) primal warm start (or None-like zeros);
    u:   (bsz, T, nu);
    has_init: (bsz,) bool — whether x/u hold a valid warm start.
    """

    lam: Array
    rho: Array
    x: Array
    u: Array
    has_init: Array

    @staticmethod
    def init(bsz: int, T: int, nx: int, nu: int, ncon: int, dtype=jnp.float32) -> "ALState":
        return ALState(
            lam=jnp.zeros((bsz, ncon), dtype),
            rho=jnp.ones((bsz, 1), dtype),
            x=jnp.zeros((bsz, T, nx), dtype),
            u=jnp.zeros((bsz, T, nu), dtype),
            has_init=jnp.zeros((bsz,), bool),
        )
