"""Solver utilities: rollouts, costs, gradient checkers.

Counterpart of the live parts of the reference's `qpth/util.py`
(bmv/bquad batched helpers :88-103 — obviated by jnp broadcasting;
`get_traj`/`get_cost` rollouts :150-202; `check_fd_grads`/`check_grads`
finite-difference checkers :715-757 — the de-facto test oracles,
SURVEY.md §4). The dead legacy JIIO solvers (:232-717) are not
reproduced.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .types import LinDx, QuadCost

Array = jax.Array


def get_traj(T: int, u: Array, x_init: Array, dynamics) -> Array:
    """Roll controls through (possibly linear) dynamics
    (`util.py:150-177`). u: (bsz, T, nu); returns x: (bsz, T, nx)."""
    if isinstance(dynamics, LinDx):
        F, f = dynamics.F, dynamics.f

        def step(x, t):
            xu = jnp.concatenate([x, u[:, t]], axis=-1)
            xn = jnp.einsum("bij,bj->bi", F[:, t], xu) + f[:, t]
            return xn, xn

        _, xs = jax.lax.scan(step, x_init, jnp.arange(T - 1))
    else:
        def step(x, t):
            xn = dynamics(x, u[:, t])
            return xn, xn

        _, xs = jax.lax.scan(step, x_init, jnp.arange(T - 1))
    xs = jnp.moveaxis(xs, 0, 1)
    return jnp.concatenate([x_init[:, None], xs], axis=1)


def get_cost(T: int, u: Array, cost: QuadCost, dynamics=None,
             x_init: Array = None, x: Array = None) -> Array:
    """Total trajectory cost (`util.py:180-202`)."""
    if x is None:
        x = get_traj(T, u, x_init, dynamics)
    xu = jnp.concatenate([x, u], axis=-1)
    c = 0.5 * jnp.sum(xu * cost.Q * xu, axis=-1) + jnp.sum(cost.q * xu, axis=-1)
    return jnp.sum(c, axis=-1)


def check_fd_grads(f: Callable, x: Array, eps: float = 1e-5,
                   rtol: float = 1e-3, atol: float = 1e-5) -> Tuple[Array, Array]:
    """Compare jax.grad(f) against central finite differences
    (`util.py:715-740`). f: scalar function of x. Returns (g, g_fd)."""
    import numpy as np

    g = jax.grad(f)(x)
    g_fd = np.zeros_like(np.asarray(x), dtype=np.float64)
    for idx in np.ndindex(*x.shape):
        dx = jnp.zeros_like(x).at[idx].set(eps)
        g_fd[idx] = (float(f(x + dx)) - float(f(x - dx))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=rtol, atol=atol)
    return g, jnp.asarray(g_fd)
