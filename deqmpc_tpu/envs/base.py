"""Environment base: pure-function dynamics + derivatives + rollout API.

The reference wires environments into the optimizer through exactly two
callables (`/root/reference/deqmpc/policies.py:1126-1127`):

    dyn(x, u) -> x_next                      # discrete dynamics
    dyn_jac(x, u) -> (x_next, (Jx, Ju))      # + analytic Jacobians

and into training through gym-style ``reset``/``step`` plus the
attributes ``nx, nu, nq, dt, Qlqr, Rlqr, action_space``
(`/root/reference/deqmpc/my_envs/cartpole.py:40-85`).

TPU-native design: dynamics are pure jnp functions of ``(x, u)`` that
broadcast over arbitrary leading batch dims; Jacobians come from
``vmap(jacfwd)`` instead of the reference's CasADi->C->pybind pipeline
(`my_envs/*/src/*.c*`) or its repeat/identity-mask autograd trick
(`rex_quadrotor.py:136-144`). A finite-difference oracle is kept as a
*test* utility, mirroring the reference's de-facto correctness checks
(`my_envs/dynamics.py:110-247`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class Env:
    """Base class: subclasses define `_dynamics_single(x, u) -> x_next`
    on unbatched arrays; batching/Jacobians/rollouts are derived here."""

    nx: int
    nu: int
    nq: int
    dt: float
    spec_id: str = "Env-v0"
    _max_episode_steps: int = 200
    # trim action (holds the target equilibrium) in *raw* action
    # coordinates — nonzero only where the env does not already add a
    # hover offset inside its dynamics (RexQuadrotor takes raw rotor
    # commands, `rex_quadrotor.py:118-121`; FlyingCartpole adds
    # u_hover internally, `flying_cartpole2d.py:113`)
    u_trim: float = 0.0

    # -- core dynamics -------------------------------------------------------
    def _dynamics_single(self, x: Array, u: Array) -> Array:
        raise NotImplementedError

    def dynamics(self, x: Array, u: Array) -> Array:
        """Discrete dynamics, broadcasting over any leading batch dims."""
        flat_x = x.reshape(-1, self.nx)
        flat_u = u.reshape(-1, self.nu)
        out = jax.vmap(self._dynamics_single)(flat_x, flat_u)
        return out.reshape(*x.shape[:-1], self.nx)

    def dynamics_derivatives(self, x: Array, u: Array) -> Tuple[Array, Tuple[Array, Array]]:
        """Returns (x_next, (Jx, Ju)) with Jx: (..., nx, nx), Ju: (..., nx, nu).

        Same contract as the reference bridge
        (`my_envs/dynamics.py:249-259`), computed with one fused
        jacfwd evaluation (forward-mode is optimal for nx+nu input dims
        at these sizes and shares the primal computation).
        """
        flat_x = x.reshape(-1, self.nx)
        flat_u = u.reshape(-1, self.nu)

        def f(xu):
            return self._dynamics_single(xu[: self.nx], xu[self.nx :])

        def jac_one(xi, ui):
            xu = jnp.concatenate([xi, ui])
            J = jax.jacfwd(f)(xu)
            return f(xu), J

        x_next, J = jax.vmap(jac_one)(flat_x, flat_u)
        Jx = J[..., : self.nx].reshape(*x.shape[:-1], self.nx, self.nx)
        Ju = J[..., self.nx :].reshape(*x.shape[:-1], self.nx, self.nu)
        return x_next.reshape(*x.shape[:-1], self.nx), (Jx, Ju)

    def finite_diff_derivatives(self, x: Array, u: Array, eps: float = 1e-6):
        """Central-difference Jacobian oracle (test-only; reference
        `my_envs/dynamics.py:110-247`)."""
        nx, nu = self.nx, self.nu

        def one(xi, ui):
            def fd(idx):
                dx = jnp.zeros(nx + nu).at[idx].set(eps)
                xp = self._dynamics_single(xi + dx[:nx], ui + dx[nx:])
                xm = self._dynamics_single(xi - dx[:nx], ui - dx[nx:])
                return (xp - xm) / (2 * eps)

            return jax.vmap(fd)(jnp.arange(nx + nu)).T

        J = jax.vmap(one)(x.reshape(-1, nx), u.reshape(-1, nu))
        return (
            J[..., :nx].reshape(*x.shape[:-1], nx, nx),
            J[..., nx:].reshape(*x.shape[:-1], nx, nu),
        )

    # -- gym-style API (functional: state passed explicitly) -----------------
    def reset(self, rng: Array, bsz: int) -> Array:
        raise NotImplementedError

    def reward(self, x: Array, u: Array) -> Array:
        raise NotImplementedError

    def step(self, x: Array, u: Array):
        """Functional step: (x, u) -> (x_next, reward, info). NaN/Inf
        handling is the caller's job via `is_bad_state` (the reference's
        auto-reset in `rex_quadrotor.py:182-214` is stateful; here the
        rollout loop applies the mask)."""
        u = self.action_clip(u)
        x_next = self.state_clip(self.dynamics(x, u))
        return x_next, self.reward(x_next, u)

    def is_bad_state(self, x: Array, reward: Array) -> Array:
        bad = jnp.logical_or(
            jnp.any(jnp.isnan(x), axis=-1), jnp.any(jnp.isinf(x), axis=-1)
        )
        return jnp.logical_or(bad, jnp.logical_or(jnp.isnan(reward), jnp.isinf(reward)))

    def action_clip(self, u: Array) -> Array:
        lo = jnp.asarray(self.action_space.low)
        hi = jnp.asarray(self.action_space.high)
        return jnp.clip(u, lo, hi)

    def state_clip(self, x: Array) -> Array:
        return x

    # -- trajectory helpers --------------------------------------------------
    def rollout(self, x0: Array, us: Array) -> Array:
        """Roll out controls us: (..., T, nu) from x0: (..., nx) ->
        states (..., T+1, nx) using `lax.scan` (compile-friendly)."""

        def body(x, u):
            xn = self.dynamics(x, u)
            return xn, xn

        us_t = jnp.moveaxis(us, -2, 0)
        _, xs = jax.lax.scan(body, x0, us_t)
        xs = jnp.moveaxis(xs, 0, -2)
        return jnp.concatenate([x0[..., None, :], xs], axis=-2)
