"""Pendulum and double-integrator environments.

Reconstructs the reference's missing ``deqmpc/envs.py`` (``PendulumEnv``,
``IntegratorEnv``), whose interface is fixed by its call sites
(`/root/reference/deqmpc/train.py:12,177-182`): constructor flag
``stabilization``, attributes ``nx/nu/nq/dt/Qlqr/Rlqr/action_space``,
and `dynamics`/`dynamics_derivatives` used by `Tracking_MPC`.

Angle convention: theta = 0 hanging down, upright target theta = pi,
wrapped to [0, 2*pi) — consistent with the reference's
``angle_normalize_2pi`` convention (`flying_cartpole2d.py:8-9`) and
FlyingCartpole's upright target (`flying_cartpole2d.py:174-175`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Spaces
from ..utils.rotations import angle_normalize_2pi, rk4
from .base import Env


class PendulumEnv(Env):
    """Torque-limited pendulum swing-up (or stabilization)."""

    def __init__(self, stabilization: bool = False, dt: float = 0.05,
                 m: float = 1.0, l: float = 1.0, g: float = 10.0,
                 max_torque: float = 2.0, max_speed: float = 8.0):
        self.nx, self.nu, self.nq = 2, 1, 1
        self.dt = dt
        self.m, self.l, self.g = m, l, g
        self.max_torque = max_torque
        self.max_speed = max_speed
        self.stabilization = stabilization
        self._max_episode_steps = 200
        self.spec_id = "Pendulum-v0" + ("-stabilize" if stabilization else "")
        self.observation_space = Spaces(
            low=np.array([-np.inf, -max_speed]), high=np.array([np.inf, max_speed])
        )
        self.action_space = Spaces(
            low=np.array([-max_torque]), high=np.array([max_torque])
        )
        self.Qlqr = np.array([10.0, 1.0], dtype=np.float64)
        self.Rlqr = np.array([1e-6], dtype=np.float64)
        self.targ_pos = np.array([np.pi, 0.0])

    def _dynamics_single(self, x, u):
        theta, thetadot = x[0], x[1]

        def xdot(state, uu):
            th, thd = state[0], state[1]
            # theta measured from hanging-down: thdd = -(g/l) sin(th) + u/(m l^2)
            thdd = -(self.g / self.l) * jnp.sin(th) + uu[0] / (self.m * self.l**2)
            return jnp.stack([thd, thdd])

        return rk4(xdot, jnp.stack([theta, thetadot]), u, self.dt)

    def state_clip(self, x):
        wrapped = angle_normalize_2pi(x[..., 0])
        return jnp.stack([wrapped, jnp.clip(x[..., 1], -self.max_speed, self.max_speed)], axis=-1)

    def reward(self, x, u):
        dth = jnp.abs(x[..., 0] - jnp.pi)
        dth = jnp.minimum(dth, 2 * jnp.pi - dth)
        return -(dth**2 + 0.1 * x[..., 1] ** 2 + 0.001 * jnp.sum(u**2, axis=-1))

    def reset(self, rng, bsz):
        if self.stabilization:
            lo = jnp.array([jnp.pi - 0.2, -0.2])
            hi = jnp.array([jnp.pi + 0.2, 0.2])
        else:
            lo = jnp.array([0.0, -1.0])
            hi = jnp.array([2 * jnp.pi, 1.0])
        return jax.random.uniform(rng, (bsz, self.nx), minval=lo, maxval=hi)


class IntegratorEnv(Env):
    """Double integrator: x = (p, v), pdot = v, vdot = u."""

    def __init__(self, dt: float = 0.1):
        self.nx, self.nu, self.nq = 2, 1, 1
        self.dt = dt
        self._max_episode_steps = 100
        self.spec_id = "Integrator-v0"
        self.observation_space = Spaces(low=np.full(2, -np.inf), high=np.full(2, np.inf))
        self.action_space = Spaces(low=np.array([-1.0]), high=np.array([1.0]))
        self.Qlqr = np.array([1.0, 1.0], dtype=np.float64)
        self.Rlqr = np.array([1e-4], dtype=np.float64)
        self.targ_pos = np.zeros(2)

    def _dynamics_single(self, x, u):
        p, v = x[0], x[1]
        return jnp.stack([p + self.dt * v + 0.5 * self.dt**2 * u[0], v + self.dt * u[0]])

    def reward(self, x, u):
        return -(jnp.sum(x**2, axis=-1) + 0.01 * jnp.sum(u**2, axis=-1))

    def reset(self, rng, bsz):
        return jax.random.uniform(rng, (bsz, self.nx), minval=-2.0, maxval=2.0)
