"""RexQuadrotor: 12-D quadrotor with MRP attitude, body-frame velocity.

Same physical model as the reference (`/root/reference/deqmpc/
rex_quadrotor.py:52-127`): state x = [r(3) world pos, p(3) MRP,
v(3) body vel, w(3) body rates]; 4 rotor throttles; thrust
F_i = kf*u_i + bf along body z; yaw moments km*u with alternating
signs; RK4 integration. Written as an unbatched pure jnp function —
batching via `vmap`, Jacobians via `jacfwd` (the reference needed a
repeat/identity-mask autograd trick, `rex_quadrotor.py:136-144`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Spaces
from ..utils.rotations import (euler_to_quaternion, mrp2quat, quat2mrp,
                               quatrot, rk4, w2pdotkinematics_mrp)
from .base import Env


class RexQuadrotor(Env):
    def __init__(self, bsz: int = 1, mass: float = 2.0,
                 J=((0.01566089, 0.00000318037, 0.0),
                    (0.00000318037, 0.01562078, 0.0),
                    (0.0, 0.0, 0.02226868)),
                 gravity=(0.0, 0.0, -9.81), motor_dist: float = 0.28,
                 kf: float = 0.0244101, bf: float = -30.48576,
                 km: float = 0.00029958, bm: float = -0.367697,
                 max_steps: int = 100, dt: float = 0.05, device=None):
        self.nx, self.nu, self.nq = 12, 4, 7
        self.dt = dt
        self.mass = mass
        self.J = np.asarray(J, dtype=np.float64)
        self.Jinv = np.linalg.inv(self.J)
        self.gvec = np.asarray(gravity, dtype=np.float64)
        self.motor_dist = motor_dist
        self.kf, self.bf, self.km, self.bm = kf, bf, km, bm
        self.act_scale = 100.0
        self._max_episode_steps = max_steps
        self.spec_id = "RexQuadrotor-v0"
        # motor positions on the diagonals (unit vectors * motor_dist)
        ss = np.array([[1.0, 1, 0], [1.0, -1, 0], [-1.0, -1, 0], [-1.0, 1, 0]])
        self.ss = ss / np.linalg.norm(ss, axis=-1, keepdims=True)
        self.u_hover = float((-mass * gravity[2] - bf * 4) / self.act_scale / kf / 4)
        self.u_trim = self.u_hover  # raw rotor command that hovers
        self.Qlqr = np.array([10.0] * 6 + [1.0] * 6, dtype=np.float64)
        self.Rlqr = np.full(4, 1e-8, dtype=np.float64)
        self.observation_space = Spaces(np.full(12, -np.inf), np.full(12, np.inf))
        self.action_space = Spaces(np.full(4, 11.5), np.full(4, 18.3))
        self.x_window = np.array(
            [5.0, 5.0, 5.0] + [np.deg2rad(70)] * 3 + [0.5] * 3 + [0.25] * 3
        )
        self.targ_pos = np.zeros(12)

    # -- continuous-time physics ---------------------------------------------
    def _forces(self, p, u):
        """Total body-frame force: rotor thrust (z) + gravity rotated
        into the body frame."""
        q_inv = mrp2quat(-p)
        thrust = self.kf * jnp.sum(u) + 4.0 * self.bf
        F = jnp.array([0.0, 0.0, 1.0]) * thrust
        return F + quatrot(q_inv, self.mass * jnp.asarray(self.gvec))

    def _moments(self, u):
        thrust_z = self.kf * u + self.bf  # per-rotor thrust along body z
        yaw = self.km * (u[0] - u[1] + u[2] - u[3])
        arms = self.motor_dist * jnp.asarray(self.ss)  # (4, 3)
        thrust_vecs = jnp.zeros((4, 3)).at[:, 2].set(thrust_z)
        tau = jnp.sum(jnp.cross(arms, thrust_vecs), axis=0)
        return tau.at[2].add(yaw)

    def _xdot(self, x, u):
        u = self.act_scale * u
        r, p, v, w = x[:3], x[3:6], x[6:9], x[9:12]
        q = mrp2quat(p)
        F = self._forces(p, u)
        tau = self._moments(u)
        rdot = quatrot(q, v)
        pdot = w2pdotkinematics_mrp(p, w)
        vdot = F / self.mass - jnp.cross(w, v)
        Jw = jnp.asarray(self.J) @ w
        wdot = jnp.asarray(self.Jinv) @ (tau - jnp.cross(w, Jw))
        return jnp.concatenate([rdot, pdot, vdot, wdot])

    def _dynamics_single(self, x, u):
        return rk4(self._xdot, x, u, self.dt)

    # -- gym API --------------------------------------------------------------
    def reward(self, x, u):
        cost = jnp.sum((x - jnp.asarray(self.targ_pos)) ** 2 * jnp.asarray(self.Qlqr) / 2, axis=-1) / 100
        cost = cost + jnp.sum(u**2 * jnp.asarray(self.Rlqr) / 2, axis=-1) / 10
        return jnp.where(cost > 500, -cost, jnp.exp(-cost / 2 + 2))

    def reset(self, rng, bsz, x_window=None):
        """`x_window` overrides the default half-widths (reference
        parity: `rex_quadrotor.py:260-270` reset(bsz, x_window))."""
        w = jnp.asarray(self.x_window if x_window is None else x_window)
        x = jax.random.uniform(rng, (bsz, 12), minval=-w, maxval=w)
        mrp = quat2mrp(euler_to_quaternion(x[:, 3:6]))
        return jnp.concatenate([x[:, :3], mrp, x[:, 6:]], axis=-1)

    def is_bad_state(self, x, reward):
        return jnp.logical_or(super().is_bad_state(x, reward), reward < -500)
