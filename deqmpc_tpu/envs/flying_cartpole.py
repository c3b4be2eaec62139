"""FlyingCartpole: quadrotor with an attached inverted pendulum (14-D).

Same model as the reference (`/root/reference/deqmpc/
flying_cartpole2d.py:11-133`): state x = [r(3), p(3 MRP), theta,
v(3 body), w(3 body), thetadot]; 4 throttles offset around hover
(u_actual = act_scale*(u + u_hover)); pendulum coupled through
theta_dd = (g sin(theta) + x_dd cos(theta)) / L; upright target
theta = pi. Optional obstacle field (N spheres) used by the
Obstacle-MPC constraint path — positions are generated from a fixed
PRNG seed rather than a hard-coded table (same capability as
`flying_cartpole2d.py:183-222`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Spaces
from ..utils.rotations import (angle_normalize_2pi, euler_to_quaternion,
                               mrp2quat, quat2mrp, quatrot, rk4,
                               w2pdotkinematics_mrp)
from .base import Env


class FlyingCartpole(Env):
    def __init__(self, bsz: int = 1, Qscale: float = 1.0, mass_q: float = 2.0,
                 mass_p: float = 0.1,
                 J=((0.0023, 0.0, 0.0), (0.0, 0.0023, 0.0), (0.0, 0.0, 0.004)),
                 L: float = 0.5, gravity=(0.0, 0.0, -9.81),
                 motor_dist: float = 0.175, kf: float = 1.0, km: float = 0.025,
                 max_steps: int = 100, dt: float = 0.05, device=None,
                 obstacles: bool = False, obstacle_radius: float = 0.25,
                 n_obstacles: int = 40, obstacle_seed: int = 0):
        self.nx, self.nu, self.nq = 14, 4, 7
        self.dt = dt
        self.mass = mass_q + mass_p
        self.L = L
        self.J = np.asarray(J, dtype=np.float64)
        self.Jinv = np.linalg.inv(self.J)
        self.gvec = np.asarray(gravity, dtype=np.float64)
        self.motor_dist = motor_dist
        self.kf, self.km = kf, km
        self.act_scale = 10.0
        self.u_hover = float(-self.mass * gravity[2] / self.act_scale / kf / 4)
        self._max_episode_steps = max_steps
        ss = np.array([[1.0, 1, 0], [1.0, -1, 0], [-1.0, -1, 0], [-1.0, 1, 0]])
        self.ss = ss / np.linalg.norm(ss, axis=-1, keepdims=True)
        self.Qlqr = np.array(
            [10.0] * 3 + [10.0] * 3 + [80.0] + [1.0 * Qscale] * 6 + [1.0 * Qscale],
            dtype=np.float64,
        )
        self.Rlqr = np.full(4, 1e-8, dtype=np.float64)
        ub = 0.3 * self.u_hover
        self.observation_space = Spaces(np.full(14, -np.inf), np.full(14, np.inf))
        self.action_space = Spaces(np.full(4, -ub), np.full(4, ub))
        self.x_window = np.array(
            [5.0, 5.0, 5.0] + [np.deg2rad(45)] * 3 + [np.pi] + [1.0] * 7
        )
        self.targ_pos = np.zeros(14)
        self.targ_pos[6] = np.pi  # upright pendulum
        self.obstacles = obstacles
        self.obstacle_radius = obstacle_radius
        if obstacles:
            rng = np.random.default_rng(obstacle_seed)
            pos = rng.uniform(-5.0, 5.0, size=(n_obstacles, 3))
            # keep a bubble around the origin free (start/goal region)
            norms = np.linalg.norm(pos, axis=-1, keepdims=True)
            pos = np.where(norms < 1.0, pos + np.sign(pos) * 1.0, pos)
            self.obstacle_positions = pos
            self.spec_id = f"FlyingCartpole-v1-obsr{obstacle_radius}"
        else:
            self.obstacle_positions = np.zeros((0, 3))
            self.spec_id = "FlyingCartpole-v0"

    # -- continuous-time physics ---------------------------------------------
    def _split(self, x):
        return x[:3], x[3:6], x[6], x[7:10], x[10:13], x[13]

    def _xdot(self, x, u):
        u = self.act_scale * (u + self.u_hover)
        r, p, theta, v, w, thetadot = self._split(x)
        q = mrp2quat(p)
        # forces: rotor thrust along body z + gravity in body frame
        thrust = self.kf * jnp.sum(u)
        F = jnp.array([0.0, 0.0, 1.0]) * thrust + quatrot(mrp2quat(-p), self.mass * jnp.asarray(self.gvec))
        # moments: yaw from drag torques + roll/pitch from motor arms
        yaw = self.km * (u[0] - u[1] + u[2] - u[3])
        arms = self.motor_dist * jnp.asarray(self.ss)
        thrust_vecs = jnp.zeros((4, 3)).at[:, 2].set(self.kf * u)
        tau = jnp.sum(jnp.cross(arms, thrust_vecs), axis=0).at[2].add(yaw)

        rdot = quatrot(q, v)
        pdot = w2pdotkinematics_mrp(p, w)
        vdot = F / self.mass - jnp.cross(w, v)
        Jw = jnp.asarray(self.J) @ w
        wdot = jnp.asarray(self.Jinv) @ (tau - jnp.cross(w, Jw))
        # pendulum: world-frame x-acceleration drives the pole
        x_dd = quatrot(q, vdot)[0]
        theta_dd = (self.gvec[2] * jnp.sin(theta) + x_dd * jnp.cos(theta)) / self.L
        return jnp.concatenate(
            [rdot, pdot, jnp.array([thetadot]), vdot, wdot, jnp.array([theta_dd])]
        )

    def _dynamics_single(self, x, u):
        return rk4(self._xdot, x, u, self.dt)

    # -- gym API --------------------------------------------------------------
    def state_clip(self, x):
        return x.at[..., 6].set(angle_normalize_2pi(x[..., 6]))

    def reward(self, x, u):
        cost = jnp.sum((x - jnp.asarray(self.targ_pos)) ** 2 * jnp.asarray(self.Qlqr) / 2, axis=-1) / 100
        cost = cost + jnp.sum(u**2 * jnp.asarray(self.Rlqr) / 2, axis=-1) / 10
        return jnp.exp(-cost / 2 + 2)

    def check_collisions(self, x):
        if not self.obstacles:
            return jnp.zeros(x.shape[:-1], dtype=bool)
        r = x[..., :3]
        obs = jnp.asarray(self.obstacle_positions)
        dist = jnp.linalg.norm(r[..., None, :] - obs, axis=-1)
        return jnp.any(dist < self.obstacle_radius, axis=-1)

    def reset(self, rng, bsz, x_window=None):
        """Uniform start in the euler-space window. `x_window` overrides
        the default per-dim half-widths (reference parity: reset takes an
        x_window override, `rex_quadrotor.py:260-270`) — e.g. a narrow
        theta window evaluates the capture/stabilize regime."""
        w = jnp.asarray(self.x_window if x_window is None else x_window)
        x = jax.random.uniform(rng, (bsz, 14), minval=-w, maxval=w)
        mrp = quat2mrp(euler_to_quaternion(x[:, 3:6]))
        theta = jnp.pi + x[:, 6:7]
        return jnp.concatenate([x[:, :3], mrp, theta, x[:, 7:]], axis=-1)

    def is_bad_state(self, x, reward):
        bad = super().is_bad_state(x, reward)
        return jnp.logical_or(bad, self.check_collisions(x))
