"""Cartpole n-link environments (1-link nx=4, 2-link nx=6).

Replaces the reference's native dynamics stack — CasADi-generated
C/CUDA kernels wrapped through pybind11 and a torch bridge
(`/root/reference/deqmpc/my_envs/{cartpole1l,cartpole2l}/src/*`,
`my_envs/dynamics.py:27-108`, `my_envs/cartpole.py:27-88`) — with a
*generic Lagrangian-mechanics formulation in jnp*: the manipulator
equation M(q) qdd + h(q, qd) = tau is assembled from a closed-form
mass matrix (tip-Jacobian cumsum identities) plus one forward-mode JVP
for the Coriolis term, so the same ~50 lines serve any link count and
`jacfwd` provides the analytic Jacobians the reference needed ~2.5k
lines of generated C for. AD depth inside the dynamics is kept at one
so `vmap(jacfwd(dynamics))` stays cheap to compile.

Model: cart of mass ``mc`` sliding on x; ``n_links`` point masses at
link tips, relative joint angles, 0 rad = upright (reference
`my_envs/cartpole.py:1-2`). Actuation is a force on the cart only
(`my_envs/dynamics.py:55-56`: tau[:,0]=u).

Environment constants match the reference (`my_envs/cartpole.py:59-79`):
u_bounds 100 (1-link) / 250 (2-link), episode T 200/300,
Qlqr = ones, Rlqr = 1e-10.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Spaces
from ..utils.rotations import angle_normalize_2pi, rk4
from .base import Env


def _solve_spd_small(M, b):
    """Closed-form solve of a tiny SPD system (n <= 3) via the adjugate.

    `jnp.linalg.solve` on a traced 2x2/3x3 lowers to a general LU with
    serialized inner loops on TPU — catastrophic inside the solver's
    nested vmap/jacfwd (measured ~50x on the full AL solve). Cramer's
    rule is a handful of fused multiplies the MXU/VPU eats for free.
    """
    n = M.shape[-1]
    if n == 1:
        return b / M[..., 0, 0]
    if n == 2:
        a, c = M[..., 0, 0], M[..., 0, 1]
        d = M[..., 1, 1]
        det = a * d - c * c
        x0 = (d * b[..., 0] - c * b[..., 1]) / det
        x1 = (a * b[..., 1] - c * b[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    if n == 3:
        m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        m11, m12, m22 = M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]
        c00 = m11 * m22 - m12 * m12
        c01 = m02 * m12 - m01 * m22
        c02 = m01 * m12 - m02 * m11
        c11 = m00 * m22 - m02 * m02
        c12 = m01 * m02 - m00 * m12
        c22 = m00 * m11 - m01 * m01
        det = m00 * c00 + m01 * c01 + m02 * c02
        b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
        x0 = (c00 * b0 + c01 * b1 + c02 * b2) / det
        x1 = (c01 * b0 + c11 * b1 + c12 * b2) / det
        x2 = (c02 * b0 + c12 * b1 + c22 * b2) / det
        return jnp.stack([x0, x1, x2], axis=-1)
    return jnp.linalg.solve(M, b)


class CartpoleEnv(Env):
    def __init__(self, nx: int = 4, dt: float = 0.05, stabilization: bool = False,
                 mc: float = 1.0, mp: float = 0.1, length: float = 0.5,
                 g: float = 9.81, kwargs=None):
        assert nx % 2 == 0 and nx >= 4
        self.nx = nx
        self.nq = nx // 2
        self.nu = 1
        self.n_links = self.nq - 1
        self.dt = dt
        self.mc, self.mp, self.length, self.g = mc, mp, length, g
        self.stabilization = stabilization
        self.spec_id = "Cartpole{}l-v0{}".format(
            self.n_links, "-stabilize" if stabilization else ""
        )
        if nx == 6:
            self.T = 300
            self.u_bounds = 250.0
        else:
            self.T = 200
            self.u_bounds = 100.0
        self._max_episode_steps = self.T
        high = np.concatenate([np.full(self.nq, np.pi), np.full(self.nq, np.pi * 5)])
        self.observation_space = Spaces(-high, high, (self.nx,))
        self.action_space = Spaces(
            np.full(self.nu, -self.u_bounds), np.full(self.nu, self.u_bounds), (self.nu,)
        )
        self.Qlqr = np.ones(self.nx, dtype=np.float64)
        self.Rlqr = np.full(self.nu, 1e-10, dtype=np.float64)
        self.targ_pos = np.zeros(self.nx)
        # static lower/upper-triangular masks used by the tip Jacobians
        n = self.n_links
        self._L = np.tril(np.ones((n, n)))  # L[i,j] = [j <= i]
        self._U = np.tril(np.ones((n, n)))  # U[j,k] = [j >= k]

    # -- closed-form manipulator quantities -----------------------------------
    def _tip_jacobians(self, q):
        """d p_i / d q for every tip i, closed form.

        With absolute angles a_j = cumsum(theta), tip i sits at
        (px + l*sum_{j<=i} sin a_j,  l*sum_{j<=i} cos a_j), so
        d(tip_i_x)/d theta_k = l * sum_{k<=j<=i} cos a_j  (and -sin for y):
        both are L @ diag(trig) @ U contractions with static masks.
        Returns J: (n_links, 2, nq).
        """
        a = jnp.cumsum(q[1:])
        Lm = jnp.asarray(self._L, dtype=q.dtype)
        Um = jnp.asarray(self._U, dtype=q.dtype)
        Bx = self.length * (Lm * jnp.cos(a)[None, :]) @ Um  # (n, n)
        By = self.length * (Lm * jnp.sin(a)[None, :]) @ Um
        n = self.n_links
        Jx = jnp.concatenate([jnp.ones((n, 1), q.dtype), Bx], axis=1)
        Jy = jnp.concatenate([jnp.zeros((n, 1), q.dtype), -By], axis=1)
        return jnp.stack([Jx, Jy], axis=1)  # (n, 2, nq)

    def _mass_matrix(self, q):
        J = self._tip_jacobians(q)
        M = self.mp * jnp.einsum("ndk,ndl->kl", J, J)
        return M.at[0, 0].add(self.mc)

    def _potential(self, q):
        a = jnp.cumsum(q[1:])
        heights = jnp.cumsum(self.length * jnp.cos(a))
        return self.mp * self.g * jnp.sum(heights)

    def _dV_dq(self, q):
        """Closed-form gravity gradient: V = mp*g*l * sum_j w_j cos(a_j)
        with a = cumsum(theta) and w_j = #tips at-or-beyond link j."""
        a = jnp.cumsum(q[1:])
        w = jnp.arange(self.n_links, 0, -1, dtype=q.dtype)
        s = w * jnp.sin(a)
        # dV/dtheta_k = -mp*g*l * sum_{j>=k} s_j  (suffix sum)
        dtheta = -self.mp * self.g * self.length * (
            jnp.cumsum(s[::-1])[::-1]
        )
        return jnp.concatenate([jnp.zeros(1, q.dtype), dtheta])

    def _accel_1l(self, q, qd, u):
        """Closed-form 1-link accel (nq=2), algebraically identical to
        the generic Lagrangian path below (tip at (px + l sin th,
        l cos th), 0 rad = upright). The generic path's jacfwd/cumsum/
        einsum over 1-element tensors emits ~200 tiny serialized TPU
        ops per RK4 eval (measured 3.3 ms/dynamics call, 9x on the
        whole cartpole AL solve vs rexquad); these six fused multiplies
        are the same math at VPU speed."""
        th, thd = q[1], qd[1]
        mc, mp, l, g = self.mc, self.mp, self.length, self.g
        s, c = jnp.sin(th), jnp.cos(th)
        # M = [[mc+mp, mp*l*c], [mp*l*c, mp*l^2]];
        # rhs = tau - h = [u + mp*l*s*thd^2, mp*g*l*s]
        a_ = mc + mp
        b_ = mp * l * c
        d_ = mp * l * l
        r0 = u[0] + mp * l * s * thd * thd
        r1 = mp * g * l * s
        det = a_ * d_ - b_ * b_
        return jnp.stack([(d_ * r0 - b_ * r1) / det,
                          (a_ * r1 - b_ * r0) / det])

    def _accel(self, q, qd, u):
        if self.nq == 2:
            return self._accel_1l(q, qd, u)
        # One forward-mode Jacobian of the (closed-form) mass matrix gives
        # every velocity-product term; no reverse-mode AD inside the
        # dynamics, which keeps vmap(jacfwd(rk4(.))) cheap on TPU.
        M = self._mass_matrix(q)
        dMdq = jax.jacfwd(self._mass_matrix)(q)  # (nq, nq, nq)
        Mdot_qd = jnp.einsum("ijk,j,k->i", dMdq, qd, qd)
        dT_dq = 0.5 * jnp.einsum("jki,j,k->i", dMdq, qd, qd)
        h = Mdot_qd - dT_dq + self._dV_dq(q)
        tau = jnp.zeros(self.nq, q.dtype).at[0].set(u[0])
        return _solve_spd_small(M, tau - h)

    def _dynamics_single(self, x, u):
        def xdot(state, uu):
            q, qd = state[: self.nq], state[self.nq :]
            return jnp.concatenate([qd, self._accel(q, qd, uu)])

        return rk4(xdot, x, u, self.dt)

    # -- gym API --------------------------------------------------------------
    def state_clip(self, x):
        """Wrap joint angles into [0, 2pi) (reference
        `my_envs/cartpole.py:90-92`)."""
        angles = angle_normalize_2pi(x[..., 1 : self.nq])
        return jnp.concatenate([x[..., :1], angles, x[..., self.nq :]], axis=-1)

    def reward(self, x, u):
        theta = x[..., 1 : self.nq]
        d1 = jnp.abs(theta)
        d2 = jnp.abs(theta - 2 * jnp.pi)
        delta = jnp.minimum(d1, d2).sum(axis=-1)
        px = jnp.abs(x[..., 0])
        return -(delta + px + (px > 10) * 80.0)

    def reset(self, rng, bsz):
        if self.stabilization:
            high = np.concatenate([np.full(self.nq, 0.05), np.full(self.nq, 0.05)])
        else:
            high = np.concatenate([np.full(self.nq, np.pi), np.full(self.nq, 0.5)])
            high[0] = 1.0
        high = jnp.asarray(high)
        x = jax.random.uniform(rng, (bsz, self.nx), minval=-high, maxval=high)
        return self.state_clip(x)

    # energy helpers (used by tests)
    def _kinetic(self, q, qd):
        return 0.5 * qd @ self._mass_matrix(q) @ qd


class Cartpole2linkEnv(CartpoleEnv):
    def __init__(self, dt: float = 0.03, stabilization: bool = False, **kw):
        super().__init__(nx=6, dt=dt, stabilization=stabilization, **kw)
