"""Interior-point SQP MPC (the reference's `qpth/qp_wrapper.py` path,
solver_type='ip').

SQP around a batched dense QP: linearize the dynamics analytically
(`qp_wrapper.py:466-500` GradMethods.ANALYTIC), assemble the dense
diagonal cost, banded equality constraints and control box
inequalities with static index maps (`qp_wrapper.py:612-653`), solve
with the batched PDIPM layer, and (optionally) iterate with a
rollout-free merit line search (`qp_wrapper.py:402-421`). Default
qp_iter=1 matches the reference's `single_qp_solve` training path
(`train.py:41`, `policies.py:1177`).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .pdipm import qp_layer, qp_solve
from .types import QuadCost

Array = jax.Array


class IPMPC:
    def __init__(self, nx: int, nu: int, T: int, u_lower=None, u_upper=None,
                 dyn: Callable = None, dyn_jac: Callable = None,
                 qp_iter: int = 1, ipm_iters: int = 18,
                 elastic: bool = False, elastic_mu: float = 10.0,
                 eps: float = 1e-2, grad_method: str = "analytic",
                 fd_eps: float = 1e-4,
                 dtype=jnp.float32):
        self.nx, self.nu, self.T = nx, nu, T
        self.n = nx + nu
        self.dtype = dtype
        self.qp_iter = qp_iter
        self.ipm_iters = ipm_iters
        # SQP convergence threshold (`qp_wrapper.py:173,377`: break once
        # the full step norm drops below eps). The reference's Python
        # break becomes a per-sample masked freeze so the loop stays one
        # compiled program.
        self.eps = eps
        self.u_lower = jnp.asarray(u_lower, dtype)
        self.u_upper = jnp.asarray(u_upper, dtype)
        self.dyn = dyn
        # Linearization method (`qp_wrapper.py:27-31` GradMethods
        # ANALYTIC / AUTO_DIFF / FINITE_DIFF, dispatch :466-581):
        #   analytic    — the caller-supplied dyn_jac (env analytic jacs)
        #   autodiff    — jacfwd of dyn per (sample, step)
        #   finite_diff — central differences on dyn
        if grad_method == "analytic":
            if dyn_jac is None:
                raise ValueError("grad_method='analytic' needs dyn_jac")
            self.dyn_jac = dyn_jac
        elif grad_method == "autodiff":
            def _jac_auto(x, u):
                def step1(xi, ui):
                    return dyn(xi[None, None], ui[None, None])[0, 0]

                xn = dyn(x, u)
                Jx = jax.vmap(jax.vmap(jax.jacfwd(step1, argnums=0)))(x, u)
                Ju = jax.vmap(jax.vmap(jax.jacfwd(step1, argnums=1)))(x, u)
                return xn, jnp.concatenate([Jx, Ju], axis=-1)

            self.dyn_jac = _jac_auto
        elif grad_method == "finite_diff":
            def _jac_fd(x, u):
                xn = dyn(x, u)
                n_in = x.shape[-1] + u.shape[-1]

                def col(i):
                    ex = jnp.zeros((n_in,), x.dtype).at[i].set(fd_eps)
                    dx, du = ex[: x.shape[-1]], ex[x.shape[-1]:]
                    return (dyn(x + dx, u + du) - dyn(x - dx, u - du)) / (2 * fd_eps)

                cols = jax.vmap(col)(jnp.arange(n_in))  # (n, ..., nx)
                return xn, jnp.moveaxis(cols, 0, -1)

            self.dyn_jac = _jac_fd
        else:
            raise ValueError(f"unknown grad_method {grad_method!r}")
        self.nz = T * self.n
        self.ne = T * nx
        self.ni = 2 * nu * T
        # SL1QP elastic mode (`qpth/sl1qp_mpc.py`): slack the equality
        # constraints with an l1 penalty mu so infeasible linearizations
        # stay solvable: min .. + mu*1'(t+ + t-) s.t. Az + t+ - t- = b
        self.elastic = elastic
        self.elastic_mu = elastic_mu

    def _assemble(self, x, u, x0, cost: QuadCost):
        """Dense (Q, p, G, h, A, b) at the linearization point."""
        bsz = x.shape[0]
        T, nx, nu, n = self.T, self.nx, self.nu, self.n
        dt = self.dtype
        x_next, F = self.dyn_jac(x[:, :-1], u[:, :-1])  # F: (bsz,T-1,nx,n)
        c_lin = x_next - jnp.einsum("btij,btj->bti",
                                    F, jnp.concatenate([x, u], -1)[:, :-1])
        Qd = jnp.einsum("ij,btj->btij", jnp.eye(n, dtype=dt), cost.Q)
        Q = jax.vmap(jax.scipy.linalg.block_diag)(
            *[Qd[:, t] for t in range(T)]
        ) if False else self._block_diag(Qd)
        p = cost.q.reshape(bsz, -1)
        # equality: x_{t+1} - F_t tau_t = c_t  (rows t*nx), x_0 = x0 (last)
        A = jnp.zeros((bsz, self.ne, self.nz), dt)
        b = jnp.zeros((bsz, self.ne), dt)
        for t in range(T - 1):
            A = A.at[:, t * nx : (t + 1) * nx, t * n : (t + 1) * n].set(-F[:, t])
            A = A.at[:, t * nx : (t + 1) * nx,
                     (t + 1) * n : (t + 1) * n + nx].set(
                jnp.eye(nx, dtype=dt)[None])
            b = b.at[:, t * nx : (t + 1) * nx].set(c_lin[:, t])
        A = A.at[:, -nx:, :nx].set(jnp.eye(nx, dtype=dt)[None])
        b = b.at[:, -nx:].set(x0)
        # inequalities: u <= u_hi, -u <= -u_lo per step
        G = jnp.zeros((self.ni, self.nz), dt)
        h = jnp.zeros((self.ni,), dt)
        for t in range(T):
            r = 2 * nu * t
            G = G.at[r : r + nu, t * n + nx : (t + 1) * n].set(jnp.eye(nu, dtype=dt))
            G = G.at[r + nu : r + 2 * nu, t * n + nx : (t + 1) * n].set(
                -jnp.eye(nu, dtype=dt))
            h = h.at[r : r + nu].set(self.u_upper)
            h = h.at[r + nu : r + 2 * nu].set(-self.u_lower)
        G = jnp.broadcast_to(G, (bsz, self.ni, self.nz))
        h = jnp.broadcast_to(h, (bsz, self.ni))
        if self.elastic:
            return self._sl1qpify(Q, p, G, h, A, b)
        return Q, p, G, h, A, b

    def _sl1qpify(self, Q, p, G, h, A, b):
        """Append elastic slacks t+, t- to the QP (`sl1qp_mpc.py:703`
        `sl1qpify`): z_ext = [z; t+; t-], equality rows become
        A z + t+ - t- = b, slacks nonnegative with l1 cost mu."""
        bsz = p.shape[0]
        dt = p.dtype
        nz, ne, ni = self.nz, self.ne, self.ni
        mu = self.elastic_mu
        nz2 = nz + 2 * ne
        Q2 = jnp.zeros((bsz, nz2, nz2), dt).at[:, :nz, :nz].set(Q)
        Q2 = Q2 + 1e-8 * jnp.eye(nz2, dtype=dt)  # keep SPD for the IPM
        p2 = jnp.concatenate([p, jnp.full((bsz, 2 * ne), mu, dt)], axis=1)
        eyee = jnp.broadcast_to(jnp.eye(ne, dtype=dt), (bsz, ne, ne))
        A2 = jnp.concatenate([A, eyee, -eyee], axis=2)
        Gpad = jnp.concatenate([G, jnp.zeros((bsz, ni, 2 * ne), dt)], axis=2)
        # -t <= 0 rows for both slack blocks
        slack_rows = jnp.concatenate(
            [jnp.zeros((bsz, 2 * ne, nz), dt),
             jnp.broadcast_to(-jnp.eye(2 * ne, dtype=dt), (bsz, 2 * ne, 2 * ne))],
            axis=2,
        )
        G2 = jnp.concatenate([Gpad, slack_rows], axis=1)
        h2 = jnp.concatenate([h, jnp.zeros((bsz, 2 * ne), dt)], axis=1)
        return Q2, p2, G2, h2, A2, b

    @staticmethod
    def _block_diag(Qd):
        """(bsz, T, n, n) diag blocks -> (bsz, T*n, T*n)."""
        bsz, T, n, _ = Qd.shape
        out = jnp.zeros((bsz, T * n, T * n), Qd.dtype)
        for t in range(T):
            out = out.at[:, t * n : (t + 1) * n, t * n : (t + 1) * n].set(Qd[:, t])
        return out

    def solve(self, x0: Array, cost: QuadCost,
              x_init: Optional[Array] = None,
              u_init: Optional[Array] = None) -> Tuple[Array, Array]:
        """SQP loop; returns (x, u). Differentiable through the final
        QP via the implicit qp_layer."""
        bsz = x0.shape[0]
        T, nx, nu, n = self.T, self.nx, self.nu, self.n
        dt = self.dtype
        x0 = x0.astype(dt)
        x = (x_init.astype(dt) if x_init is not None
             else jnp.broadcast_to(x0[:, None], (bsz, T, nx)))
        u = (u_init.astype(dt) if u_init is not None
             else jnp.zeros((bsz, T, nu), dt))
        # per-sample convergence freeze: the reference breaks its
        # (no_grad) SQP loop once the u-step norm drops below eps
        # (`qp_wrapper.py:360,377-379`) and then always runs one final
        # differentiable QP (:382-387). Masked freezing of the non-final
        # iterations reproduces that inside one compiled program; the
        # final (differentiable) QP below runs for every sample.
        frozen = jnp.zeros((bsz,), bool)
        for i in range(self.qp_iter):
            xc = lax.stop_gradient(x)
            uc = lax.stop_gradient(u)
            Q, p, G, h, A, b = self._assemble(xc, uc, x0, cost)
            last = i == self.qp_iter - 1
            if last:
                z = qp_layer(Q, p, G, h, A, b, self.ipm_iters)
            else:
                z = qp_solve(Q, p, G, h, A, b, self.ipm_iters).z
            tau = z[:, : self.nz].reshape(bsz, T, n)
            x_new, u_new = tau[..., :nx], tau[..., nx:]
            # merit line search on the true dynamics defect, EVERY
            # iteration (`qp_wrapper.py:402-421` rollout-based
            # backtracking). On the last (differentiable) QP the step
            # interpolation keeps the qp_layer gradient path: the
            # argmin index is a stop-grad choice, x stays affine in
            # x_new. Taking the raw final step instead leaves a large
            # defect whenever the SQP has not fully converged
            # (measured: defect 0.47 raw vs 5e-11 searched at iter 5).
            def defect(xx, uu):
                d = xx[:, 1:] - self.dyn(xx[:, :-1], uu[:, :-1])
                return jnp.sum(d * d, axis=(1, 2))

            alphas = 2.0 ** (-jnp.arange(8, dtype=dt))
            cands_x = xc[None] + alphas[:, None, None, None] * (x_new - xc)[None]
            cands_u = uc[None] + alphas[:, None, None, None] * (u_new - uc)[None]
            merits = jax.vmap(defect)(
                lax.stop_gradient(cands_x), lax.stop_gradient(cands_u))
            bidx = jnp.argmin(merits, axis=0)
            ar = jnp.arange(bsz)
            x_sel = cands_x[bidx, ar]
            u_sel = cands_u[bidx, ar]
            if last:
                x, u = x_sel, u_sel
            else:
                x = jnp.where(frozen[:, None, None], xc, x_sel)
                u = jnp.where(frozen[:, None, None], uc, u_sel)
                du_norm = jnp.linalg.norm(
                    (u_sel - uc).reshape(bsz, -1), axis=-1)
                frozen = jnp.logical_or(frozen, du_norm < self.eps)
        return x, u
