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
                 fd_eps: float = 1e-4, lindx=None,
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
        # Time-varying linear dynamics (reference `LinDx` rollout branch,
        # `qp_wrapper.py:586-590`): the LinDx dyn callable is
        # time-batched (needs the full (bsz, T-1, .) trajectory), so the
        # per-step rollout scans over (F_t, f_t) instead.
        self.lindx = lindx
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

    def _rollout(self, x0: Array, u: Array) -> Array:
        """Roll the true dynamics under a control sequence
        (`qp_wrapper.py:583-597`). lax.scan over the horizon; leading
        axes of x0/u may carry (candidates, batch)."""

        if self.lindx is not None:
            F, f = self.lindx.F, self.lindx.f  # (bsz, T-1, nx, n/.)

            def step_lin(x, Ff_ut):
                Ft, ft, ut = Ff_ut
                xu = jnp.concatenate([x, ut], axis=-1)
                xn = jnp.einsum("...ij,...j->...i", Ft, xu) + ft
                return xn, xn

            _, xs = lax.scan(
                step_lin, x0,
                (jnp.moveaxis(F, -3, 0), jnp.moveaxis(f, -2, 0),
                 jnp.moveaxis(u[..., :-1, :], -2, 0)))
        else:
            def step(x, ut):
                xn = self.dyn(x, ut)
                return xn, xn

            _, xs = lax.scan(step, x0, jnp.moveaxis(u[..., :-1, :], -2, 0))
        xs = jnp.moveaxis(xs, 0, -2)
        return jnp.concatenate([x0[..., None, :], xs], axis=-2)

    def _cost_of(self, x: Array, u: Array, cost: QuadCost) -> Array:
        """0.5 tau'diag(Q)tau + q'tau summed over the horizon
        (`qp_wrapper.py:655-658` compute_cost)."""
        tau = jnp.concatenate([x, u], axis=-1)
        return jnp.sum(0.5 * cost.Q * tau * tau + cost.q * tau, axis=(-2, -1))

    def _line_search(self, xc, uc, x_new, u_new, x0, cost):
        """The reference's rollout-based cost-decrease backtracking
        (`qp_wrapper.py:402-421`): alpha starts at 1 and decays by 0.2
        per non-improving sample, up to 10 trials. TPU-natively all 10
        candidates are evaluated in ONE batched rollout and each sample
        picks its largest improving alpha (= what the sequential decay
        loop converges to); if none improve, the smallest alpha is
        taken, mirroring the loop ending at max_linesearch_iter."""
        dt = self.dtype
        K = 10
        alphas = 0.2 ** jnp.arange(K, dtype=dt)  # `linesearch_decay=0.2`
        cost0 = self._cost_of(xc, uc, cost)
        cands_u = uc[None] + alphas[:, None, None, None] * (u_new - uc)[None]
        bsz = xc.shape[0]
        cands_x = self._rollout(
            jnp.broadcast_to(x0, (K,) + x0.shape), cands_u)
        costs = self._cost_of(cands_x, cands_u, cost)  # (K, bsz)
        improves = costs < cost0[None]
        # first (largest-alpha) improving candidate, else the last one
        first = jnp.argmax(improves, axis=0)
        kidx = jnp.where(jnp.any(improves, axis=0), first, K - 1)
        ar = jnp.arange(bsz)
        alpha = alphas[kidx]
        return (cands_x[kidx, ar], cands_u[kidx, ar], alpha[:, None, None],
                costs[kidx, ar])

    def solve(self, x0: Array, cost: QuadCost,
              x_init: Optional[Array] = None,
              u_init: Optional[Array] = None) -> Tuple[Array, Array]:
        """SQP loop; returns (x, u). Differentiable through the final
        QP via the implicit qp_layer.

        Structure mirrors `qp_wrapper.py:346-388` solve_nonlin: no-grad
        SQP iterations whose state is the line search's ROLLOUT (so the
        linearization point stays dynamically feasible), per-sample
        best-cost tracking, then one final differentiable QP whose step
        is the alpha-interpolation x + alpha*delta (affine in the
        qp_layer output, so gradients flow). qp_iter=1 is the
        reference's single_qp_ls training path (`qp_wrapper.py:391`)."""
        bsz = x0.shape[0]
        T, nx, nu, n = self.T, self.nx, self.nu, self.n
        dt = self.dtype
        x0 = x0.astype(dt)
        u = (u_init.astype(dt) if u_init is not None
             else jnp.zeros((bsz, T, nu), dt))
        # reference default: x = rollout(x0, u) when x_init is absent
        # (`qp_wrapper.py:270-276`)
        x = x_init.astype(dt) if x_init is not None else self._rollout(x0, u)
        # per-sample convergence freeze: the reference breaks its
        # (no_grad) SQP loop once the u-step norm drops below eps
        # (`qp_wrapper.py:360,377-379`). Masked freezing reproduces
        # that inside one compiled program.
        frozen = jnp.zeros((bsz,), bool)
        best_x, best_u = x, u
        best_cost = self._cost_of(x, u, cost)
        for i in range(self.qp_iter - 1):
            xc = lax.stop_gradient(x)
            uc = lax.stop_gradient(u)
            Q, p, G, h, A, b = self._assemble(xc, uc, x0, cost)
            z = qp_solve(Q, p, G, h, A, b, self.ipm_iters).z
            tau = z[:, : self.nz].reshape(bsz, T, n)
            x_new, u_new = tau[..., :nx], tau[..., nx:]
            x_ls, u_ls, _, cost_ls = self._line_search(
                xc, uc, x_new, u_new, x0, cost)
            x = jnp.where(frozen[:, None, None], xc, x_ls)
            u = jnp.where(frozen[:, None, None], uc, u_ls)
            # best-iterate tracking (`qp_wrapper.py:362-375`)
            better = cost_ls <= best_cost + 1e-4  # `best_cost_eps`
            take = jnp.logical_and(better, ~frozen)[:, None, None]
            best_x = jnp.where(take, x_ls, best_x)
            best_u = jnp.where(take, u_ls, best_u)
            best_cost = jnp.where(take[:, 0, 0], cost_ls, best_cost)
            du_norm = jnp.linalg.norm((u_ls - uc).reshape(bsz, -1), axis=-1)
            frozen = jnp.logical_or(frozen, du_norm < self.eps)
        # final differentiable QP from the best iterate
        # (`qp_wrapper.py:382-387` / single_qp_ls :391-400)
        xc = lax.stop_gradient(best_x)
        uc = lax.stop_gradient(best_u)
        Q, p, G, h, A, b = self._assemble(xc, uc, x0, cost)
        z = qp_layer(Q, p, G, h, A, b, self.ipm_iters)
        tau = z[:, : self.nz].reshape(bsz, T, n)
        x_new, u_new = tau[..., :nx], tau[..., nx:]
        _, _, alpha, _ = self._line_search(
            xc, uc, lax.stop_gradient(x_new), lax.stop_gradient(u_new),
            x0, cost)
        x = xc + alpha * (x_new - xc)
        u = uc + alpha * (u_new - uc)
        return x, u
