"""NewtonAL: inner Newton solver on the AL merit, with implicit backward.

Counterpart of the reference's `qpth/al_utils.py:449-642` NewtonAL
autograd.Function + parallel line search, re-designed for XLA:

  * the <=4 Newton steps run in a `lax.while_loop` with the same
    global stopping rules as the reference (dyn-res stall / small
    step, `al_utils.py:496,558-564`);
  * the Newton system is solved with the O(T) block-tridiagonal
    Cholesky (`deqmpc_tpu/ops/tridiag.py`) instead of a dense
    `cholesky_ex` (`al_utils.py:510-513`); a `lax.cond`-gated
    strongly-jittered refactorization replaces the dense
    `linalg.solve` NaN fallback (`al_utils.py:517-521`);
  * the 20-candidate line search evaluates all step sizes in one
    batched merit call and argmins (`al_utils.py:618-642`), accepting
    only improvements;
  * backward is `jax.custom_vjp` implicit differentiation reusing the
    final factorization: dx = -H^{-1} g_out, dQ = dx * x (diag cost),
    dq = dx (`al_utils.py:578-615`). Only Q and q receive gradients,
    matching the reference (all other inputs get zero cotangents).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pallas_tridiag import pallas_block_tridiag_solve
from ..ops.tridiag import block_tridiag_factor, block_tridiag_solve_factored
from .al_core import (eq_residuals, eq_residuals_se, full_residuals,
                      merit_function, merit_grad_blocks)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NewtonALConfig:
    nx: int
    nu: int
    T: int
    max_newton_steps: int = 4
    n_ls: int = 20
    chol_jitter: float = 0.0
    fallback_jitter: float = 1e-4
    dyn_res_tol: float = 1e-3       # `al_utils.py:558-564`
    min_stepsz: float = 1e-8
    line_search: bool = True
    state_estimator: bool = False
    # tridiag backend: "auto" (Pallas on TPU, XLA scan elsewhere),
    # "pallas", or "xla". The Pallas batch-in-lanes kernel is ~10x
    # faster than XLA's batched small-matrix cholesky on TPU.
    tridiag_backend: str = "auto"


def make_newton_al(cfg: NewtonALConfig, dyn: Callable, dyn_jac: Callable,
                   u_lower, u_upper, obs_getter: Optional[Callable] = None):
    """Builds the custom_vjp'd NewtonAL solve.

    dyn(x, u): batched discrete dynamics (bsz, T-1, nx) from
      (bsz, T-1, nx), (bsz, T-1, nu).
    dyn_jac(x, u): -> (x_next, F) with F = [A B]: (bsz, T-1, nx, nx+nu).
    obs_getter: optional () -> ObstacleSet closure (None = no obstacles).

    Returns newton_al(xu, x0, lam, rho, Q, q) -> (xu_out, status).
    """
    nx, T = cfg.nx, cfg.T
    eq_fn = eq_residuals_se if cfg.state_estimator else eq_residuals

    def _merit(xu, Q, q, x0, lam, rho, obs):
        return merit_function(
            dyn, xu, Q, q, x0, lam, rho, u_lower, u_upper,
            obs=obs, state_estimator=cfg.state_estimator,
        )

    def _dyn_res_norm(xu, x0, obs):
        x, u = xu[..., :nx], xu[..., nx:]
        _, res_c = full_residuals(
            dyn, x, u, x0, u_lower, u_upper, obs, cfg.state_estimator
        )
        return jnp.linalg.norm(res_c.reshape(-1))

    def _assemble(xu, Q, q, x0, lam, rho, obs):
        x, u = xu[..., :nx], xu[..., nx:]
        x_next, F = dyn_jac(x[:, :-1], u[:, :-1])
        defects = x[:, 1:] - x_next
        if cfg.state_estimator:
            last = jnp.zeros_like(defects[:, :1])
        else:
            last = (x[:, 0] - x0)[:, None]
        r_eq = jnp.concatenate([defects, last], axis=1)
        return merit_grad_blocks(
            xu, Q, q, x0, lam, rho, F, u_lower, u_upper,
            obs=obs, state_estimator=cfg.state_estimator, dyn_eq_res=r_eq,
        )

    if cfg.tridiag_backend == "auto":
        use_pallas = jax.default_backend() in ("tpu", "axon")
    else:
        use_pallas = cfg.tridiag_backend == "pallas"

    def _tridiag_solve(D, O, rhs):
        if use_pallas:
            return pallas_block_tridiag_solve(D, O, rhs)
        fac = block_tridiag_factor(D, O, jitter=cfg.chol_jitter)
        return block_tridiag_solve_factored(fac, rhs)

    def _solve_with_fallback(g, D, O):
        """Solve H x = -g with a strongly-jittered retry on non-finite
        results (replaces the reference's dense linalg.solve fallback,
        `al_utils.py:517-521`)."""
        upd = -_tridiag_solve(D, O, g)
        bad = jnp.logical_not(jnp.all(jnp.isfinite(upd)))

        def retry(_):
            scale = jnp.maximum(
                jnp.max(jnp.abs(D), axis=(-3, -2, -1), keepdims=True), 1.0
            )
            Dj = D + cfg.fallback_jitter * scale * jnp.eye(
                D.shape[-1], dtype=D.dtype
            )
            return -_tridiag_solve(Dj, O, g)

        return lax.cond(bad, retry, lambda _: upd, None)

    _solve_newton_system = _solve_with_fallback

    def _line_search(xu, update, merit_now, Q, q, x0, lam, rho, obs):
        """20 parallel step sizes 2^{0..-19}; keep the best improving
        candidate per sample (`al_utils.py:618-642`)."""
        steps = 2.0 ** (-jnp.arange(cfg.n_ls, dtype=xu.dtype))
        cands = xu[None] + steps[:, None, None, None] * update[None]
        merits = jax.vmap(lambda c: _merit(c, Q, q, x0, lam, rho, obs))(cands)
        # NaN merits must never win the argmin
        merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
        best = jnp.argmin(merits, axis=0)  # (bsz,)
        bidx = jnp.arange(xu.shape[0])
        best_merit = merits[best, bidx]
        best_x = cands[best, bidx]
        improved = best_merit < merit_now
        xu_new = jnp.where(improved[:, None, None], best_x, xu)
        new_merit = jnp.where(improved, best_merit, merit_now)
        stepsz = jnp.mean(steps[best])  # reference: mean of argmin steps
        return xu_new, new_merit, stepsz

    def _forward(xu, x0, lam, rho, Q, q):
        # TPU's default matmul precision is bfloat16: the Newton
        # assembly -> factor -> solve -> line-search chain loses ~8
        # mantissa bits per product and the solver silently fails on
        # hard problems (measured: the cartpole T=60 teacher returns
        # garbage at default precision, converges at highest). Scoped
        # here so the DEQ network keeps the MXU-fast default.
        with jax.default_matmul_precision("highest"):
            return _forward_impl(xu, x0, lam, rho, Q, q)

    def _forward_impl(xu, x0, lam, rho, Q, q):
        obs = obs_getter() if obs_getter is not None else None
        bsz = xu.shape[0]
        merit0 = _merit(xu, Q, q, x0, lam, rho, obs)
        dres0 = _dyn_res_norm(xu, x0, obs)
        status0 = jnp.ones((bsz,), bool)
        carry0 = (xu, merit0, dres0, jnp.asarray(1.0, xu.dtype),
                  jnp.asarray(0, jnp.int32), status0, jnp.asarray(False))

        def cond(c):
            _, _, _, stepsz, nstep, _, done = c
            return jnp.logical_and(
                jnp.logical_and(nstep < cfg.max_newton_steps,
                                stepsz > cfg.min_stepsz),
                jnp.logical_not(done),
            )

        def body(c):
            xu_c, merit_c, dres_old, _, nstep, status, _ = c
            g, D, O, _, _ = _assemble(xu_c, Q, q, x0, lam, rho, obs)
            update = _solve_newton_system(g, D, O)
            if cfg.line_search:
                xu_n, merit_n, stepsz = _line_search(
                    xu_c, update, merit_c, Q, q, x0, lam, rho, obs
                )
            else:
                xu_n = xu_c + update
                merit_n = _merit(xu_n, Q, q, x0, lam, rho, obs)
                stepsz = jnp.asarray(1.0, xu.dtype)
            status = jnp.logical_and(
                status, jnp.all(jnp.isfinite(xu_n.reshape(xu_n.shape[0], -1)), axis=-1)
            )
            dres_new = _dyn_res_norm(xu_n, x0, obs)
            # global stall / convergence rule (`al_utils.py:558-564`)
            done = jnp.logical_or(
                jnp.abs(dres_old - dres_new) / (dres_new + 1e-30) < cfg.dyn_res_tol,
                dres_new < cfg.dyn_res_tol,
            )
            return (xu_n, merit_n, dres_new, stepsz, nstep + 1, status, done)

        xu_f, _, _, _, _, status, _ = lax.while_loop(cond, body, carry0)
        # Hessian blocks at the solution, reused by the implicit backward
        _, D, O, _, _ = _assemble(xu_f, Q, q, x0, lam, rho, obs)
        return xu_f, status, (D, O)

    @jax.custom_vjp
    def newton_al(xu, x0, lam, rho, Q, q):
        out, status, _ = _forward(xu, x0, lam, rho, Q, q)
        return out, status

    def newton_fwd(xu, x0, lam, rho, Q, q):
        out, status, DO = _forward(xu, x0, lam, rho, Q, q)
        return (out, status), (DO, out, xu, x0, lam, rho)

    def newton_bwd(saved, cots):
        (D, O), x_out, xu, x0, lam, rho = saved
        g_out, _ = cots  # status cotangent ignored
        with jax.default_matmul_precision("highest"):
            dx = -_tridiag_solve(D, O, g_out)
        # scrub rare per-sample solver failures instead of poisoning the
        # whole batch gradient (the reference exposes a status mask and
        # NaN-grad trap instead, `al_utils.py:545-549`, `train.py:331`)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dQ = dx * x_out   # diagonal-cost gradient (`al_utils.py:595-597`)
        dq = dx
        return (
            jnp.zeros_like(xu),
            jnp.zeros_like(x0),
            jnp.zeros_like(lam),
            jnp.zeros_like(rho),
            dQ,
            dq,
        )

    newton_al.defvjp(newton_fwd, newton_bwd)
    return newton_al
