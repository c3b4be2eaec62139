"""Batched augmented-Lagrangian MPC solver (outer AL loop + API).

Counterpart of the reference's `qpth/AL_mpc.py` MPC module
(`forward` :207-258, `al_solve` :260-339, `al_solve_stream` :342-423,
`reinitialize` :569-579, `warm_start_initialize` :581-591), with the
mutable module state replaced by an explicit `ALState` pytree so the
whole solve jits, vmaps and shards.

Gradient semantics match the reference exactly: each AL iteration's
NewtonAL receives a stop-gradient'd primal iterate (the reference
detaches `xu` at `AL_mpc.py:299`), dual/penalty updates run under
stop_gradient (`AL_mpc.py:314-331` no_grad), and the returned
trajectory carries implicit gradients w.r.t. (Q, q) through the *last*
Newton solve's custom_vjp only.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .al_core import (ObstacleSet, compute_cost, full_residuals,
                      num_constraints)
from .newton_al import NewtonALConfig, make_newton_al
from .types import ALState, LinDx, QuadCost

Array = jax.Array


def warm_start_al(lam: Array, rho: Array, cost_start: Array,
                  cost_hist: Array, lam_hist: Array, rho_hist: Array
                  ) -> Tuple[Array, Array]:
    """Cost-history warm start (`qpth/al_utils.py:17-35` warm_start_al).

    Per sample, find the first history entry whose recorded cost is
    below the current starting cost, rescale the dual vector to that
    entry's norm, and restart rho from that entry. Shapes:
      lam (bsz, ncon), rho (bsz, 1) or (bsz,),
      cost_hist (H, bsz), lam_hist (H, bsz, ncon), rho_hist (H,) + rho dims.
    """
    idx = jnp.argmax(cost_hist < cost_start[None], axis=0)      # first hit
    lam_sel = jnp.take_along_axis(
        lam_hist, idx[None, :, None], axis=0)[0]                # (bsz, ncon)
    num = jnp.linalg.norm(lam_sel, axis=-1)
    den = jnp.linalg.norm(lam, axis=-1)
    lam = lam * (num / (den + 1e-30))[:, None]
    rho_sel = jnp.take_along_axis(
        rho_hist.reshape(rho_hist.shape[0], -1), idx[None, :], axis=0
    )[0].reshape(rho.shape)
    return lam, rho_sel


def warm_start_al_stream(rho: Array, cost_start: Array, cost_hist: Array,
                         rho_hist: Array) -> Array:
    """Streaming flavor (`al_utils.py:37-49`): restart rho only."""
    idx = jnp.argmax(cost_hist < cost_start[None], axis=0)
    return jnp.take_along_axis(
        rho_hist.reshape(rho_hist.shape[0], -1), idx[None, :], axis=0
    )[0].reshape(rho.shape)


class ALMPC:
    """Differentiable batched AL trajectory optimizer.

    Args mirror the reference ctor (`AL_mpc.py:118-205`); dynamics are
    pure callables:
      dyn(x, u): (..., nx), (..., nu) -> (..., nx)
      dyn_jac(x, u): -> (x_next, F) with F = [A|B] (..., nx, nx+nu)
    """

    def __init__(self, nx: int, nu: int, T: int, u_lower=None, u_upper=None,
                 dyn: Callable = None, dyn_jac: Callable = None,
                 al_iter: int = 2, rho_max: float = 1e8,
                 max_newton_steps: int = 4, dyn_res_tol: float = 1e-3,
                 state_estimator: bool = False,
                 obstacles: Optional[ObstacleSet] = None,
                 n_obs_sel: int = 4,
                 dtype=jnp.float32,
                 chol_jitter: float = 0.0,
                 tridiag_backend: str = "auto"):
        self.nx, self.nu, self.T = nx, nu, T
        self.n = nx + nu
        self.dtype = dtype
        self.al_iter = al_iter
        self.rho_max = rho_max
        self.state_estimator = state_estimator
        self.u_lower = None if u_lower is None else jnp.asarray(u_lower, dtype)
        self.u_upper = None if u_upper is None else jnp.asarray(u_upper, dtype)
        self.has_u_box = u_lower is not None and not state_estimator
        self.n_obs_sel = n_obs_sel if obstacles is not None else 0
        self.ncon = num_constraints(
            T, nx, nu, self.has_u_box, self.n_obs_sel, state_estimator
        )
        self.dyn = dyn
        self.dyn_jac = dyn_jac
        # per-solve obstacle selection lives here (set by select_obstacles)
        self._obs_current: Optional[ObstacleSet] = None
        self._all_obstacles = obstacles
        # frozen linearization for the linearize-once streaming path
        # (`al_utils_lin.py`, `AL_mpc.py:370-377`)
        self._lin_current: Optional[LinDx] = None

        cfg = NewtonALConfig(
            nx=nx, nu=nu, T=T, max_newton_steps=max_newton_steps,
            dyn_res_tol=dyn_res_tol,
            state_estimator=state_estimator, chol_jitter=chol_jitter,
            tridiag_backend=tridiag_backend,
        )
        obs_getter = (lambda: self._obs_current) if obstacles is not None else None
        self._newton = make_newton_al(
            cfg, self._dyn_batched, self._dyn_jac_batched,
            self.u_lower if self.has_u_box else None,
            self.u_upper if self.has_u_box else None,
            obs_getter,
        )

        def _lin_dyn(x, u):
            lin = self._lin_current
            xu = jnp.concatenate([x, u], axis=-1)
            return jnp.einsum("btij,btj->bti", lin.F, xu) + lin.f

        def _lin_dyn_jac(x, u):
            return _lin_dyn(x, u), self._lin_current.F

        self._lin_dyn = _lin_dyn
        self._newton_lin = make_newton_al(
            cfg, _lin_dyn, _lin_dyn_jac,
            self.u_lower if self.has_u_box else None,
            self.u_upper if self.has_u_box else None,
            obs_getter,
        )

    # -- dynamics plumbing ----------------------------------------------------
    # outputs are pinned to the solver dtype: env constants are f64
    # numpy, which would silently promote the whole f32 solve under
    # jax_enable_x64
    def _dyn_batched(self, x, u):
        return self.dyn(x, u).astype(self.dtype)

    def _dyn_jac_batched(self, x, u):
        xn, F = self.dyn_jac(x, u)
        return xn.astype(self.dtype), F.astype(self.dtype)

    # -- state management -----------------------------------------------------
    def init_state(self, bsz: int) -> ALState:
        """Fresh solver state (`AL_mpc.py:569-579` reinitialize)."""
        return ALState.init(bsz, self.T, self.nx, self.nu, self.ncon, self.dtype)

    def warm_start_shift(self, state: ALState, args_rho_init_max: float) -> ALState:
        """Receding-horizon shift for streaming mode
        (`AL_mpc.py:581-591`): shift duals one step, zero the tail,
        clamp rho. (The reference then multiplies lamda by 0 — i.e.
        dual reset; we keep that behavior for parity.)"""
        bsz = state.lam.shape[0]
        T, nx = self.T, self.nx
        lam_eq = state.lam[:, : T * nx].reshape(bsz, T, nx)
        lam_in = state.lam[:, T * nx :].reshape(bsz, T, -1)
        lam_eq = jnp.concatenate([lam_eq[:, 1:-1], lam_eq[:, -2:] * 0], axis=1)
        lam_in = jnp.concatenate([lam_in[:, 1:], lam_in[:, -1:] * 0], axis=1)
        lam = jnp.concatenate(
            [lam_eq.reshape(bsz, -1), lam_in.reshape(bsz, -1)], axis=1
        ) * 0.0
        rho = jnp.minimum(state.rho, args_rho_init_max)
        # shift the primal warm start one step (receding horizon)
        x = jnp.concatenate([state.x[:, 1:], state.x[:, -1:]], axis=1)
        u = jnp.concatenate([state.u[:, 1:], state.u[:, -1:]], axis=1)
        return ALState(lam=lam, rho=rho, x=x, u=u,
                       has_init=jnp.ones_like(state.has_init))

    def select_obstacles(self, x_ref: Array):
        """Pick the n_obs_sel nearest obstacles per (sample, step) via
        top-k (`AL_mpc_custom.py:100-135`)."""
        if self._all_obstacles is None:
            return None
        centers = jnp.asarray(self._all_obstacles.centers, self.dtype)  # (N,3)
        xyz = x_ref[..., :3]  # (bsz, T, 3)
        d2 = jnp.sum((xyz[..., None, :] - centers) ** 2, axis=-1)  # (bsz,T,N)
        _, idx = lax.top_k(-d2, self.n_obs_sel)
        sel = jnp.take(centers, idx, axis=0)  # (bsz, T, k, 3)
        self._obs_current = ObstacleSet(centers=sel, radius=self._all_obstacles.radius)
        return self._obs_current

    # -- solve ----------------------------------------------------------------
    def solve(self, x0: Array, cost: QuadCost, state: ALState,
              al_iter: Optional[int] = None,
              x_init: Optional[Array] = None, u_init: Optional[Array] = None,
              streaming: bool = False, return_history: bool = False,
              obstacles: Optional[ObstacleSet] = None,
              compute_Qq: Optional[Callable] = None,
              warm_start_history: Optional[Tuple] = None):
        """Run the AL loop. Returns (x, u, status, new_state).

        x_init/u_init: warm-start trajectories used when the state has
        no primal iterate yet (the Tracking adapter passes the network
        reference, `policies.py:1242-1244`).

        compute_Qq: optional xu -> (Q, q) callable re-deriving the
        tracking cost from the *network* at the current iterate between
        AL iterations (the reference's solver->network re-entrancy,
        `AL_mpc.py:301,318,549-556` with `recompute_Qq=True`; the
        closure is `Tracking_MPC.compute_Qq` -> `model_call`,
        `policies.py:261-270,1312-1315`). Runs under stop_gradient,
        matching the reference's `torch.no_grad()` model_call. The
        callable is a pure traced function, so the network->solver->
        network loop stays inside one jitted region (SURVEY §1).

        obstacles: the per-(b,t) selected ObstacleSet for this solve.
        Prefer passing it explicitly (e.g. the value returned by
        `select_obstacles(x_ref)` *inside the same trace*) — relying on
        the `_obs_current` attribute means a jitted caller that skips
        re-selection silently solves with stale obstacle constants.
        With obstacles configured but never selected, this raises
        instead of silently solving unconstrained.

        return_history=True additionally returns the per-AL-iteration
        (cost, lam, rho) stacks — the reference's `cost_lam_hist`
        (`AL_mpc.py:282,326-331`) — for `warm_start_al` restarts.

        warm_start_history: a (cost_hist, lam_hist, rho_hist) tuple from
        a previous `return_history=True` solve on a nearby problem; the
        duals/penalty are restarted from the first history entry whose
        cost beats the current start (`al_utils.py:17-49`
        warm_start_al). The reference ships these helpers unused; here
        they are consumable through this option.
        """
        if obstacles is not None:
            self._obs_current = obstacles
        elif self._all_obstacles is not None and self._obs_current is None:
            raise ValueError(
                "obstacle MPC: call select_obstacles(x_ref) in-trace or "
                "pass obstacles= to solve()")
        al_iter = self.al_iter if al_iter is None else al_iter
        nx = self.nx
        dtype = self.dtype
        x0 = x0.astype(dtype)
        Q = cost.Q.astype(dtype)
        q = cost.q.astype(dtype)
        bsz = x0.shape[0]

        if x_init is None:
            x_init = jnp.broadcast_to(x0[:, None], (bsz, self.T, nx))
        if u_init is None:
            u_init = jnp.zeros((bsz, self.T, self.nu), dtype)
        has = state.has_init[:, None, None]
        x = jnp.where(has, state.x, lax.stop_gradient(x_init.astype(dtype)))
        u = jnp.where(has, state.u, lax.stop_gradient(u_init.astype(dtype)))
        lam, rho = state.lam, state.rho

        obs = self._obs_current
        stopped = jnp.zeros((), bool)  # streaming rho-overflow exit
        xu = jnp.concatenate([x, u], axis=-1)
        if warm_start_history is not None:
            c_hist, l_hist, r_hist = warm_start_history
            cost_start = compute_cost(lax.stop_gradient(xu), Q, q)
            lam, rho = warm_start_al(lam, rho, cost_start,
                                     c_hist, l_hist, r_hist)
        hist_cost = [compute_cost(lax.stop_gradient(xu), Q, q)]
        hist_lam, hist_rho = [lam], [rho]
        for i in range(al_iter):
            xu_in = lax.stop_gradient(xu)
            xu_new, nstatus = self._newton(xu_in, x0, lam, rho, Q, q)
            if streaming:
                # freeze iterates once the rho-cap exit has triggered
                # (`AL_mpc.py:412-421` break)
                xu_new = jnp.where(stopped, xu_in, xu_new)
            xu = xu_new
            # dual / penalty updates under stop_gradient (no_grad block,
            # `AL_mpc.py:314-331`)
            xu_sg = lax.stop_gradient(xu)
            res, _ = full_residuals(
                self._dyn_batched, xu_sg[..., :nx], xu_sg[..., nx:], x0,
                self.u_lower if self.has_u_box else None,
                self.u_upper if self.has_u_box else None,
                obs, self.state_estimator,
            )
            neq = self.T * nx
            lam_next = lam + rho * res
            lam_next = jnp.concatenate(
                [lam_next[:, :neq], jnp.maximum(lam_next[:, neq:], 0.0)], axis=1
            )
            # cap the penalty (the reference relies on f64 headroom and
            # only exits on rho_max in streaming, `AL_mpc.py:412`; in f32
            # an uncapped rho overflows the merit)
            rho_uncapped = rho * 10.0
            rho_next = jnp.minimum(rho_uncapped, self.rho_max)
            if streaming:
                lam = jnp.where(stopped, lam, lam_next)
                rho = jnp.where(stopped, rho, rho_next)
                # the exit compares the *uncapped* update (`AL_mpc.py:412`
                # breaks once rho*10 exceeds rho_max); comparing the
                # capped rho would never trigger
                stopped = jnp.logical_or(
                    stopped, jnp.max(rho_uncapped) > self.rho_max
                )
            else:
                lam, rho = lam_next, rho_next
            hist_cost.append(compute_cost(xu_sg, Q, q))
            hist_lam.append(lam)
            hist_rho.append(rho)
            if compute_Qq is not None and i < al_iter - 1:
                # refresh the cost from the network at the new iterate;
                # the next AL iteration's Newton solve tracks the updated
                # reference (`AL_mpc.py:318` refreshes after the dual
                # update). The final iteration's refresh would be dead
                # code (nothing consumes it), so it is skipped.
                Q_new, q_new = compute_Qq(xu_sg)
                Q = lax.stop_gradient(Q_new.astype(dtype))
                q = lax.stop_gradient(q_new.astype(dtype))

        x, u = xu[..., :nx], xu[..., nx:]
        new_state = ALState(
            lam=lam, rho=rho,
            x=lax.stop_gradient(x), u=lax.stop_gradient(u),
            has_init=jnp.ones((bsz,), bool),
        )
        status = jnp.broadcast_to(stopped, (bsz,)) if streaming else jnp.zeros((bsz,), bool)
        if return_history:
            hist = (jnp.stack(hist_cost), jnp.stack(hist_lam), jnp.stack(hist_rho))
            return x, u, status, new_state, hist
        return x, u, status, new_state

    def solve_linearize_once(self, x0: Array, cost: QuadCost, state: ALState,
                             num_iters: int = 8) -> Tuple[Array, Array, Array, ALState]:
        """Streaming 'linearize once' mode (`al_utils_lin.py`,
        `AL_mpc.py:370-377,388-391`): freeze the dynamics Jacobians at
        the warm-started iterate, run AL iterations on the *linear*
        model with a dyn-res stall exit (masked for jit) and the
        rho-cap exit. O(1) Jacobian evaluations per receding-horizon
        step — the real-time path."""
        nx = self.nx
        dtype = self.dtype
        x0 = x0.astype(dtype)
        Q = cost.Q.astype(dtype)
        q = cost.q.astype(dtype)
        bsz = x0.shape[0]
        x, u, lam, rho = state.x, state.u, state.lam, state.rho

        # freeze the linearization at the current iterate
        x_next, F = self._dyn_jac_batched(x[:, :-1], u[:, :-1])
        xu_lin = jnp.concatenate([x, u], axis=-1)[:, :-1]
        f_lin = x_next - jnp.einsum("btij,btj->bti", F, xu_lin)
        self._lin_current = LinDx(F=lax.stop_gradient(F),
                                  f=lax.stop_gradient(f_lin))

        obs = self._obs_current
        xu = jnp.concatenate([x, u], axis=-1)
        stopped = jnp.zeros((), bool)
        prev_res = jnp.asarray(jnp.inf, dtype)
        neq = self.T * nx
        for i in range(num_iters):
            xu_in = lax.stop_gradient(xu)
            xu_new, _ = self._newton_lin(xu_in, x0, lam, rho, Q, q)
            xu_new = jnp.where(stopped, xu_in, xu_new)
            xu = xu_new
            xu_sg = lax.stop_gradient(xu)
            res, res_c = full_residuals(
                self._lin_dyn, xu_sg[..., :nx], xu_sg[..., nx:], x0,
                self.u_lower if self.has_u_box else None,
                self.u_upper if self.has_u_box else None,
                obs, self.state_estimator,
            )
            lam_next = lam + rho * res
            lam_next = jnp.concatenate(
                [lam_next[:, :neq], jnp.maximum(lam_next[:, neq:], 0.0)], axis=1
            )
            rho_next = jnp.minimum(rho * 10.0, self.rho_max)
            lam = jnp.where(stopped, lam, lam_next)
            rho = jnp.where(stopped, rho, rho_next)
            # stall exit (`AL_mpc.py:406-408`) + rho-cap exit (:412)
            cur_res = jnp.linalg.norm(res_c)
            stopped = jnp.logical_or(
                stopped,
                jnp.logical_or(cur_res >= prev_res, jnp.max(rho) >= self.rho_max),
            )
            prev_res = jnp.minimum(prev_res, cur_res)

        x, u = xu[..., :nx], xu[..., nx:]
        new_state = ALState(
            lam=lam, rho=rho,
            x=lax.stop_gradient(x), u=lax.stop_gradient(u),
            has_init=jnp.ones((bsz,), bool),
        )
        status = jnp.broadcast_to(stopped, (bsz,))
        return x, u, status, new_state

    # -- diagnostics ----------------------------------------------------------
    def kkt_residuals(self, x0, cost, x, u):
        """Constraint violation norms for logging/tests."""
        xu = jnp.concatenate([x, u], axis=-1)
        _, res_c = full_residuals(
            self._dyn_batched, x, u, x0,
            self.u_lower if self.has_u_box else None,
            self.u_upper if self.has_u_box else None,
            self._obs_current, self.state_estimator,
        )
        return jnp.linalg.norm(res_c, axis=-1), compute_cost(
            xu, cost.Q.astype(xu.dtype), cost.q.astype(xu.dtype)
        )
