"""Tracking MPC adapter: network reference -> quadratic tracking cost
-> AL solver.

Counterpart of the reference's `Tracking_MPC`
(`/root/reference/deqmpc/policies.py:1117-1315`): builds the diagonal
cost Q = diag([Qlqr, Rlqr]) per knot point, the linear term
p = -Q * xu_ref and constant f = 0.5 xu_ref'Q xu_ref (compute_pf
:1285-1297), optionally scales Q by the network's per-knot-point
q_scaling (:1245-1248), and calls the AL solver. Gradients reach the
network through p (and Q for the q-scaling variant) via the Newton
solve's implicit custom_vjp.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers import ALMPC, ALState, QuadCost
from ..solvers.al_core import ObstacleSet

Array = jax.Array


class TrackingMPC:
    def __init__(self, env, T: int, al_iter: int = 2,
                 state_estimator: bool = False,
                 dtype=jnp.float32, max_newton_steps: int = 4,
                 rho_max: float = 1e8, dyn_res_tol: float = 1e-3,
                 obstacles: Optional[ObstacleSet] = None, n_obs_sel: int = 4,
                 solver_type: str = "al", qp_iter: int = 1,
                 ip_eps: float = 1e-2, ip_grad_method: str = "analytic",
                 tridiag_backend: str = "auto",
                 aux_cost: Optional[Tuple] = None):
        self.env = env
        self.nx, self.nu, self.T = env.nx, env.nu, T
        self.dtype = dtype
        self.state_estimator = state_estimator
        Q = np.concatenate([np.asarray(env.Qlqr), np.asarray(env.Rlqr)])
        if state_estimator:
            # MHE flavor: cost only on states (`al_utils_se.py:16-41`)
            Q = np.concatenate([np.asarray(env.Qlqr), np.zeros(env.nu)])
        self.Q0 = jnp.asarray(Q, dtype)  # (n,) diagonal template
        # Auxiliary additive cost hook (`policies.py:1148-1170`): a fixed
        # diagonal quadratic pulling toward aux_x, gated per-sample by
        # q_mask. The reference masks only the linear term at the call
        # site (Q gets the unmasked aux_Q, `policies.py:1252-1259`);
        # we reproduce that effective behavior.
        if aux_cost is not None:
            aux_Q_diag, aux_x = aux_cost
            self.aux_Q = jnp.asarray(aux_Q_diag, dtype)
            self.aux_p = -(self.aux_Q * jnp.asarray(aux_x, dtype))
        else:
            self.aux_Q = None
            self.aux_p = None

        def dyn(x, u):
            return env.dynamics(x, u)

        def dyn_jac(x, u):
            xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
            return xn, jnp.concatenate([Jx, Ju], axis=-1)

        self.solver_type = solver_type
        self.ctrl = ALMPC(
            self.nx, self.nu, T,
            u_lower=env.action_space.low, u_upper=env.action_space.high,
            dyn=dyn, dyn_jac=dyn_jac, al_iter=al_iter,
            state_estimator=state_estimator, dtype=dtype,
            max_newton_steps=max_newton_steps, rho_max=rho_max,
            dyn_res_tol=dyn_res_tol,
            obstacles=obstacles, n_obs_sel=n_obs_sel,
            tridiag_backend=tridiag_backend,
        )
        if solver_type == "ip":
            # interior-point SQP alternative (`policies.py:1218-1234`)
            from ..solvers.ip_mpc import IPMPC

            self.ip_ctrl = IPMPC(
                self.nx, self.nu, T,
                u_lower=env.action_space.low, u_upper=env.action_space.high,
                dyn=dyn, dyn_jac=dyn_jac, qp_iter=qp_iter, dtype=dtype,
                eps=ip_eps, grad_method=ip_grad_method,
            )

    def init_state(self, bsz: int) -> ALState:
        """reinitialize (`policies.py:1299-1303`)."""
        return self.ctrl.init_state(bsz)

    def warm_start_state(self, state: ALState, rho_init_max: float) -> ALState:
        return self.ctrl.warm_start_shift(state, rho_init_max)

    def compute_pf(self, xu_ref: Array, Q: Array) -> Tuple[Array, Array]:
        """p = -Q*xu_ref (diag), f = 0.5 xu_ref'Q xu_ref
        (`policies.py:1285-1297`)."""
        p = -Q * xu_ref
        f = 0.5 * jnp.sum(xu_ref * Q * xu_ref, axis=-1)
        return p, f

    def __call__(self, x0: Array, x_ref: Array, u_ref: Array, state: ALState,
                 q_scaling: Optional[Array] = None, al_iters: int = 2,
                 streaming: bool = False, q_mask: Optional[Array] = None,
                 linearize_once: bool = False,
                 model_call: Optional[Callable] = None):
        """Returns (nominal_states, nominal_actions, status, new_state),
        states/actions cast back to the network dtype (f32).

        linearize_once: streaming real-time path — freeze the dynamics
        Jacobians at the warm-started iterate and run the AL loop on the
        linear model (the reference's `linearize_once=True` inside
        `al_solve_stream`, `AL_mpc.py:370-377,388-391`). Only meaningful
        with streaming=True and a warm-started state.

        model_call: optional xu -> xu_ref network closure; when given,
        the solver re-derives (Q, q) from the network between AL
        iterations (`Tracking_MPC.compute_Qq`, `policies.py:1273,
        1312-1315` with `recompute_Qq=True`). Q keeps its fixed diagonal
        template; only the linear pull p tracks the fresh reference."""
        bsz = x0.shape[0]
        net_dtype = x_ref.dtype
        xu_ref = jnp.concatenate([x_ref, u_ref], axis=-1).astype(self.dtype)
        Q_pre = jnp.broadcast_to(self.Q0, (bsz, self.T, self.nx + self.nu))
        if q_scaling is not None:
            # reference adds 1: Q * (q_scaling + 1) (`policies.py:1245-1248`)
            Q_pre = Q_pre * (q_scaling.astype(self.dtype) + 1.0)[:, :, None]
        p, f = self.compute_pf(xu_ref, Q_pre)
        Q = Q_pre
        aux_p_masked = None
        if self.aux_Q is not None:
            mask = (jnp.ones((bsz,), self.dtype) if q_mask is None
                    else q_mask.astype(self.dtype))
            aux_p_masked = self.aux_p * mask[:, None, None]
            p = p + aux_p_masked
            Q = Q + self.aux_Q
        cost = QuadCost(Q=Q, q=p, f=f)
        if self.solver_type == "ip":
            x, u = self.ip_ctrl.solve(x0, cost, x_init=x_ref, u_init=u_ref)
            status = jnp.zeros((bsz,), bool)
            return x.astype(net_dtype), u.astype(net_dtype), status, state
        obs_sel = (self.ctrl.select_obstacles(x_ref.astype(self.dtype))
                   if self.ctrl._all_obstacles is not None else None)
        compute_Qq = None
        if model_call is not None:
            if linearize_once and streaming:
                # solve_linearize_once has no between-iteration cost
                # refresh; silently dropping the closure would disable
                # the opt-in re-entrancy without telling the user
                raise ValueError(
                    "recompute_Qq is not supported on the linearize-once "
                    "streaming path (the frozen-Jacobian solver takes no "
                    "compute_Qq); disable one of the two flags")

            def compute_Qq(xu):
                # Refresh cadence: (Q, q) are re-derived once per AL
                # iteration, not inside every Newton cost evaluation as
                # the reference does (`AL_mpc.py:301` via the NewtonAL
                # cost closure, `al_utils.py:473-478`) — a deliberate,
                # coarser cadence that keeps the Newton inner loop free
                # of network calls (one jitted region, SURVEY §1).
                # Mirror the initial cost construction: p from the
                # pre-aux Q template, then re-add the masked aux pull.
                xu_ref_new = model_call(xu)
                p_new, _ = self.compute_pf(xu_ref_new.astype(self.dtype), Q_pre)
                if aux_p_masked is not None:
                    p_new = p_new + aux_p_masked
                return Q, p_new

        if linearize_once and streaming:
            # fixed budget of 8 linear-model AL iterations (the solver
            # default): the masked stall / rho-cap exits govern actual
            # termination, matching the reference's up-to-100 loop with
            # early exits (`AL_mpc.py:378-421`) rather than the outer
            # al_iters=2 which would under-iterate the penalty schedule
            x, u, status, new_state = self.ctrl.solve_linearize_once(
                x0, cost, state,
            )
        else:
            x, u, status, new_state = self.ctrl.solve(
                x0, cost, state, al_iter=al_iters,
                x_init=x_ref, u_init=u_ref, streaming=streaming,
                obstacles=obs_sel, compute_Qq=compute_Qq,
            )
        return x.astype(net_dtype), u.astype(net_dtype), status, new_state
