"""DEQ-MPC policy variants (reference `deqmpc/policies.py:283-504`).

- DEQMPCPolicyHistory     (:283-315): observation-history input.
- DEQMPCPolicyHistoryEstPred (:317-407): history input + a second
  Tracking_MPC in state-estimator (MHE) mode refining the estimated
  history each iteration.
- DEQMPCPolicyFeedback    (:409-428): feeds the optimizer trajectory
  back alongside the network trajectory.
- DEQMPCPolicyQ           (:430-504): the network additionally emits
  per-knot-point Q scalings passed into the tracking cost.
- DEQMPCPolicyMem: DEQLayerMem-backed policy (`--addmem`,
  `policies.py:94-95,130-132`).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from ..models.deq_layer_variants import (DEQLayerDelta, DEQLayerFeedback,
                                         DEQLayerHistory,
                                         DEQLayerHistoryState,
                                         DEQLayerHistoryStateEstPred,
                                         DEQLayerMem, DEQLayerQ)
from .deqmpc_policy import DEQMPCPolicy, PolicyCarry, PolicyConfig
from .tracking_mpc import TrackingMPC

Array = jax.Array


class DEQMPCPolicyMem(DEQMPCPolicy):
    def _make_model(self, mcfg):
        return DEQLayerMem(mcfg)

    def forward(self, params, obs, qp_solve=True, lastqp_solve=False):
        bsz = obs.shape[0]
        x_ref = jnp.broadcast_to(obs[:, None], (bsz, self.T, self.nx))
        aux = {
            "x": lax.stop_gradient(x_ref),
            "u": jnp.zeros((bsz, self.T, self.nu), obs.dtype),
            "z": self.model.init_z(bsz),
            "mem": self.model.init_mem(bsz),
            "old_mem": self.model.init_mem(bsz),
        }
        sol_state = self.tracking_mpc.init_state(bsz)
        policy_out, carry = self._deqmpc_iter(
            params, obs, aux, sol_state, qp_solve, lastqp_solve, warm_start=False
        )
        policy_out["init_states"] = x_ref
        return policy_out, carry


class DEQMPCPolicyDelta(DEQMPCPolicy):
    """DEQLayerDelta-backed policy (`--policy_variant delta`): learned
    per-iteration output scales + iteration embeddings, deltas relative
    to the previous prediction (the reference reaches this layer by
    swapping the model class at `policies.py:92`,
    `deq_layer.py:422-507`). The `scales` parameters receive no
    gradient (straight-through `scale_multiply_st`); the trainer
    updates them by EMA of per-iteration prediction-error medians
    (`update_scales`, `deq_layer_utils.py:55-63`)."""

    is_delta = True

    def _make_model(self, mcfg):
        return DEQLayerDelta(mcfg)


class DEQMPCPolicyHistory(DEQMPCPolicy):
    """Observation history input (H steps); model is
    DEQLayerHistoryState (deq_out_type=1) or DEQLayerHistory
    (deq_out_type=2)."""

    takes_history = True

    def __init__(self, cfg: PolicyConfig, env, H: int = 1, obstacles=None):
        self.H = H
        super().__init__(cfg, env, obstacles=obstacles)

    def _make_model(self, mcfg):
        if self.cfg.deq_out_type == 2:
            return DEQLayerHistory(mcfg, H=self.H)
        return DEQLayerHistoryState(mcfg, H=self.H)

    def forward(self, params, obs_hist, qp_solve=True, lastqp_solve=False):
        bsz = obs_hist.shape[0]
        obs_hist = obs_hist.reshape(bsz, self.H, self.nx)
        x_t = obs_hist[:, -1]
        x_ref = jnp.broadcast_to(x_t[:, None], (bsz, self.T, self.nx))
        aux = {
            "x": lax.stop_gradient(x_ref),
            "u": jnp.zeros((bsz, self.T, self.nu), obs_hist.dtype),
            "z": self.model.init_z(bsz),
        }
        sol_state = self.tracking_mpc.init_state(bsz)
        policy_out, carry = self._deqmpc_iter(
            params, obs_hist, aux, sol_state, qp_solve, lastqp_solve,
            warm_start=False,
        )
        policy_out["init_states"] = x_ref
        return policy_out, carry


class DEQMPCPolicyHistoryEstPred(DEQMPCPolicyHistory):
    """History input + MHE state estimator: a second AL solver in
    state-estimator mode refines the estimated history every
    iteration (`policies.py:317-407`)."""

    takes_action_history = True  # forward consumes u_hist (`u_gt_est`)

    def __init__(self, cfg: PolicyConfig, env, H: int = 1, obstacles=None):
        super().__init__(cfg, env, H=H, obstacles=obstacles)
        self.state_estimator = TrackingMPC(
            env, H, al_iter=cfg.al_iter, state_estimator=True,
            dtype=cfg.solver_dtype, max_newton_steps=cfg.max_newton_steps,
            rho_max=cfg.rho_max, dyn_res_tol=cfg.dyn_res_tol,
        )

    def _make_model(self, mcfg):
        if self.cfg.deq_out_type == 2:
            return DEQLayerHistory(mcfg, H=self.H)
        return DEQLayerHistoryStateEstPred(mcfg, H=self.H)

    def forward(self, params, obs_hist, u_hist, qp_solve=True,
                lastqp_solve=False):
        """u_hist: (bsz, H, nu) actions over the history window
        (`u_gt_est`, `policies.py:329,373`)."""
        cfg = self.cfg
        bsz = obs_hist.shape[0]
        obs_hist = obs_hist.reshape(bsz, self.H, self.nx)
        x_t = obs_hist[:, -1]
        x_ref = jnp.broadcast_to(x_t[:, None], (bsz, self.T, self.nx))
        aux = {
            "x": lax.stop_gradient(x_ref),
            "u": jnp.zeros((bsz, self.T, self.nu), obs_hist.dtype),
            "z": self.model.init_z(bsz),
            "x_est": obs_hist,
        }
        sol_state = self.tracking_mpc.init_state(bsz)
        est_state = self.state_estimator.init_state(bsz)
        trajs, x_ests = [], []
        fwd_errs, fwd_steps = [], []
        status = jnp.zeros((bsz,), bool)
        for i in range(self.deq_iter):
            out_mpc, aux = self.model(params, {"o": obs_hist},
                                      {**aux, "iter": i})
            x_t_i = out_mpc["x_t"]
            x_ref_i, u_ref_i = out_mpc["x_ref"], out_mpc["u_ref"]
            x_est = aux["x_est"]
            ns, na = x_ref_i, u_ref_i
            ns_est = x_est
            if qp_solve:
                # MHE refinement of the estimated history
                ns_est, _, _, est_state = self.state_estimator(
                    x_est[:, 0], x_est, u_hist, est_state,
                    al_iters=cfg.al_iter,
                )
                ns, na, status, sol_state = self.tracking_mpc(
                    x_t_i, x_ref_i, u_ref_i, sol_state, al_iters=cfg.al_iter,
                )
                aux = {**aux, "x": ns, "u": na, "x_est": ns_est}
            x_ests.append((x_est, ns_est))
            trajs.append((x_ref_i, ns, na))
            if aux.get("deq_fwd_err") is not None:
                fwd_errs.append(aux["deq_fwd_err"])
                fwd_steps.append(aux["deq_fwd_steps"])
        if lastqp_solve:
            ns, na, status, sol_state = self.tracking_mpc(
                out_mpc["x_t"], out_mpc["x_ref"], out_mpc["u_ref"], sol_state,
                al_iters=10,
            )
            trajs[-1] = (out_mpc["x_ref"], ns, na)
        policy_out = {
            "trajs": trajs,
            "nominal_x_ests": x_ests,
            "status": status,
            "init_states": x_ref,
        }
        if fwd_errs:
            policy_out["deq_stats"] = {
                "fwd_err": jnp.stack(fwd_errs),
                "fwd_steps": jnp.stack(fwd_steps),
            }
        # streaming carry is not defined for the EstPred variant in the
        # reference either (`policies.py:353-407` has no save_out_aux)
        return policy_out, None


class DEQMPCPolicyFeedback(DEQMPCPolicy):
    def _make_model(self, mcfg):
        return DEQLayerFeedback(mcfg)

    def forward(self, params, obs, qp_solve=True, lastqp_solve=False):
        bsz = obs.shape[0]
        x_ref = jnp.broadcast_to(obs[:, None], (bsz, self.T, self.nx))
        aux = {
            "x": lax.stop_gradient(x_ref),
            "xn": lax.stop_gradient(x_ref),
            "u": jnp.zeros((bsz, self.T, self.nu), obs.dtype),
            "z": self.model.init_z(bsz),
        }
        sol_state = self.tracking_mpc.init_state(bsz)
        policy_out, carry = self._deqmpc_iter(
            params, obs, aux, sol_state, qp_solve, lastqp_solve,
            warm_start=False,
        )
        policy_out["init_states"] = x_ref
        return policy_out, carry


class DEQMPCPolicyQ(DEQMPCPolicy):
    """Per-knot-point Q-scaling prediction
    (`policies.py:430-504`)."""

    def _make_model(self, mcfg):
        return DEQLayerQ(mcfg)

    def forward(self, params, obs, qp_solve=True, lastqp_solve=False):
        cfg = self.cfg
        bsz = obs.shape[0]
        x_ref = jnp.broadcast_to(obs[:, None], (bsz, self.T, self.nx))
        aux = {
            "x": lax.stop_gradient(x_ref),
            "u": jnp.zeros((bsz, self.T, self.nu), obs.dtype),
            "z": self.model.init_z(bsz),
            "q": jnp.ones((bsz, self.T), obs.dtype),
        }
        sol_state = self.tracking_mpc.init_state(bsz)
        trajs, q_scalings = [], []
        fwd_errs, fwd_steps = [], []
        status = jnp.zeros((bsz,), bool)
        for i in range(self.deq_iter):
            out_mpc, aux = self.model(params, {"o": obs}, {**aux, "iter": i})
            x_t, x_ref_i, u_ref_i = out_mpc["x_t"], out_mpc["x_ref"], out_mpc["u_ref"]
            q_scaling = out_mpc["q"]
            ns, na = x_ref_i, u_ref_i
            if qp_solve:
                ns, na, status, sol_state = self.tracking_mpc(
                    x_t, x_ref_i, u_ref_i, sol_state,
                    q_scaling=q_scaling, al_iters=cfg.al_iter,
                )
            q_scalings.append(q_scaling)
            trajs.append((x_ref_i, ns, na))
            if aux.get("deq_fwd_err") is not None:
                fwd_errs.append(aux["deq_fwd_err"])
                fwd_steps.append(aux["deq_fwd_steps"])
        if lastqp_solve:
            ns, na, status, sol_state = self.tracking_mpc(
                x_t, x_ref_i, u_ref_i, sol_state, al_iters=10,
            )
            trajs[-1] = (x_ref_i, ns, na)
        policy_out = {
            "trajs": trajs,
            "q_scaling": q_scalings,
            "status": status,
            "init_states": x_ref,
        }
        if fwd_errs:
            policy_out["deq_stats"] = {
                "fwd_err": jnp.stack(fwd_errs),
                "fwd_steps": jnp.stack(fwd_steps),
            }
        carry = PolicyCarry(
            z=lax.stop_gradient(aux["z"]),
            x=lax.stop_gradient(aux["x"]),
            u=lax.stop_gradient(aux["u"]),
            solver=sol_state,
        )
        return policy_out, carry
