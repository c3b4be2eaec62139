"""DEQ-MPC policies: the outer network <-> optimizer iteration.

Counterpart of the reference's `DEQMPCPolicy`
(`/root/reference/deqmpc/policies.py:79-281`): N = deq_iter rounds of
{network proposal -> AL tracking solve}, every round's
(network-trajectory, optimizer-trajectory) pair is recorded for
per-iteration supervision; a warm-start (streaming / receding-horizon)
variant shifts the carried iterate one step and reuses solver duals
(`policies.py:205-281`).

Functional design: `forward(params, obs, ...)` returns
(policy_out, carry) where carry is an explicit pytree (aux iterate +
AL solver state) replacing the reference's module attributes
(`self.out_aux_dict`, solver `lamda_prev/rho_prev`). The whole
forward — including all deq_iter AL solves — is one jittable program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.deq_layer import DEQLayer, DEQLayerConfig, FFDNetwork
from ..solvers import ALState
from .tracking_mpc import TrackingMPC

Array = jax.Array


class PolicyCarry(NamedTuple):
    """Streaming-mode carry: shifted network aux iterate + solver state."""

    z: Array
    x: Array
    u: Array
    solver: ALState


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    nx: int
    nu: int
    nq: int
    T: int
    dt: float
    bsz: int = 128
    hdim: int = 128
    layer_type: str = "gcn"
    deq_iter: int = 6
    deq_reg: float = 0.1
    out_type: int = 1        # policy_out_type (`train.py:64`)
    deq_out_type: int = 1
    loss_type: str = "l1"
    deq_type: str = "deq"    # 'deq' | 'nn'
    fp_type: str = "anderson"
    fp_max_steps: int = 10
    fp_m: int = 5
    grad_type: str = "fp_grad"
    kernel_width: int = 3
    al_iter: int = 2
    solver_dtype: Any = jnp.float32
    max_newton_steps: int = 4
    rho_max: float = 1e8
    rho_init_max: float = 1e4
    dyn_res_tol: float = 1e-3
    solver_type: str = "al"   # 'al' | 'ip' (`train.py:61`)
    qp_iter: int = 1
    # IP/SQP path knobs: per-sample convergence threshold (`--eps`,
    # `qp_wrapper.py:173,377`) and linearization method
    # (`qp_wrapper.py:27-31` GradMethods)
    ip_eps: float = 1e-2
    ip_grad_method: str = "analytic"
    # network-trunk matmul dtype (None=f32, jnp.bfloat16 for MXU rate);
    # see DEQLayerConfig.compute_dtype
    compute_dtype: Any = None
    # streaming real-time path: freeze dynamics Jacobians per tick
    # (`AL_mpc.py:370-391` linearize_once)
    linearize_once: bool = False
    # solver->network re-entrancy: re-derive the tracking cost from the
    # network between AL iterations (`AL_mpc.py:173` recompute_Qq,
    # default off in the reference too)
    recompute_Qq: bool = False
    # obstacle handling: `obstacle_net_input` appends per-knot nearest-
    # sphere features to the network input (the reference's network is
    # blind; see DEQLayerConfig.obstacle_centers); `obstacle_constraints`
    # gates the solver's sphere rows (`AL_mpc_custom.py`) so a
    # net-aware policy can be ablated without constraint rows while
    # keeping the same parameter tree
    obstacle_net_input: bool = False
    obstacle_constraints: bool = True


class DEQMPCPolicy:
    takes_history = False  # history variants consume (bsz, H, nx) obs

    def __init__(self, cfg: PolicyConfig, env, obstacles=None):
        self.cfg = cfg
        self.env = env
        self.nx, self.nu, self.nq, self.T = cfg.nx, cfg.nu, cfg.nq, cfg.T
        self.out_type = cfg.out_type
        self.loss_type = cfg.loss_type
        self.deq_reg = cfg.deq_reg
        self.deq_iter = cfg.deq_iter
        net_aware = cfg.obstacle_net_input and obstacles is not None
        mcfg = DEQLayerConfig(
            nx=cfg.nx, nu=cfg.nu, nq=cfg.nq, T=cfg.T, dt=cfg.dt,
            hdim=cfg.hdim, layer_type=cfg.layer_type, deq_iter=cfg.deq_iter,
            fp_type=cfg.fp_type, fp_m=cfg.fp_m, fp_max_steps=cfg.fp_max_steps,
            grad_type=cfg.grad_type, kernel_width=cfg.kernel_width,
            compute_dtype=cfg.compute_dtype,
            obstacle_centers=(obstacles.centers if net_aware else None),
            obstacle_radius=(float(obstacles.radius) if net_aware else 0.0),
        )
        self.model = FFDNetwork(mcfg) if cfg.deq_type == "nn" else self._make_model(mcfg)
        # Warm-restart penalty: the reference clamps rho <= rho_init_max
        # =1e4 under rho_max=1e8 (`AL_mpc.py:590-591`) — i.e. every
        # receding-horizon tick re-sweeps FOUR decades of the rho
        # schedule. Under a smaller (f32) rho_max, carrying 1e4 leaves
        # the solver pinned at the cap from the first Newton step and
        # warm-started closed-loop control collapses (measured: 0%
        # success at rho_init_max=1e4/rho_max=1e5 vs 100% at 10/1e5 on
        # rex_quadrotor). Preserve the schedule depth, not the constant.
        self.rho_warm_max = min(cfg.rho_init_max, cfg.rho_max * 1e-4)
        self.tracking_mpc = TrackingMPC(
            env, cfg.T, al_iter=cfg.al_iter, dtype=cfg.solver_dtype,
            max_newton_steps=cfg.max_newton_steps, rho_max=cfg.rho_max,
            dyn_res_tol=cfg.dyn_res_tol,
            obstacles=(obstacles if cfg.obstacle_constraints else None),
            solver_type=cfg.solver_type, qp_iter=cfg.qp_iter,
            ip_eps=cfg.ip_eps, ip_grad_method=cfg.ip_grad_method,
        )

    def _make_model(self, mcfg):
        return DEQLayer(mcfg)

    def init(self, rng: Array) -> Dict:
        return self.model.init(rng)

    # -- cold-start forward (`policies.py:107-203`) ---------------------------
    def forward(self, params, obs: Array, qp_solve: bool = True,
                lastqp_solve: bool = False) -> Tuple[Dict, PolicyCarry]:
        cfg = self.cfg
        bsz = obs.shape[0]
        x_ref = jnp.broadcast_to(obs[:, None], (bsz, self.T, self.nx))
        u_ref = jnp.zeros((bsz, self.T, self.nu), obs.dtype)
        aux = {
            "x": lax.stop_gradient(x_ref),
            "u": u_ref,
            "z": self.model.init_z(bsz),
        }
        sol_state = self.tracking_mpc.init_state(bsz)
        policy_out, carry = self._deqmpc_iter(
            params, obs, aux, sol_state, qp_solve, lastqp_solve,
            warm_start=False,
        )
        policy_out["init_states"] = x_ref
        return policy_out, carry

    # -- streaming forward (`policies.py:205-259`) ----------------------------
    def forward_warm_start(self, params, obs: Array, carry: PolicyCarry,
                           qp_solve: bool = True, lastqp_solve: bool = False
                           ) -> Tuple[Dict, PolicyCarry]:
        aux = {"x": carry.x, "u": carry.u, "z": carry.z}
        sol_state = carry.solver
        policy_out, new_carry = self._deqmpc_iter(
            params, obs, aux, sol_state, qp_solve, lastqp_solve,
            warm_start=True,
        )
        policy_out["init_states"] = carry.x
        return policy_out, new_carry

    def _deqmpc_iter(self, params, obs, aux, sol_state, qp_solve,
                     lastqp_solve, warm_start: bool):
        cfg = self.cfg
        trajs = []
        fwd_errs, fwd_steps = [], []
        status = jnp.zeros((obs.shape[0],), bool)
        x_t = obs
        x_ref, u_ref = aux["x"], aux["u"]
        for i in range(self.deq_iter):
            it = i + 2 if warm_start else i
            out_mpc, aux = self.model(params, {"o": obs}, {**aux, "iter": it})
            x_t, x_ref, u_ref = out_mpc["x_t"], out_mpc["x_ref"], out_mpc["u_ref"]
            if warm_start and i == 0:
                # shift duals/primal for the receding-horizon step
                # (`policies.py:230`, `AL_mpc.py:581-591`)
                sol_state = self.tracking_mpc.warm_start_state(
                    sol_state, self.rho_warm_max
                )
            ns, na = x_ref, u_ref
            model_call = None
            if cfg.recompute_Qq:
                # solver->network closure (`policies.py:165,261-270`):
                # run the cell on the solver's current iterate and return
                # the refreshed reference. Aux updates are discarded
                # (the reference's `mem_update=False`); the call runs
                # under stop_gradient like the reference's no_grad.
                def model_call(xu, _aux=aux, _it=it):
                    x_r = lax.stop_gradient(xu[..., : self.nx]).astype(obs.dtype)
                    u_r = lax.stop_gradient(xu[..., self.nx:]).astype(obs.dtype)
                    out_mc, _ = self.model(
                        params, {"o": obs},
                        {**_aux, "x": x_r, "u": u_r, "iter": _it})
                    return jnp.concatenate(
                        [out_mc["x_ref"], out_mc["u_ref"]], axis=-1)
            if qp_solve:
                ns, na, status, sol_state = self.tracking_mpc(
                    x_t, x_ref, u_ref, sol_state, al_iters=cfg.al_iter,
                    streaming=warm_start,
                    linearize_once=warm_start and cfg.linearize_once,
                    model_call=model_call,
                )
                aux = {**aux, "x": ns, "u": na}
            if lastqp_solve:
                trajs.append((x_ref, lax.stop_gradient(ns), lax.stop_gradient(na)))
            else:
                trajs.append((x_ref, ns, na))
            if aux.get("deq_fwd_err") is not None:
                fwd_errs.append(aux["deq_fwd_err"])
                fwd_steps.append(aux["deq_fwd_steps"])
        if lastqp_solve:
            ns, na, status, sol_state = self.tracking_mpc(
                x_t, x_ref, u_ref, sol_state, al_iters=10,
            )
            trajs[-1] = (x_ref, ns, na)
        carry = self._save_carry(aux, sol_state)
        policy_out = {"trajs": trajs, "status": status}
        if fwd_errs:
            policy_out["deq_stats"] = {
                "fwd_err": jnp.stack(fwd_errs),
                "fwd_steps": jnp.stack(fwd_steps),
            }
        return policy_out, carry

    def _save_carry(self, aux, sol_state) -> PolicyCarry:
        """Receding-horizon shift of the carried iterate
        (`policies.py:272-281`): roll z/x/u left one step, repeat the
        last entry."""

        def shift_traj(a):
            # x/u trajectories: known (bsz, T, nx|nu) layout, roll the
            # time axis left (`policies.py:272-281`)
            return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

        def shift_z(a):
            # z leaves carry a time axis only in the conv trunks:
            # (bsz, T|T-1, hdim), always 3-D with trailing features.
            # The mlp latent is (bsz, hdim) — 2-D, no time structure —
            # so dispatch on rank, not a bare shape match (a 2-D leaf
            # with hdim == T must not get its feature axis rolled).
            if a.ndim == 3 and a.shape[1] in (self.T, self.T - 1):
                return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            return a

        shift_tree = lambda t: jax.tree_util.tree_map(shift_z, t)
        return PolicyCarry(
            z=lax.stop_gradient(shift_tree(aux["z"])),
            x=lax.stop_gradient(shift_traj(aux["x"])),
            u=lax.stop_gradient(shift_traj(aux["u"])),
            solver=sol_state,
        )


class NNMPCPolicy(DEQMPCPolicy):
    """Feed-forward network + optional final AL solve
    (`policies.py:1317-1377`)."""

    def __init__(self, cfg: PolicyConfig, env, obstacles=None):
        cfg = dataclasses.replace(cfg, deq_type="nn", deq_iter=1)
        super().__init__(cfg, env, obstacles=obstacles)
