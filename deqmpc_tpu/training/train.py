"""Training CLI: imitation learning of DEQ-MPC policies.

Counterpart of the reference's `deqmpc/train.py` (flag surface
:36-104, model_type presets :108-139, train loop :293-336) and of the
missing `fwd_funcs.py` (`global_fwd`/`streaming_fwd`/`validate_policy`,
interfaces fixed by `train.py:319-325,358`).

TPU-native structure: sampling runs host-side; one jitted
`train_step(params, opt_state, batch)` contains the full
{deq_iter x (network -> AL solve)} forward, the per-iteration loss,
backward through the implicit solver gradients, gradient clipping and
the Adam update. With a sharded batch axis this same function is the
multi-chip data-parallel step (see `deqmpc_tpu/parallel`).

Example:
    python -m deqmpc_tpu.training.train --env pendulum \
        --model_type deq-mpc-deq --T 5 --deq_iter 6 --hdim 256 --bsz 128
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import utils
from ..data import get_gt_data, merge_gt_data, sample_trajectory
from ..envs import make_env
from ..policies import (DEQMPCPolicy, NNMPCPolicy, PolicyConfig,
                        compute_loss_deqmpc, compute_loss_deqmpc_hist)


def build_argparser() -> argparse.ArgumentParser:
    """Flag surface mirrors the reference CLI (`train.py:36-104`)."""
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="pendulum",
                   choices=["pendulum", "pendulum_stabilize", "integrator",
                            "cartpole1link", "cartpole2link", "rexquadrotor",
                            "FlyingCartpole", "FlyingCartpole_obstacles",
                            "FlyingCartpole_obstacles_dense"])
    p.add_argument("--nq", type=int, default=-1)
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--H", type=int, default=1)
    p.add_argument("--qp_iter", type=int, default=1)
    p.add_argument("--eps", type=float, default=1e-2,
                   help="IP/SQP path per-sample convergence threshold "
                        "(`qp_wrapper.py:173,377`); only used with "
                        "--solver_type ip")
    p.add_argument("--ip_grad_method", type=str, default="analytic",
                   choices=["analytic", "autodiff", "finite_diff"],
                   help="IP-path dynamics linearization "
                        "(`qp_wrapper.py:27-31` GradMethods)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--warm_start", type=bool, default=True)
    p.add_argument("--bsz", type=int, default=128)
    p.add_argument("--deq", action="store_true")
    p.add_argument("--hdim", type=int, default=128)
    p.add_argument("--deq_iter", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--save", action="store_true")
    # the reference also parses `--test` (train.py:53) and `--pooling`
    # (:60), but neither is ever read (`pooling` is assigned to a
    # never-called `global_pooling` table, `deq_layer.py:202-206`);
    # dead flags are intentionally not reproduced
    p.add_argument("--layer_type", type=str, default="gcn")
    p.add_argument("--kernel_width", type=int, default=3)
    p.add_argument("--compute_dtype", choices=["f32", "bf16"], default="f32",
                   help="network-trunk matmul dtype; bf16 runs the MXU "
                        "at full rate (params/norms/solver stay f32)")
    p.add_argument("--pretrain", action="store_true",
                   help="network-only ('deq'-mode) supervision for the "
                        "first 5000 steps (`train.py:310-312` "
                        "pretrain_done gating)")
    p.add_argument("--model_type", type=str, default="deq-mpc-deq",
                   choices=["deq-mpc-deq", "deq", "nn", "diff-mpc-deq",
                            "diff-mpc-nn", "deq-mpc-nn"])
    p.add_argument("--lastqp_solve", action="store_true")
    p.add_argument("--qp_solve", action="store_true")
    p.add_argument("--solver_type", type=str, default="al")
    p.add_argument("--dtype", type=str, default="float32",
                   help="solver dtype; 'double' needs CPU or jax_enable_x64")
    # data-noise augmentation (`train.py:67-70`; types in
    # `deqmpc_tpu/data/noise_utils.py`)
    p.add_argument("--data_noise_type", type=int, default=0)
    p.add_argument("--data_noise_std", type=float, default=0.05)
    p.add_argument("--data_noise_mean", type=float, default=0.3)
    p.add_argument("--deq_out_type", type=int, default=1)
    p.add_argument("--policy_out_type", type=int, default=1)
    p.add_argument("--loss_type", type=str, default="l1")
    p.add_argument("--deq_reg", type=float, default=0.1)
    p.add_argument("--grad_coeff", action="store_true")
    p.add_argument("--num_trajs_frac", type=float, default=1.0)
    p.add_argument("--rho_init_max", type=float, default=1e4)
    p.add_argument("--rho_max", type=float, default=None,
                   help="penalty cap; default 1e5 (f32) / 1e8 (double)")
    p.add_argument("--max_train_steps", type=int, default=20000)
    p.add_argument("--val_every", type=int, default=100)
    # DEQ specifics
    p.add_argument("--fp_type", type=str, default="anderson",
                   choices=["single", "multi", "broyden", "anderson"])
    p.add_argument("--inner_deq_iters", type=int, default=4)
    p.add_argument("--grad_type", type=str, default="fp_grad")
    p.add_argument("--addmem", action="store_true")
    p.add_argument("--recompute_Qq", action="store_true",
                   help="re-derive the tracking cost from the network "
                        "between AL iterations (solver->network "
                        "re-entrancy; reference AL_mpc.py:173, default "
                        "off there too)")
    p.add_argument("--obstacle_net_input", action="store_true",
                   help="append per-knot nearest-obstacle features to the "
                        "network input (obstacle-aware reference; the "
                        "plain reference is blind and re-points through "
                        "spheres, see PARITY.md obstacle row)")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--linearize_once", action="store_true",
                   help="streaming ticks freeze the dynamics Jacobians at "
                        "the warm-started iterate (the reference's "
                        "linearize_once real-time path, AL_mpc.py:370-391)")
    p.add_argument("--streaming_steps", type=int, default=3)
    p.add_argument("--streaming_start_iter", type=int, default=0)
    p.add_argument("--deq_type", type=str, default="deq", choices=["deq", "nn"])
    p.add_argument("--policy_variant", type=str, default="base",
                   choices=["base", "mem", "history", "estpred", "feedback",
                            "q", "delta"],
                   help="DEQ-MPC policy variant (the reference selects the "
                        "class in code, `policies.py:283-504`)")
    p.add_argument("--Qscale", type=float, default=1.0)
    p.add_argument("--m", type=int, default=5)
    p.add_argument("--max_steps", type=int, default=10)
    p.add_argument("--teacher", type=str, default="mpc")
    # loading / eval
    p.add_argument("--load", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval_ep_len", type=int, default=None,
                   help="closed-loop eval episode length; default "
                        "env._max_episode_steps")
    p.add_argument("--eval_episodes", type=int, default=32)
    p.add_argument("--eval_warm_start", choices=["auto", "on", "off"],
                   default="auto",
                   help="closed-loop eval forward mode: 'on' = warm-"
                        "started receding-horizon steps, 'off' = cold "
                        "start per step, 'auto' = warm iff --streaming "
                        "(the reference eval interface passes warm_start "
                        "explicitly, train.py:258-263)")
    p.add_argument("--eval_x_window", type=str, default=None,
                   help="comma-separated per-dim reset half-widths "
                        "(euler-space) overriding env.x_window for eval "
                        "(reference reset x_window override, "
                        "rex_quadrotor.py:260-270)")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--start_iter", type=int, default=-1)
    p.add_argument("--logdir", type=str, default="./logs")
    p.add_argument("--models_dir", type=str, default="./model")
    return p


def apply_model_type_presets(args):
    """`train.py:108-139`."""
    mt = args.model_type
    if mt == "deq-mpc-deq":
        args.deq, args.qp_solve, args.lastqp_solve = True, True, False
    elif mt == "deq-mpc-nn":
        args.deq, args.qp_solve, args.lastqp_solve = True, True, False
        args.deq_type = "nn"
    elif mt == "deq":
        args.deq, args.qp_solve, args.lastqp_solve = True, False, False
        args.deq_iter = 1
    elif mt == "nn":
        args.deq, args.qp_solve, args.lastqp_solve = False, False, False
        args.deq_iter = 1
    elif mt == "diff-mpc-deq":
        args.deq, args.qp_solve, args.lastqp_solve = True, False, True
        args.deq_iter = 1
    elif mt == "diff-mpc-nn":
        args.deq, args.qp_solve, args.lastqp_solve = True, False, True
        args.deq_iter = 1
        args.deq_type = "nn"
    return args


def build_policy(args, env, obstacles=None):
    nq = args.nq if args.nq > 0 else env.nq if env.nq <= env.nx // 2 else env.nx // 2
    solver_dtype = jnp.float64 if args.dtype == "double" else jnp.float32
    rho_max = args.rho_max
    if rho_max is None:
        rho_max = 1e8 if args.dtype == "double" else 1e5
    cfg = PolicyConfig(
        nx=env.nx, nu=env.nu, nq=min(nq, env.nx // 2), T=args.T, dt=env.dt,
        bsz=args.bsz, hdim=args.hdim, layer_type=args.layer_type,
        deq_iter=args.deq_iter, deq_reg=args.deq_reg,
        out_type=args.policy_out_type, deq_out_type=args.deq_out_type,
        loss_type=args.loss_type, deq_type=args.deq_type,
        fp_type=args.fp_type, fp_max_steps=int(args.max_steps), fp_m=args.m,
        grad_type=args.grad_type, kernel_width=args.kernel_width,
        al_iter=2, solver_dtype=solver_dtype,
        rho_init_max=args.rho_init_max, rho_max=rho_max,
        solver_type=args.solver_type, qp_iter=args.qp_iter,
        ip_eps=getattr(args, "eps", 1e-2),
        ip_grad_method=getattr(args, "ip_grad_method", "analytic"),
        linearize_once=getattr(args, "linearize_once", False),
        recompute_Qq=getattr(args, "recompute_Qq", False),
        obstacle_net_input=getattr(args, "obstacle_net_input", False),
        obstacle_constraints=getattr(args, "obstacle_constraints", True),
        compute_dtype=(jnp.bfloat16
                       if getattr(args, "compute_dtype", "f32") == "bf16"
                       else None),
    )
    if not args.deq:
        return NNMPCPolicy(cfg, env, obstacles=obstacles)
    variant = getattr(args, "policy_variant", "base")
    if getattr(args, "addmem", False):
        variant = "mem"
    if variant != "base":
        from ..policies.policy_variants import (DEQMPCPolicyDelta,
                                                DEQMPCPolicyFeedback,
                                                DEQMPCPolicyHistory,
                                                DEQMPCPolicyHistoryEstPred,
                                                DEQMPCPolicyMem,
                                                DEQMPCPolicyQ)

        if variant == "mem":
            return DEQMPCPolicyMem(cfg, env, obstacles=obstacles)
        if variant == "delta":
            return DEQMPCPolicyDelta(cfg, env, obstacles=obstacles)
        if variant == "history":
            return DEQMPCPolicyHistory(cfg, env, H=args.H, obstacles=obstacles)
        if variant == "estpred":
            return DEQMPCPolicyHistoryEstPred(cfg, env, H=args.H,
                                              obstacles=obstacles)
        if variant == "feedback":
            return DEQMPCPolicyFeedback(cfg, env, obstacles=obstacles)
        if variant == "q":
            return DEQMPCPolicyQ(cfg, env, obstacles=obstacles)
    return DEQMPCPolicy(cfg, env, obstacles=obstacles)


def build_obstacles(env):
    """Obstacle field -> solver constraints: the reference threads the
    env's obstacle set into Obstacle_MPC (`qpth/AL_mpc_custom.py:100-135`
    via `deqmpc/policies.py:1200-1216`); here the per-(b,t) nearest-k
    sphere constraints live in ALMPC and need the ObstacleSet at policy
    build time. Returns None for obstacle-free envs."""
    if not getattr(env, "obstacles", False):
        return None
    from ..solvers import ObstacleSet

    return ObstacleSet(
        centers=jnp.asarray(env.obstacle_positions),
        radius=float(env.obstacle_radius),
    )


def unnormalize_for_env(env_name, x):
    if env_name.startswith("pendulum"):
        return utils.unnormalize_states_pendulum(x)
    if "cartpole" in env_name and "Flying" not in env_name:
        return utils.unnormalize_states_cartpole_nlink(x)
    if "FlyingCartpole" in env_name:
        return utils.unnormalize_states_flyingcartpole(x)
    return x


def preprocess_batch(env_name, nx, batch):
    """Host-side batch preprocessing: angle convention shift + window
    unwrap (continuous supervision targets across the 0/2pi wrap)."""
    batch["state"] = np.asarray(unnormalize_for_env(env_name, batch["state"]))
    batch["obs"] = np.asarray(unnormalize_for_env(env_name, batch["obs"]))
    idxs = utils.angle_idxs_for_env(env_name, nx)
    batch["state"] = utils.unwrap_angle_windows(batch["state"], idxs)
    return batch


def make_train_step(policy, optimizer, args, pretrain: bool = False):
    """One jitted training step (`global_fwd` + backward + Adam).

    pretrain=True builds the network-only phase step: the forward skips
    every AL solve (the reference's `pretrain_done=False` runs the
    policy in 'deq' mode for the first 5000 steps, `train.py:310-312`),
    so supervision lands on the raw network trajectories."""

    if pretrain:
        qp_solve, lastqp_solve = False, False
    else:
        qp_solve, lastqp_solve = args.qp_solve, args.lastqp_solve

    def loss_fn(params, batch, coeffs):
        if getattr(policy, "takes_history", False):
            obs = batch["obs"]
        else:
            obs = batch["obs"][:, -1] if batch["obs"].ndim == 3 else batch["obs"]
        if getattr(policy, "takes_action_history", False):
            # EstPred: the estimator consumes the history-window actions
            # (`u_gt_est`, reference `policies.py:329,373`)
            policy_out, carry = policy.forward(
                params, obs, batch["obs_action"], qp_solve=qp_solve,
                lastqp_solve=lastqp_solve,
            )
            d = compute_loss_deqmpc_hist(
                policy, batch["state"], batch["action"], batch["obs"],
                batch["mask"], policy_out, coeffs=coeffs,
                x_init=policy_out["init_states"],
            )
        else:
            policy_out, carry = policy.forward(
                params, obs, qp_solve=qp_solve, lastqp_solve=lastqp_solve
            )
            d = compute_loss_deqmpc(
                policy, batch["state"], batch["action"], batch["mask"],
                policy_out, coeffs=coeffs, x_init=policy_out["init_states"],
            )
        aux = {k: d[k] for k in
               ("loss_end", "losses_iter", "losses_iter_opt", "losses_iter_nn")}
        if "losses_x_ests" in d:
            aux["losses_x_ests"] = d["losses_x_ests"]
        if getattr(policy, "is_delta", False):
            # Delta variant: the trainer EMA-updates the output scales
            # from the per-iteration optimizer trajectories
            # (`update_scales` consumes `trajs[i][1]`,
            # `deq_layer_utils.py:55-63`)
            aux["opt_states"] = jnp.stack(
                [t[1] for t in policy_out["trajs"]])
            aux["init_states"] = policy_out["init_states"]
        if "deq_stats" in policy_out:
            aux["deq_fwd_err"] = policy_out["deq_stats"]["fwd_err"]
            aux["deq_fwd_steps"] = policy_out["deq_stats"]["fwd_steps"]
        return d["loss"], aux

    @jax.jit
    def train_step(params, opt_state, batch, coeffs):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, coeffs
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, loss, aux, gnorm

    return train_step, loss_fn


def make_streaming_train_step(policy, optimizer, args):
    """Streaming mode (`streaming_fwd`, `train.py:323-325`): one
    cold-start forward + L warm-started receding-horizon forwards on
    successive windows; losses summed."""
    L = args.streaming_steps
    T = args.T
    qp_solve = args.qp_solve

    def loss_fn(params, batch, coeffs):
        total = 0.0
        aux = {}
        obs = batch["obs"][:, -1] if batch["obs"].ndim == 3 else batch["obs"]
        policy_out, carry = policy.forward(params, obs, qp_solve=qp_solve)
        d = compute_loss_deqmpc(
            policy, batch["state"][:, :T], batch["action"][:, :T],
            batch["mask"][:, :T], policy_out, coeffs=coeffs,
            x_init=policy_out["init_states"],
        )
        total = d["loss"]
        loss_ends = [d["loss_end"]]
        for l in range(1, L + 1):
            obs_l = batch["state"][:, l]
            policy_out, carry = policy.forward_warm_start(
                params, obs_l, carry, qp_solve=qp_solve
            )
            d = compute_loss_deqmpc(
                policy, batch["state"][:, l : l + T], batch["action"][:, l : l + T],
                batch["mask"][:, l : l + T], policy_out, coeffs=None,
            )
            total = total + d["loss"]
            loss_ends.append(d["loss_end"])
        aux["loss_end"] = jnp.stack(loss_ends).mean()
        aux["losses_iter"] = d["losses_iter"]
        aux["losses_iter_opt"] = d["losses_iter_opt"]
        aux["losses_iter_nn"] = d["losses_iter_nn"]
        return total, aux

    @jax.jit
    def train_step(params, opt_state, batch, coeffs):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, coeffs
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, loss, aux, gnorm

    return train_step, loss_fn


_VAL_CACHE = {}


def validate_policy(policy, loss_fn, params, val_samples, coeffs):
    """(`validate_policy` interface, `train.py:358`)."""
    jitted = _VAL_CACHE.get(id(loss_fn))
    if jitted is None:
        jitted = jax.jit(loss_fn)
        _VAL_CACHE[id(loss_fn)] = jitted
    losses = []
    for batch in val_samples:
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, aux = jitted(params, b, coeffs)
        losses.append(float(aux["loss_end"]))
    return float(np.mean(losses))


class MetricsWriter:
    """JSONL metrics sink + optional TensorBoard (torch-cpu is baked in)."""

    def __init__(self, logdir, name):
        self.dir = os.path.join(logdir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(self.dir)
        except Exception:
            pass

    def write(self, step: int, scalars: Dict[str, float]):
        self.f.write(json.dumps({"step": step, **scalars}) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)


def save_checkpoint(path, params, opt_state=None, step=0, args=None):
    """Checkpoint via flax serialization + pickled aux
    (reference saves state_dict + args, `train.py:235,377-381`;
    unlike the reference we also save optimizer state and step)."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {
        "params": serialization.to_bytes(params),
        "opt_state": serialization.to_bytes(opt_state) if opt_state is not None else None,
        "step": step,
        "args": vars(args) if args is not None else None,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def _from_bytes_lenient(template, data):
    """Deserialize with structure tolerance: leaves present in both the
    saved blob and the template are restored; template-only leaves
    (e.g. params added after the checkpoint was written, like the
    base-layer `iter_emb`) keep their init values."""
    from flax import serialization

    try:
        return serialization.from_bytes(template, data)
    except ValueError:
        saved = serialization.msgpack_restore(data)
        tmpl_sd = serialization.to_state_dict(template)

        def merge(t, s):
            if isinstance(t, dict):
                return {k: (merge(v, s[k]) if isinstance(s, dict) and k in s
                            else v) for k, v in t.items()}
            return s if s is not None else t

        return serialization.from_state_dict(template, merge(tmpl_sd, saved))


def load_checkpoint(path, params_template, opt_state_template=None):
    from flax import serialization

    with open(path, "rb") as f:
        blob = pickle.load(f)
    params = _from_bytes_lenient(params_template, blob["params"])
    opt_state = None
    if blob.get("opt_state") is not None and opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template, blob["opt_state"])
    return params, opt_state, blob.get("step", 0), blob.get("args")


def main(argv=None):
    args = build_argparser().parse_args(argv)
    args = apply_model_type_presets(args)
    np.random.seed(args.seed)

    if args.dtype == "double":
        # the reference solves in f64 (`AL_mpc.py:261-263`); without
        # x64 enabled jnp.float64 silently downcasts to f32
        jax.config.update("jax_enable_x64", True)
        if jnp.zeros((), jnp.float64).dtype != jnp.dtype("float64"):
            raise RuntimeError(
                "--dtype double requires x64 support; the active backend "
                "refused jax_enable_x64 (use the CPU backend for f64 runs)"
            )

    # streaming schedule (`train.py:142-148`). The reference computes
    # min(log10(1e10/rho_init_max)/2, deq_iter) with rho_max=1e8; use
    # the effective warm-restart penalty (scaled to rho_max, see
    # DEQMPCPolicy.rho_warm_max) so the budget is the same number of
    # AL decades on any dtype: 3 for both (1e4..1e10 | 10..1e7).
    _rho_max = args.rho_max or (1e8 if args.dtype == "double" else 1e5)
    _rho_warm = min(args.rho_init_max, _rho_max * 1e-4)
    args.str_al_iter = min(int(np.log10(_rho_max * 100 / _rho_warm) / 2),
                           args.deq_iter)
    total_deq_iter = args.deq_iter
    if args.streaming and args.streaming_start_iter == 0:
        total_deq_iter = args.deq_iter + args.str_al_iter * args.streaming_steps

    env = make_env(args.env, **({"Qscale": args.Qscale} if "FlyingCartpole" in args.env else {}))
    if args.nq <= 0:
        args.nq = env.nq if env.nq <= env.nx // 2 else env.nx // 2

    if args.eval_x_window is not None:
        import inspect

        if "x_window" not in inspect.signature(env.reset).parameters:
            raise SystemExit(
                f"--eval_x_window: {type(env).__name__}.reset takes no "
                "x_window override (only FlyingCartpole/RexQuadrotor do)")

    obstacles = build_obstacles(env)

    gt_trajs = get_gt_data(args, env, args.teacher)
    n_train = round(len(gt_trajs) * 0.9 * args.num_trajs_frac)
    val_trajs = gt_trajs[round(-len(gt_trajs) * 0.1):]
    gt = merge_gt_data(gt_trajs, num_trajs=n_train)
    val_gt = merge_gt_data(val_trajs)
    rng_np = np.random.default_rng(args.seed)
    horizon_T = args.T + args.streaming_steps * int(args.streaming)
    val_samples = [
        preprocess_batch(args.env, env.nx,
                         sample_trajectory(val_gt, args.bsz, args.H,
                                           horizon_T, rng_np))
        for _ in range(10)
    ]

    policy = build_policy(args, env, obstacles=obstacles)
    rng = jax.random.PRNGKey(args.seed)
    params = policy.init(rng)

    if getattr(args, "lr_schedule", "constant") == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=args.lr * 0.1, peak_value=args.lr,
            warmup_steps=200, decay_steps=args.max_train_steps,
            end_value=args.lr * 0.02,
        )
    else:
        sched = args.lr
    optimizer = optax.chain(
        optax.clip_by_global_norm(2.0),  # `train.py:335`
        optax.adam(sched),
    )
    opt_state = optimizer.init(params)

    name = args.name or (
        f"{args.model_type}_{args.env}_T{args.T}_bsz{args.bsz}"
        f"_deq_iter{total_deq_iter}_hdim{args.hdim}"
    )
    writer = MetricsWriter(args.logdir, name) if args.save else None
    ckpt_path = os.path.join(args.models_dir, name)
    if args.save:
        # snapshot the code into the log dir for reproducibility
        # (`train.py:236-241`)
        import shutil

        src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(args.logdir, name, "code", "deqmpc_tpu")
        if not os.path.exists(dst):
            shutil.copytree(
                src, dst, ignore=shutil.ignore_patterns("__pycache__")
            )

    if args.load and args.ckpt:
        # eval never needs optimizer state; for resume, only restore it
        # when the saved structure matches the current optimizer (e.g.
        # the same --lr_schedule), else start the optimizer fresh
        try:
            params, opt_state_l, start_step, _ = load_checkpoint(
                os.path.join(args.models_dir, args.ckpt), params,
                None if args.eval else opt_state,
            )
        except ValueError:
            params, opt_state_l, start_step, _ = load_checkpoint(
                os.path.join(args.models_dir, args.ckpt), params, None
            )
            print("checkpoint optimizer state incompatible; reinitialized")
        if opt_state_l is not None:
            opt_state = opt_state_l

    if args.eval:
        from .eval import eval_policy

        ws = {"auto": None, "on": True, "off": False}[args.eval_warm_start]
        stats = eval_policy(args, env, policy, params, gt,
                            n_episodes=args.eval_episodes,
                            ep_len=args.eval_ep_len, warm_start=ws)
        print(json.dumps(stats, indent=2))
        return stats

    streaming_active = bool(args.streaming and args.streaming_start_iter == 0)
    # pretrain gating (`train.py:310-312`): network-only supervision
    # until step 5000, then swap in the full deq-mpc step (a second
    # jitted program, same pattern as the streaming switch below)
    PRETRAIN_STEPS = 5000
    pretrain_active = bool(args.pretrain and not streaming_active
                           and args.start_iter + 1 < PRETRAIN_STEPS)
    if streaming_active:
        train_step, loss_fn = make_streaming_train_step(policy, optimizer, args)
    else:
        train_step, loss_fn = make_train_step(policy, optimizer, args,
                                              pretrain=pretrain_active)

    coeffs = jnp.ones((args.deq_iter, 3))
    _scales_update = None  # lazily jitted Delta-variant EMA
    best_val = np.inf
    losses, losses_end = [], []
    t_window = time.time()
    for i in range(args.start_iter + 1, args.max_train_steps):
        if (args.streaming and not streaming_active
                and i > args.streaming_start_iter):
            streaming_active = True
            pretrain_active = False
            train_step, loss_fn = make_streaming_train_step(policy, optimizer, args)
        elif pretrain_active and i >= PRETRAIN_STEPS:
            pretrain_active = False
            train_step, loss_fn = make_train_step(policy, optimizer, args)
            # the two phases' val losses aren't comparable — restart the
            # best-checkpoint tracking for the deq-mpc phase
            best_val = np.inf
            print(f"[{i}] pretrain done: switching deq -> deqmpc")
        batch = sample_trajectory(gt, args.bsz, args.H, horizon_T, rng_np)
        batch = preprocess_batch(args.env, env.nx, batch)
        if args.data_noise_type:
            from ..data.noise_utils import add_data_noise

            batch = add_data_noise(batch, args.data_noise_type,
                                   args.data_noise_std,
                                   args.data_noise_mean, rng_np)
            batch.pop("state_noisy", None)  # targets stay clean
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, loss, aux, gnorm = train_step(
            params, opt_state, batch, coeffs
        )
        if getattr(policy, "is_delta", False) and "opt_states" in aux:
            if _scales_update is None:
                from ..models.grad_layers import update_scales

                _scales_update = jax.jit(
                    lambda s, tr, gt, init: update_scales(
                        s, list(tr), gt, init))
            params["scales"] = _scales_update(
                params["scales"], aux["opt_states"], batch["state"],
                aux["init_states"])
        # keep loss/aux as device arrays between validations: a float()
        # here forces a per-step device sync (~2 RPCs/step through the
        # TPU tunnel); the NaN check only needs to run at val cadence
        losses.append(loss)
        losses_end.append(aux["loss_end"])
        if i % args.val_every == 0 and not np.isfinite(float(loss)):
            print(f"[{i}] non-finite loss, stopping")
            break
        if args.grad_coeff and i % args.val_every == 0 and not streaming_active:
            from .grad_coeffs import (compute_grad_ratio_coeffs,
                                      update_coeffs_ema)

            try:
                ratios, _, _ = compute_grad_ratio_coeffs(
                    policy, params, batch, qp_solve=args.qp_solve
                )
                coeffs = update_coeffs_ema(coeffs, ratios)
            except KeyError as e:
                print(f"[{i}] --grad_coeff disabled: no output head found "
                      f"in the params tree ({e})")
                args.grad_coeff = False
        if i % args.val_every == 0:
            val_loss = validate_policy(policy, loss_fn, params, val_samples, coeffs)
            scalars = {
                # one device fetch for the whole window, not one per step
                "losses/loss_avg": float(jnp.mean(jnp.stack(losses))) / total_deq_iter,
                "losses/loss_end": float(jnp.mean(jnp.stack(losses_end))),
                "val_losses/loss_end": val_loss,
                "grad_norm": float(gnorm),
                "time/per_step": (time.time() - t_window) / max(len(losses), 1),
            }
            for k in range(args.deq_iter):
                scalars[f"losses/loss{k}"] = float(aux["losses_iter"][k])
                scalars[f"losses_opt/loss_opt{k}"] = float(aux["losses_iter_opt"][k])
                scalars[f"losses_nn/loss_nn{k}"] = float(aux["losses_iter_nn"][k])
            if "losses_x_ests" in aux:
                for k in range(args.deq_iter):
                    scalars[f"losses_x_ests/loss_x_est{k}"] = float(
                        aux["losses_x_ests"][k])
            if "deq_fwd_err" in aux:
                for k in range(args.deq_iter):
                    scalars[f"deq_stats/fwd_err{k}"] = float(aux["deq_fwd_err"][k])
                    scalars[f"deq_stats/fwd_steps{k}"] = float(aux["deq_fwd_steps"][k])
            print(f"[{i}] loss {scalars['losses/loss_avg']:.4f} "
                  f"end {scalars['losses/loss_end']:.4f} val {val_loss:.4f} "
                  f"({scalars['time/per_step']*1e3:.0f} ms/step)")
            if writer:
                writer.write(i, scalars)
            if args.save and val_loss < best_val:
                best_val = val_loss
                save_checkpoint(ckpt_path, params, opt_state, i, args)
            losses, losses_end = [], []
            t_window = time.time()
    return params


if __name__ == "__main__":
    main()
