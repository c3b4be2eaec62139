"""Evaluation: closed-loop rollout of a trained policy + parameter
sensitivity.

Reconstructs the reference's missing `deqmpc/eval.py`
(`eval_policy`, `check_param_sensitivity` — interfaces fixed at
`train.py:258-263`): roll the policy in the environment with
receding-horizon warm starts, report tracking error / reward /
success statistics.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..policies import compute_loss_deqmpc


def final_state_errors(x_final: np.ndarray, targ: np.ndarray,
                       env_name: str, nx: int) -> np.ndarray:
    """Per-dim final-state error with angle dims wrapped to [-pi, pi],
    so a swing-up finishing at 2pi-eps with target 0 counts as success
    (states are wrapped into [0, 2pi), `my_envs/cartpole.py:90-92`)."""
    from ..utils import angle_idxs_for_env

    err = np.asarray(x_final) - np.asarray(targ)
    idxs = angle_idxs_for_env(env_name, nx)
    for i in (idxs if idxs is not None else ()):
        err[:, i] = np.mod(err[:, i] + np.pi, 2 * np.pi) - np.pi
    return err


def success_dims_for_env(env_name: str, nx: int, nq: int):
    """State dims entering the success norm, per env. Position-like
    quantities only: mixing velocities (or MRP attitude, for the
    quadrotors) into one norm made the 0.25 threshold mean different
    things per env."""
    if env_name.startswith("pendulum"):
        return [0]                      # pole angle
    if "cartpole" in env_name and "Flying" not in env_name:
        return list(range(nq))          # cart position + joint angles
    if env_name == "rexquadrotor":
        return [0, 1, 2]                # world position
    if "FlyingCartpole" in env_name:
        return [0, 1, 2, 6]             # quad position + pole angle
    return list(range(min(nq, nx)))


def eval_policy(args, env, policy, params, gt=None, n_episodes: int = 32,
                ep_len: int = None, seed: int = 0,
                warm_start: bool = None) -> Dict[str, float]:
    """Closed-loop evaluation: at each env step run the policy forward
    (cold start on step 0, warm-started after), apply the first
    nominal action."""
    if ep_len is None:
        ep_len = getattr(env, "_max_episode_steps", 200)
    if warm_start is None:
        # match the training protocol: the warm-started receding-horizon
        # forward is the deployment mode of *streaming-trained* policies
        # (`deqmpc_iter_warm_start`); cold-start-per-step matches the
        # cold-start training distribution otherwise
        warm_start = bool(getattr(args, "streaming", False))
    rng = jax.random.PRNGKey(seed)
    # optional start-window override (reference parity: env.reset takes
    # an x_window override, `rex_quadrotor.py:260-270`): evaluate a
    # narrower regime, e.g. capture/stabilize for the flying cartpole
    x_window = getattr(args, "eval_x_window", None)
    if x_window is not None:
        import inspect

        if "x_window" not in inspect.signature(env.reset).parameters:
            raise ValueError(
                f"--eval_x_window is not supported by {type(env).__name__}."
                "reset (only FlyingCartpole/RexQuadrotor take a start-window"
                " override)")
        x_window = np.asarray([float(v) for v in x_window.split(",")]) \
            if isinstance(x_window, str) else np.asarray(x_window)
        x = env.reset(rng, n_episodes, x_window=x_window)
    else:
        x = env.reset(rng, n_episodes)

    @jax.jit
    def first_step(params, x):
        policy_out, carry = policy.forward(
            params, x.astype(jnp.float32), qp_solve=args.qp_solve,
            lastqp_solve=args.lastqp_solve,
        )
        _, opt_states, actions = policy_out["trajs"][-1]
        return actions[:, 0], carry

    @jax.jit
    def warm_step(params, x, carry):
        policy_out, carry = policy.forward_warm_start(
            params, x.astype(jnp.float32), carry, qp_solve=args.qp_solve,
            lastqp_solve=args.lastqp_solve,
        )
        _, opt_states, actions = policy_out["trajs"][-1]
        return actions[:, 0], carry

    # jit the env transition: dispatched eagerly, the quadrotor RK4 is
    # hundreds of sub-ms ops that each pay the device-tunnel RPC
    # (~0.6 ms) — 30x slower eval, measured
    env_step = jax.jit(env.step)

    rewards = []
    xs = []
    carry = None
    for t in range(ep_len):
        if t == 0 or not warm_start:
            u0, carry = first_step(params, x)
        else:
            u0, carry = warm_step(params, x, carry)
        x, r = env_step(x, u0)
        rewards.append(np.asarray(r))
        xs.append(np.asarray(x))
    xs = np.stack(xs, axis=1)          # (bsz, ep_len, nx)
    rewards = np.stack(rewards, axis=1)
    err = final_state_errors(xs[:, -1], np.asarray(env.targ_pos),
                             getattr(args, "env", ""), env.nx)
    final_dist = np.linalg.norm(err, axis=-1)
    # success: final state within 0.25 of the target over the env's
    # position-like dims (angle dims already wrapped above)
    nq = min(getattr(env, "nq", env.nx // 2), env.nx)
    dims = success_dims_for_env(getattr(args, "env", ""), env.nx, nq)
    success = np.linalg.norm(err[:, dims], axis=-1) < 0.25
    return {
        "mean_reward": float(np.nanmean(rewards)),
        "final_dist_mean": float(np.nanmean(final_dist)),
        "final_dist_median": float(np.nanmedian(final_dist)),
        "success_rate": float(np.mean(success)),
        "n_nan_episodes": int(np.sum(~np.isfinite(xs[:, -1]).all(axis=-1))),
    }


def check_param_sensitivity(args, env, policy, params, gt_batch,
                            scales=(0.01, 0.03, 0.1), seed: int = 0
                            ) -> Dict[str, float]:
    """Perturb parameters with Gaussian noise at several relative
    scales and measure the imitation-loss degradation (reference
    `check_param_sensitivity`, interface at `train.py:261-263`)."""
    rng = jax.random.PRNGKey(seed)
    obs = gt_batch["obs"][:, -1] if gt_batch["obs"].ndim == 3 else gt_batch["obs"]

    def loss_of(p):
        policy_out, _ = policy.forward(
            p, jnp.asarray(obs), qp_solve=args.qp_solve,
            lastqp_solve=args.lastqp_solve,
        )
        d = compute_loss_deqmpc(
            policy, jnp.asarray(gt_batch["state"]), jnp.asarray(gt_batch["action"]),
            jnp.asarray(gt_batch["mask"]), policy_out,
        )
        return float(d["loss"])

    base = loss_of(params)
    out = {"base_loss": base}
    leaves, treedef = jax.tree_util.tree_flatten(params)
    for s in scales:
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, len(leaves))
        noisy = [
            l + s * jnp.std(l) * jax.random.normal(k, l.shape)
            if jnp.issubdtype(l.dtype, jnp.floating) else l
            for l, k in zip(leaves, keys)
        ]
        out[f"loss_at_{s}"] = loss_of(jax.tree_util.tree_unflatten(treedef, noisy))
    return out
