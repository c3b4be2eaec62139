"""Closed-loop obstacle comparison (BASELINE #3b / VERDICT r2 #4).

Rolls a policy on FlyingCartpole_obstacles and reports the collision
rate (fraction of episodes whose path enters any obstacle sphere) plus
the usual success stats — for (a) the obstacle-constrained policy and
(b) an unconstrained policy on the same episodes. The reference's
counterpart capability is `Obstacle_MPC` through `Tracking_MPC`
(`qpth/AL_mpc_custom.py:100-135`, `deqmpc/policies.py:1200-1216`).

Usage:
  python scripts/eval_obstacles.py --ckpt_obs model/flying_obstacles \
      --ckpt_plain model/flying_deqmpc_nn --episodes 64 --ep_len 360
"""
import argparse
import json
import os
import sys

# runnable as `python scripts/eval_obstacles.py` from the repo root
# (PYTHONPATH must stay unset — it breaks axon TPU registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.envs import make_env
from deqmpc_tpu.solvers import ObstacleSet
from deqmpc_tpu.training.train import (apply_model_type_presets,
                                       build_argparser, build_policy,
                                       load_checkpoint)


def rollout_stats(env, policy, params, n, ep_len, seed=0):
    rng = jax.random.PRNGKey(seed)
    x = env.reset(rng, n)

    @jax.jit
    def first_step(params, x):
        po, carry = policy.forward(params, x.astype(jnp.float32),
                                   qp_solve=True, lastqp_solve=False)
        return po["trajs"][-1][2][:, 0], carry

    env_step = jax.jit(env.step)
    check = jax.jit(env.check_collisions)
    collided = np.zeros(n, bool)
    xs = []
    for t in range(ep_len):
        u0, _ = first_step(params, x)
        x, r = env_step(x, u0)
        collided |= np.asarray(check(x))
        xs.append(np.asarray(x))
    xf = xs[-1]
    th = np.mod(xf[:, 6], 2 * np.pi)
    ang = np.abs(np.mod(th - np.pi + np.pi, 2 * np.pi) - np.pi)
    pos = np.linalg.norm(xf[:, :3], axis=-1)
    ok = np.isfinite(xf).all(-1)
    succ = (np.sqrt(ang**2 + pos**2) < 0.25) & ok & ~collided
    return {
        "collision_rate": float(collided.mean()),
        "collision_ci95": wilson_ci(int(collided.sum()), n),
        "success_rate": float(succ.mean()),
        "success_ci95": wilson_ci(int(succ.sum()), n),
        "final_dist_mean": float(np.nanmean(np.sqrt(ang**2 + pos**2))),
        "n_episodes": n,
        "n_nan": int((~ok).sum()),
    }


def rollout_safety_filter(env, policy, params, n, ep_len, T_f=15,
                          al_iters=4, seed=0):
    """Blind policy + long-horizon obstacle-constrained tracking filter.

    The round-4 dense-field experiment showed constraint rows on the
    policy's own T=5 tracker cannot avoid (0.25 s lookahead, and the
    obstacle-blind network re-points through the sphere every tick);
    round-5's aware-input attempt showed a blind-teacher dataset
    carries no avoidance signal either. This arm is the other fix the
    round-4 analysis named: keep the strong blind flier, and pass its
    plan through a SEPARATE T_f-step obstacle-constrained TrackingMPC
    (0.75 s lookahead at T_f=15) that deforms the plan around spheres —
    the reference's Obstacle_MPC role (`qpth/AL_mpc_custom.py:100-135`)
    at a horizon where it has avoidance authority. No retraining."""
    from deqmpc_tpu.policies.tracking_mpc import TrackingMPC

    obstacles = ObstacleSet(centers=jnp.asarray(env.obstacle_positions),
                            radius=float(env.obstacle_radius))
    filt = TrackingMPC(env, T_f, al_iter=2, dtype=jnp.float32,
                       rho_max=1e5, obstacles=obstacles)
    pad = T_f - policy.cfg.T

    @jax.jit
    def tick(params, x):
        po, _ = policy.forward(params, x.astype(jnp.float32),
                               qp_solve=True, lastqp_solve=False)
        _, ns, na = po["trajs"][-1]
        x_ref = jnp.concatenate(
            [ns, jnp.repeat(ns[:, -1:], pad, axis=1)], axis=1)
        u_ref = jnp.concatenate(
            [na, jnp.repeat(na[:, -1:], pad, axis=1)], axis=1)
        st = filt.init_state(x.shape[0])
        xs, us, status, _ = filt(x.astype(jnp.float32), x_ref, u_ref, st,
                                 al_iters=al_iters)
        # fall back to the raw policy action if the filter failed
        ok = jnp.all(jnp.isfinite(us[:, 0]), axis=-1, keepdims=True)
        return jnp.where(ok, us[:, 0], na[:, 0])

    env_step = jax.jit(env.step)
    check = jax.jit(env.check_collisions)
    # chunked: the T_f=15 (n=18)-block Pallas tridiag tile exceeds the
    # 16M scoped-vmem limit at 512 lanes; 256-lane chunks fit
    chunk = 256
    coll_parts, xf_parts = [], []
    for lo in range(0, n, chunk):
        nb = min(chunk, n - lo)
        x = env.reset(jax.random.PRNGKey(seed + lo), nb)
        collided = np.zeros(nb, bool)
        for t in range(ep_len):
            u0 = tick(params, x)
            x, r = env_step(x, u0)
            collided |= np.asarray(check(x))
        coll_parts.append(collided)
        xf_parts.append(np.asarray(x))
    collided = np.concatenate(coll_parts)
    xf = np.concatenate(xf_parts)
    th = np.mod(xf[:, 6], 2 * np.pi)
    ang = np.abs(np.mod(th - np.pi + np.pi, 2 * np.pi) - np.pi)
    pos = np.linalg.norm(xf[:, :3], axis=-1)
    ok = np.isfinite(xf).all(-1)
    succ = (np.sqrt(ang**2 + pos**2) < 0.25) & ok & ~collided
    return {
        "collision_rate": float(collided.mean()),
        "collision_ci95": wilson_ci(int(collided.sum()), n),
        "success_rate": float(succ.mean()),
        "success_ci95": wilson_ci(int(succ.sum()), n),
        "final_dist_mean": float(np.nanmean(np.sqrt(ang**2 + pos**2))),
        "n_episodes": n,
        "n_nan": int((~ok).sum()),
        "filter_T": T_f,
    }


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial rate."""
    if n == 0:
        return [0.0, 1.0]
    p = k / n
    den = 1 + z * z / n
    center = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return [round(float(center - half), 4), round(float(center + half), 4)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_obs", type=str, required=True)
    p.add_argument("--ckpt_plain", type=str, default=None)
    p.add_argument("--episodes", type=int, default=512)
    p.add_argument("--ep_len", type=int, default=360)
    p.add_argument("--model_type", type=str, default="deq-mpc-nn")
    p.add_argument("--env", type=str, default="FlyingCartpole_obstacles",
                   help="obstacle env spec; FlyingCartpole_obstacles_dense "
                        "is the discriminating field (160 spheres r=0.4)")
    p.add_argument("--obstacle_net_input", action="store_true",
                   help="the --ckpt_obs policy was trained with per-knot "
                        "obstacle features in the network input")
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--safety_filter_T", type=int, default=0,
                   help="when >0, add a 'safety_filter' arm: the "
                        "--ckpt_plain blind policy passed through a "
                        "T_f-step obstacle-constrained TrackingMPC")
    p.add_argument("--arms", type=str,
                   default="constrained,unconstrained,plain",
                   help="comma list of arms to run (any of "
                        "constrained,unconstrained,plain,filter)")
    args = p.parse_args()
    arms = set(args.arms.split(","))

    env = make_env(args.env)
    obstacles = ObstacleSet(centers=jnp.asarray(env.obstacle_positions),
                            radius=float(env.obstacle_radius))
    targs = build_argparser().parse_args(
        f"--env {args.env} --model_type {args.model_type} "
        f"--T {args.T} --deq_iter 6 --hdim 256 --bsz 128 --nq 7".split())
    targs = apply_model_type_presets(targs)
    targs.obstacle_net_input = args.obstacle_net_input

    out = {}
    if {"constrained", "unconstrained"} & arms:
        # (a) obstacle-constrained policy (optionally net-aware)
        pol = build_policy(targs, env, obstacles=obstacles)
        params = pol.init(jax.random.PRNGKey(0))
        params, _, step, _ = load_checkpoint(args.ckpt_obs, params, None)
        if "constrained" in arms:
            out["constrained"] = rollout_stats(env, pol, params,
                                               args.episodes, args.ep_len)
            out["constrained"]["ckpt_step"] = step
        # (b) the same weights deployed WITHOUT the solver's obstacle
        # constraint rows — the ablation isolating what the constraints
        # buy at deployment. The network keeps its (possibly
        # obstacle-aware) input so the parameter tree is identical.
        if "unconstrained" in arms:
            targs_unc = argparse.Namespace(**vars(targs))
            targs_unc.obstacle_constraints = False
            pol_unc = build_policy(targs_unc, env, obstacles=obstacles)
            out["unconstrained_same_weights"] = rollout_stats(
                env, pol_unc, params, args.episodes, args.ep_len)
    if args.ckpt_plain and {"plain", "filter"} & arms:
        # (c) an obstacle-blind policy trained on plain flying
        targs_blind = argparse.Namespace(**vars(targs))
        targs_blind.obstacle_net_input = False
        pol_blind = build_policy(targs_blind, env, obstacles=None)
        params_p = pol_blind.init(jax.random.PRNGKey(0))
        params_p, _, step_p, _ = load_checkpoint(args.ckpt_plain, params_p,
                                                 None)
        if "plain" in arms:
            out["plain_policy"] = rollout_stats(env, pol_blind, params_p,
                                                args.episodes, args.ep_len)
            out["plain_policy"]["ckpt_step"] = step_p
        # (d) the same blind policy behind a long-horizon
        # obstacle-constrained tracking filter
        if "filter" in arms and args.safety_filter_T > 0:
            out["safety_filter"] = rollout_safety_filter(
                env, pol_blind, params_p, args.episodes, args.ep_len,
                T_f=args.safety_filter_T)
            out["safety_filter"]["ckpt_step"] = step_p
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
