"""Corrective expert data from policy-visited states (DAgger-style).

The reference trains from stochastic RL teachers (SAC/CGAC,
`datagen.py:15-29`) whose data covers a wide tube around the task
manifold; our analytic/MPC teachers are nearly deterministic, so pure
behavior cloning sees too little of the closed-loop state
distribution. This module closes the loop: roll the CURRENT policy,
collect the states it actually visits (including its mistakes), and
generate expert demonstrations restarting from those states. Appending
these to the dataset and retraining is one DAgger round.

Supports every env with a teacher in `expert_gen`: the energy-shaping
pendulum law, the FlyingCartpole cascade, and the AL-MPC teacher for
cartpole / quadrotor (all accept explicit start states).

Usage:
    python -m deqmpc_tpu.data.dagger --env pendulum --ckpt pendulum_r5 \
        --episodes 256 --policy_out_type 1
"""
from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import make_env
from .datagen import expert_data_path
from .expert_gen import (generate_flying_cartpole_expert,
                         generate_mpc_expert,
                         generate_pendulum_energy_expert)


def collect_policy_states(args, env, policy, params, n_episodes: int = 64,
                          ep_len: int = 200, seed: int = 0,
                          subsample: int = 4) -> np.ndarray:
    """Closed-loop policy rollout; returns visited states subsampled
    along time, shape (n_states, nx)."""

    @jax.jit
    def cold(params, x):
        po, _ = policy.forward(params, x.astype(jnp.float32),
                               qp_solve=args.qp_solve,
                               lastqp_solve=args.lastqp_solve)
        return po["trajs"][-1][2][:, 0]

    env_step = jax.jit(env.step)  # see eval.py: eager dispatch is ~30x slower
    x = env.reset(jax.random.PRNGKey(seed), n_episodes)
    visited = []
    for t in range(ep_len):
        u0 = cold(params, x)
        x, _ = env_step(x, u0)
        if t % subsample == 0:
            visited.append(np.asarray(x))
    out = np.concatenate(visited, axis=0)
    out = out[np.isfinite(out).all(axis=-1)]
    # drop states that have already escaped any recoverable envelope —
    # the teacher can't fix those, they poison the dataset, and solver
    # blowups from absurd states (cart at +-60 m, qdot +-140) have
    # crashed the TPU worker mid-shard. Envelope = the expert dataset's
    # own per-dim range with 1.5x margin (the teacher's demonstrated
    # competence region); fallback: distance ball from env.x_window.
    try:
        with open(expert_data_path(env.spec_id, args.teacher), "rb") as f:
            eps = pickle.load(f)
        ds = np.stack([s for ep in eps[:200] for s, _ in ep[::8]])
        # 2nd..98th percentile, not min/max: teacher datasets carry a
        # wild transient tail (cartpole cart at -79 m) that would blow
        # the envelope open and readmit exactly the unrecoverable
        # states this filter exists to drop
        lo, hi = np.percentile(ds, 2, axis=0), np.percentile(ds, 98, axis=0)
        c, h = (lo + hi) / 2, np.maximum((hi - lo) / 2, 1e-3)
        keep = np.all(np.abs(out - c) <= 1.5 * h, axis=-1)
        return out[keep]
    except FileNotFoundError:
        d = np.linalg.norm(out - np.asarray(env.targ_pos), axis=-1)
        return out[d < 4.0 * float(np.linalg.norm(env.x_window))] \
            if hasattr(env, "x_window") else out


def corrective_episodes(args, env, starts: np.ndarray, ep_len: int,
                        noise_std: float, seed: int = 0):
    """Expert demonstrations restarting from the given states, using
    the same teacher family `expert_gen` uses for the env."""
    if args.env.startswith("pendulum") and not args.env.endswith("stabilize"):
        return generate_pendulum_energy_expert(
            env, n_episodes=len(starts), ep_len=ep_len, seed=seed,
            noise_std=noise_std, x0=starts)
    if "FlyingCartpole" in args.env:
        return generate_flying_cartpole_expert(
            env, n_episodes=len(starts), ep_len=ep_len, seed=seed,
            x0=starts)
    return generate_mpc_expert(
        env, n_episodes=len(starts), ep_len=ep_len, seed=seed,
        horizon=args.dagger_horizon, al_iters=args.al_iters,
        noise_std=noise_std, env_name=args.env, x0=starts)


def main(argv=None):
    import argparse
    import os

    from ..training.train import (apply_model_type_presets, build_argparser,
                                  build_policy, load_checkpoint)

    p = build_argparser()
    p.add_argument("--dagger_episodes", type=int, default=256,
                   help="number of corrective expert rollouts")
    p.add_argument("--dagger_ep_len", type=int, default=100,
                   help="length of each corrective expert rollout")
    p.add_argument("--dagger_horizon", type=int, default=30,
                   help="MPC-teacher horizon (cartpole/quadrotor)")
    p.add_argument("--al_iters", type=int, default=8)
    p.add_argument("--dagger_noise_std", type=float, default=0.1)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env var is too late — "
                        "the harness pre-imports jax; see expert_gen)")
    p.add_argument("--phase", choices=["all", "collect", "shards"],
                   default="all",
                   help="'all' orchestrates collect + teacher shards as "
                        "SUBPROCESSES (the single tunneled TPU chip "
                        "tolerates one process at a time, and a giant "
                        "in-process teacher program crashes the worker); "
                        "'collect'/'shards' are the worker phases")
    p.add_argument("--starts_npz", type=str, default="/tmp/dagger_starts.npz")
    args = p.parse_args(argv)
    if args.cpu and args.phase != "all":
        jax.config.update("jax_platforms", "cpu")

    import subprocess
    import sys

    if args.phase == "all":
        # orchestrator: no jax/TPU use in this process. Strip the
        # --phase flag positionally (a value filter would also eat any
        # unrelated argument whose value is literally 'all')
        base = list(argv if argv is not None else sys.argv[1:])
        for i, a in enumerate(base):
            if a == "--phase":
                del base[i:i + 2]
                break
            if a.startswith("--phase="):
                del base[i]
                break
        for phase in ("collect", "shards"):
            rc = subprocess.run(
                [sys.executable, "-m", "deqmpc_tpu.data.dagger",
                 *base, "--phase", phase]).returncode
            if rc != 0:
                raise SystemExit(f"dagger phase {phase} failed (rc={rc})")
        return

    args = apply_model_type_presets(args)
    env = make_env(args.env)
    if args.nq <= 0:
        args.nq = env.nq if env.nq <= env.nx // 2 else env.nx // 2

    if args.phase == "collect":
        policy = build_policy(args, env)
        params = policy.init(jax.random.PRNGKey(args.seed))
        params, _, _, _ = load_checkpoint(
            os.path.join(args.models_dir, args.ckpt), params)
        states = collect_policy_states(
            args, env, policy, params, n_episodes=64, seed=args.seed)
        if len(states) == 0:
            raise SystemExit(
                "dagger collect: every visited state was rejected by the "
                "envelope filter (policy rollouts left the teacher's "
                "competence region entirely) — check the checkpoint "
                "quality or widen the envelope in collect_policy_states")
        rng = np.random.default_rng(args.seed)
        idx = rng.choice(len(states),
                         size=min(args.dagger_episodes, len(states)),
                         replace=False)
        np.savez(args.starts_npz, x0=states[idx])
        print(f"collected {len(idx)} start states -> {args.starts_npz}",
              flush=True)
        return

    # phase == "shards": crash-resilient 64-episode teacher shards,
    # each in a FRESH subprocess appending to the dataset pickle
    import tempfile

    starts = np.load(args.starts_npz)["x0"]
    path = expert_data_path(env.spec_id, args.teacher)
    failed = 0
    for lo in range(0, len(starts), 64):
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as tf:
            np.savez(tf.name, x0=starts[lo:lo + 64])
            shard_npz = tf.name
        cmd = [sys.executable, "-m", "deqmpc_tpu.data.expert_gen",
               "--env", args.env, "--x0_npz", shard_npz, "--append",
               "--teacher", args.teacher,
               "--ep_len", str(args.dagger_ep_len),
               "--horizon", str(args.dagger_horizon),
               "--al_iters", str(args.al_iters),
               "--noise_std", str(args.dagger_noise_std),
               "--seed", str(args.seed + lo)]
        if args.cpu:
            cmd.append("--cpu")
        rc = subprocess.run(cmd).returncode
        print(f"shard {lo // 64}: rc={rc}", flush=True)
        failed += rc != 0
    # the append path writes via temp-file + os.replace, so a crashed
    # shard loses only its own episodes; still surface the loss
    with open(path, "rb") as f:
        n_eps = len(pickle.load(f))
    print(f"dataset now has {n_eps} episodes -> {path}")
    if failed:
        raise SystemExit(f"dagger shards: {failed} shard(s) failed — "
                         "their corrective episodes are missing")


if __name__ == "__main__":
    main()
