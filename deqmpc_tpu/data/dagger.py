"""Corrective expert data from policy-visited states (DAgger-style).

The reference trains from stochastic RL teachers (SAC/CGAC,
`datagen.py:15-29`) whose data covers a wide tube around the task
manifold; our analytic/MPC teachers are nearly deterministic, so pure
behavior cloning sees too little of the closed-loop state
distribution. This module closes the loop: roll the CURRENT policy,
collect the states it actually visits (including its mistakes), and
generate expert demonstrations restarting from those states. Appending
these to the dataset and retraining is one DAgger round.

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

    x = env.reset(jax.random.PRNGKey(seed), n_episodes)
    visited = []
    for t in range(ep_len):
        u0 = cold(params, x)
        x, _ = env.step(x, u0)
        if t % subsample == 0:
            visited.append(np.asarray(x))
    out = np.concatenate(visited, axis=0)
    return out[np.isfinite(out).all(axis=-1)]


def pendulum_expert_fn(env, noise_std: float = 0.1):
    """The energy-shaping teacher as a state-feedback law
    (`expert_gen.generate_pendulum_energy_expert`)."""
    m, l, g = env.m, env.l, env.g
    E_des = 2 * m * g * l
    u_max = float(env.max_torque)

    def expert_u(x, key):
        th, thd = x[..., 0], x[..., 1]
        E = 0.5 * m * l**2 * thd**2 + m * g * l * (1 - jnp.cos(th))
        err = jnp.mod(th - jnp.pi + jnp.pi, 2 * jnp.pi) - jnp.pi
        near = jnp.logical_and(jnp.abs(err) < 0.15, jnp.abs(thd) < 2.5)
        up = 1.0 * (E_des - E) * jnp.sign(
            jnp.where(jnp.abs(thd) < 1e-3, 1.0, thd))
        upd = -30.0 * err - 6.0 * thd
        u = jnp.where(near, upd, up)
        u = u + noise_std * jax.random.normal(key, u.shape)
        return jnp.clip(u, -u_max, u_max)[..., None]

    return expert_u


def expert_rollouts_from(env, expert_fn, starts: np.ndarray,
                         ep_len: int = 100, seed: int = 0):
    """Expert demonstrations restarting from the given states; returns
    episodes in the pickle format (list of (state, action) lists)."""
    x0 = jnp.asarray(starts, jnp.float32)
    bsz = x0.shape[0]

    @jax.jit
    def rollout(x0, key):
        def body(x, k):
            u = expert_fn(x, k)
            x_next, _ = env.step(x, u)
            return x_next, (x, u)

        keys = jax.random.split(key, ep_len)
        _, (xs, us) = jax.lax.scan(body, x0, keys)
        return xs, us

    xs, us = rollout(x0, jax.random.PRNGKey(seed))
    states = np.moveaxis(np.asarray(xs), 0, 1)
    actions = np.moveaxis(np.asarray(us), 0, 1)
    ok = (np.isfinite(states).all(axis=(1, 2))
          & np.isfinite(actions).all(axis=(1, 2)))
    return [
        [(states[b, t], actions[b, t]) for t in range(ep_len)]
        for b in np.nonzero(ok)[0]
    ]


def main(argv=None):
    import argparse

    from ..training.train import (apply_model_type_presets, build_argparser,
                                  build_policy, load_checkpoint)

    p = build_argparser()
    p.add_argument("--dagger_episodes", type=int, default=256,
                   help="number of policy rollout episodes to mine")
    p.add_argument("--dagger_ep_len", type=int, default=100,
                   help="length of each corrective expert rollout")
    p.add_argument("--dagger_noise_std", type=float, default=0.1)
    args = p.parse_args(argv)
    args = apply_model_type_presets(args)

    env = make_env(args.env)
    if args.nq <= 0:
        args.nq = env.nq if env.nq <= env.nx // 2 else env.nx // 2
    policy = build_policy(args, env)
    params = policy.init(jax.random.PRNGKey(args.seed))
    import os
    params, _, _, _ = load_checkpoint(
        os.path.join(args.models_dir, args.ckpt), params)

    states = collect_policy_states(
        args, env, policy, params, n_episodes=64, seed=args.seed)
    # subsample the start pool to the requested number of episodes
    rng = np.random.default_rng(args.seed)
    idx = rng.choice(len(states), size=min(args.dagger_episodes, len(states)),
                     replace=False)
    if not args.env.startswith("pendulum"):
        raise NotImplementedError(
            "corrective teacher currently wired for pendulum; other envs "
            "use the MPC teacher in expert_gen")
    expert_fn = pendulum_expert_fn(env, args.dagger_noise_std)
    new_eps = expert_rollouts_from(env, expert_fn, states[idx],
                                   ep_len=args.dagger_ep_len, seed=args.seed)

    path = expert_data_path(env.spec_id, args.teacher)
    with open(path, "rb") as f:
        eps = pickle.load(f)
    eps = eps + new_eps
    with open(path, "wb") as f:
        pickle.dump(eps, f)
    print(f"appended {len(new_eps)} corrective episodes -> {path} "
          f"(total {len(eps)})")


if __name__ == "__main__":
    main()
