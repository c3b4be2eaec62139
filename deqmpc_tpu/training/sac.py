"""Minimal SAC teacher on the vectorized env (RL expert data path).

The reference's expert pickles come from stochastic RL teachers —
`expert_traj_sac-Pendulum-v0_new.pkl`, `expert_traj_cgac-*`
(`/root/reference/deqmpc/datagen.py:15-29`) — trained on the
`cgac_env.PytorchEnv` 4096-env substrate (`cgac_env.py:14`). This
module reproduces that data regime TPU-natively: a soft actor-critic
(twin critics, tanh-Gaussian actor, auto-tuned temperature) trained on
`envs.vec_env.VecEnv`, with the whole collect+update loop as one
jitted `lax.scan` — environment stepping, replay writes, and gradient
updates all stay on device.

Usage (CLI mirrors expert_gen):
    python -m deqmpc_tpu.training.sac --env pendulum \
        --total_steps 200000 --episodes 256
writes `data/expert_traj_sac-<spec>_new.pkl` in the reference pickle
format (list of episodes of (state, action) tuples).
"""
from __future__ import annotations

import argparse
import functools
import os
import pickle
from typing import Callable, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array

LOG_STD_MIN, LOG_STD_MAX = -5.0, 2.0


def obs_featurizer(env_name: str, nx: int) -> Tuple[Callable, int]:
    """RL observation map. Angle dims are lifted to (cos, sin) so the
    actor sees a continuous chart of the circle (the raw wrapped angle
    has a jump the MLP cannot represent)."""
    from ..utils import angle_idxs_for_env

    idxs = angle_idxs_for_env(env_name, nx)
    if idxs is None or len(idxs) == 0:
        return (lambda x: x), nx
    idxs = jnp.asarray(idxs)
    mask = np.zeros(nx, bool)
    mask[np.asarray(idxs)] = True
    rest = jnp.asarray(np.nonzero(~mask)[0])

    def feat(x):
        th = x[..., idxs]
        return jnp.concatenate(
            [jnp.cos(th), jnp.sin(th), x[..., rest]], axis=-1)

    return feat, 2 * len(np.asarray(idxs)) + int((~mask).sum())


class TanhGaussianActor(nn.Module):
    nu: int
    hdim: int = 256

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array]:
        h = nn.relu(nn.Dense(self.hdim)(obs))
        h = nn.relu(nn.Dense(self.hdim)(h))
        mu = nn.Dense(self.nu)(h)
        log_std = jnp.clip(nn.Dense(self.nu)(h), LOG_STD_MIN, LOG_STD_MAX)
        return mu, log_std


class DoubleCritic(nn.Module):
    hdim: int = 256

    @nn.compact
    def __call__(self, obs: Array, act: Array) -> Tuple[Array, Array]:
        x = jnp.concatenate([obs, act], axis=-1)

        def q(x):
            h = nn.relu(nn.Dense(self.hdim)(x))
            h = nn.relu(nn.Dense(self.hdim)(h))
            return nn.Dense(1)(h)[..., 0]

        return q(x), q(x)


def squash(mu, log_std, key, u_lo, u_hi):
    """Sample a tanh-squashed Gaussian action scaled to the box;
    returns (action, log_prob)."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    a = jnp.tanh(pre)
    # log N(pre) - log|d tanh| ; stable form via softplus
    logp = (-0.5 * (eps ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
            - 2 * (jnp.log(2.0) - pre - jax.nn.softplus(-2 * pre)))
    scale = (u_hi - u_lo) / 2.0
    act = u_lo + (a + 1.0) * scale
    return act, jnp.sum(logp - jnp.log(scale), axis=-1)


def unsquash_det(mu, u_lo, u_hi):
    return u_lo + (jnp.tanh(mu) + 1.0) * (u_hi - u_lo) / 2.0


class Replay(NamedTuple):
    obs: Array
    act: Array
    rew: Array
    nobs: Array
    done: Array
    ptr: Array    # int32 write cursor
    size: Array   # int32 fill level


class SACState(NamedTuple):
    actor: dict
    critic: dict
    target: dict
    log_alpha: Array
    opt_actor: tuple
    opt_critic: tuple
    opt_alpha: tuple
    env_state: tuple
    replay: Replay
    rng: Array
    step: Array


class SACTrainer:
    """Collect+update SAC loop, fully jitted. One `run(state, n)` call
    scans n iterations; each iteration steps every env lane once,
    writes the transitions into the on-device ring buffer, and does one
    gradient update on a sampled minibatch."""

    def __init__(self, env, env_name: str, n_envs: int = 128,
                 hdim: int = 256, buffer_size: int = 200_000,
                 batch: int = 256, gamma: float = 0.99, tau: float = 0.005,
                 lr: float = 3e-4, start_steps: int = 2_000,
                 ep_len: int = 200, smooth_w: float = 0.0):
        from ..envs.vec_env import VecEnv

        self.env = env
        # reward shaping: small quadratic penalty on joint velocities
        # and normalized action. The raw env rewards penalize only
        # configuration error, and SAC exploits that with chattering
        # bang-bang limit cycles (measured on cartpole1link: pole held
        # upright with u flipping +-38 and thetadot +-1.9 every step —
        # useless as an imitation teacher). The reference's RL-teacher
        # training code (cgac) is not public; its datasets imply smooth
        # experts, which this term recovers.
        self.smooth_w = float(smooth_w)
        self.n_envs = n_envs
        self.vec = VecEnv(env, n_envs=n_envs, max_episode_steps=ep_len)
        self.feat, self.nobs_dim = obs_featurizer(env_name, env.nx)
        self.nu = env.nu
        self.u_lo = jnp.asarray(env.action_space.low, jnp.float32)
        self.u_hi = jnp.asarray(env.action_space.high, jnp.float32)
        self.actor = TanhGaussianActor(nu=env.nu, hdim=hdim)
        self.critic = DoubleCritic(hdim=hdim)
        self.gamma, self.tau = gamma, tau
        self.batch = batch
        self.buffer_size = buffer_size
        self.start_steps = start_steps
        self.target_entropy = -float(env.nu)
        self.opt_a = optax.adam(lr)
        self.opt_c = optax.adam(lr)
        self.opt_t = optax.adam(lr)

    def init(self, seed: int = 0) -> SACState:
        rng = jax.random.PRNGKey(seed)
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        obs0 = jnp.zeros((1, self.nobs_dim))
        act0 = jnp.zeros((1, self.nu))
        actor_p = self.actor.init(k1, obs0)
        critic_p = self.critic.init(k2, obs0, act0)
        log_alpha = jnp.asarray(0.0)
        B = self.buffer_size
        replay = Replay(
            obs=jnp.zeros((B, self.env.nx), jnp.float32),
            act=jnp.zeros((B, self.nu), jnp.float32),
            rew=jnp.zeros((B,), jnp.float32),
            nobs=jnp.zeros((B, self.env.nx), jnp.float32),
            done=jnp.zeros((B,), jnp.float32),
            ptr=jnp.asarray(0, jnp.int32),
            size=jnp.asarray(0, jnp.int32),
        )
        return SACState(
            actor=actor_p, critic=critic_p, target=critic_p,
            log_alpha=log_alpha,
            opt_actor=self.opt_a.init(actor_p),
            opt_critic=self.opt_c.init(critic_p),
            opt_alpha=self.opt_t.init(log_alpha),
            env_state=self.vec.reset(k3),
            replay=replay, rng=rng, step=jnp.asarray(0, jnp.int32),
        )

    # -- one collect+update iteration ------------------------------------
    def _iter(self, state: SACState, _) -> Tuple[SACState, dict]:
        rng, k_act, k_samp, k_next, k_expl = jax.random.split(state.rng, 5)
        x = state.env_state.x
        obs_f = self.feat(x)
        mu, log_std = self.actor.apply(state.actor, obs_f)
        a_pi, _ = squash(mu, log_std, k_act, self.u_lo, self.u_hi)
        # uniform random actions until the buffer warms up
        a_rand = jax.random.uniform(
            k_expl, a_pi.shape, minval=self.u_lo, maxval=self.u_hi)
        a = jnp.where(state.step < self.start_steps, a_rand, a_pi)
        env_state, x_next_reset, rew, done = self.vec.step(state.env_state, a)
        if self.smooth_w > 0:
            nq = self.env.nx // 2
            u_n = (2 * a - (self.u_hi + self.u_lo)) / (self.u_hi - self.u_lo)
            rew = rew - self.smooth_w * (
                jnp.sum(x[..., nq:] ** 2, axis=-1)
                + jnp.sum(u_n ** 2, axis=-1))
        # store the TRUE next state (pre-reset) for the TD target;
        # time-limit terminations bootstrap (done=0), bad-state
        # terminations don't
        x_next_true = self.env.step(x, a)[0]
        bad = self.env.is_bad_state(x_next_true, rew)
        replay = self._write(state.replay, x, a, rew, x_next_true,
                             bad.astype(jnp.float32))

        # one SGD step on a sampled batch (skipped while warming up by
        # sampling from whatever is there — size>=n_envs always holds)
        batch = self._sample(replay, k_samp)
        new_state, info = self._update(
            state._replace(rng=rng, env_state=env_state, replay=replay,
                           step=state.step + 1),
            batch, k_next)
        info["rew"] = jnp.mean(rew)
        return new_state, info

    def _write(self, rp: Replay, obs, act, rew, nobs, done) -> Replay:
        idx = (rp.ptr + jnp.arange(self.n_envs)) % self.buffer_size
        return Replay(
            obs=rp.obs.at[idx].set(obs),
            act=rp.act.at[idx].set(act),
            rew=rp.rew.at[idx].set(rew),
            nobs=rp.nobs.at[idx].set(nobs),
            done=rp.done.at[idx].set(done),
            ptr=(rp.ptr + self.n_envs) % self.buffer_size,
            size=jnp.minimum(rp.size + self.n_envs, self.buffer_size),
        )

    def _sample(self, rp: Replay, key):
        idx = jax.random.randint(key, (self.batch,), 0, rp.size)
        return (rp.obs[idx], rp.act[idx], rp.rew[idx], rp.nobs[idx],
                rp.done[idx])

    def _update(self, state: SACState, batch, key) -> Tuple[SACState, dict]:
        obs, act, rew, nobs, done = batch
        obs_f, nobs_f = self.feat(obs), self.feat(nobs)
        alpha = jnp.exp(state.log_alpha)

        mu_n, ls_n = self.actor.apply(state.actor, nobs_f)
        a_n, logp_n = squash(mu_n, ls_n, key, self.u_lo, self.u_hi)
        q1_t, q2_t = self.critic.apply(state.target, nobs_f, a_n)
        target = rew + self.gamma * (1 - done) * (
            jnp.minimum(q1_t, q2_t) - alpha * logp_n)
        target = jax.lax.stop_gradient(target)

        def critic_loss(cp):
            q1, q2 = self.critic.apply(cp, obs_f, act)
            return jnp.mean((q1 - target) ** 2 + (q2 - target) ** 2)

        cl, gc = jax.value_and_grad(critic_loss)(state.critic)
        upd_c, opt_c = self.opt_c.update(gc, state.opt_critic)
        critic = optax.apply_updates(state.critic, upd_c)

        def actor_loss(ap):
            mu, ls = self.actor.apply(ap, obs_f)
            a, logp = squash(mu, ls, key, self.u_lo, self.u_hi)
            q1, q2 = self.critic.apply(critic, obs_f, a)
            return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

        (al, logp), ga = jax.value_and_grad(actor_loss, has_aux=True)(
            state.actor)
        upd_a, opt_a = self.opt_a.update(ga, state.opt_actor)
        actor = optax.apply_updates(state.actor, upd_a)

        def alpha_loss(la):
            return -jnp.mean(
                la * jax.lax.stop_gradient(logp + self.target_entropy))

        tl, gt = jax.value_and_grad(alpha_loss)(state.log_alpha)
        upd_t, opt_t = self.opt_t.update(gt, state.opt_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, upd_t)

        target_p = jax.tree_util.tree_map(
            lambda t, o: (1 - self.tau) * t + self.tau * o,
            state.target, critic)
        return state._replace(
            actor=actor, critic=critic, target=target_p,
            log_alpha=log_alpha, opt_actor=opt_a, opt_critic=opt_c,
            opt_alpha=opt_t,
        ), {"critic_loss": cl, "actor_loss": al, "alpha": alpha}

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def run(self, state: SACState, n: int) -> Tuple[SACState, dict]:
        return jax.lax.scan(self._iter, state, None, length=n)

    # -- expert dataset ---------------------------------------------------
    def generate_expert(self, state: SACState, n_episodes: int = 256,
                        ep_len: int = 200, seed: int = 1,
                        noise_std: float = 0.0):
        """Deterministic (tanh-mean) rollouts in the reference pickle
        format: a list of episodes of (state, action) tuples
        (`datagen.py:34-59` merge layout).

        noise_std > 0 records the CLEAN action but steps the env with a
        noise-perturbed one (DART), widening state coverage the way the
        reference's stochastic RL teachers did — pure deterministic
        rollouts converge so fast the dataset misses the corrective
        behavior cloning needs (measured: 44% closed-loop success from
        the noiseless set vs 100% from the wide energy-teacher set)."""
        rng = jax.random.PRNGKey(seed)
        rng, kr = jax.random.split(rng)
        x0 = self.env.reset(kr, n_episodes)

        @jax.jit
        def rollout(x0, key):
            def body(x, k):
                mu, _ = self.actor.apply(state.actor, self.feat(x))
                u = unsquash_det(mu, self.u_lo, self.u_hi)
                u_apply = u
                if noise_std > 0:
                    u_apply = jnp.clip(
                        u + noise_std * jax.random.normal(k, u.shape),
                        self.u_lo, self.u_hi)
                return self.env.step(x, u_apply)[0], (self.env.state_clip(x), u)

            keys = jax.random.split(key, ep_len)
            _, (xs, us) = jax.lax.scan(body, x0, keys)
            return xs, us

        xs, us = rollout(x0, rng)
        states = np.moveaxis(np.asarray(xs), 0, 1)
        actions = np.moveaxis(np.asarray(us), 0, 1)
        ok = (np.isfinite(states).all(axis=(1, 2))
              & np.isfinite(actions).all(axis=(1, 2)))
        return [[(states[b, t], actions[b, t]) for t in range(ep_len)]
                for b in np.nonzero(ok)[0]]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="pendulum")
    p.add_argument("--n_envs", type=int, default=128)
    p.add_argument("--total_steps", type=int, default=150_000,
                   help="collect+update iterations (each steps all lanes)")
    p.add_argument("--hdim", type=int, default=256)
    p.add_argument("--ep_len", type=int, default=200)
    p.add_argument("--episodes", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--noise_std", type=float, default=0.2,
                   help="DART exploration noise during expert rollouts "
                        "(clean actions recorded)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--smooth_w", type=float, default=0.0,
                   help="quadratic velocity+action reward shaping (see "
                        "SACTrainer.smooth_w; 0.1 fixes the cartpole "
                        "chattering limit cycle)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--save_actor", type=str, default=None,
                   help="pickle the trained actor params here")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..envs import make_env
    from ..data.datagen import DATA_DIR, expert_data_path

    env = make_env(args.env)
    tr = SACTrainer(env, args.env, n_envs=args.n_envs, hdim=args.hdim,
                    ep_len=args.ep_len, smooth_w=args.smooth_w)
    state = tr.init(args.seed)
    chunk = 1000
    for i in range(0, args.total_steps, chunk):
        state, info = tr.run(state, chunk)
        print(f"iter {i + chunk}: rew={float(jnp.mean(info['rew'])):.4f} "
              f"critic={float(jnp.mean(info['critic_loss'])):.4f} "
              f"alpha={float(info['alpha'][-1]):.4f}", flush=True)

    if args.save_actor:
        with open(args.save_actor, "wb") as f:
            pickle.dump(jax.device_get(state.actor), f)
    episodes = tr.generate_expert(state, n_episodes=args.episodes,
                                  ep_len=args.ep_len, seed=args.seed + 1,
                                  noise_std=args.noise_std)
    os.makedirs(DATA_DIR, exist_ok=True)
    path = args.out or expert_data_path(env.spec_id, "sac")
    with open(path, "wb") as f:
        pickle.dump(episodes, f)
    # wrap-aware final-distance quality report (as expert_gen does)
    from ..utils import angle_idxs_for_env

    targ = np.asarray(env.targ_pos)
    finals = np.asarray([ep[-1][0] for ep in episodes])
    d = finals - targ
    idxs = angle_idxs_for_env(args.env, env.nx)
    idxs = [] if idxs is None else list(idxs)
    for i_ in idxs:
        d[:, i_] = np.angle(np.exp(1j * d[:, i_]))
    dist = np.linalg.norm(d, axis=-1)
    print(f"saved {len(episodes)} episodes to {path}; "
          f"final dist mean={dist.mean():.3f} median={np.median(dist):.3f}")


if __name__ == "__main__":
    main()
