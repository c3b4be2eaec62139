"""Vectorized environment wrapper with auto-reset.

Counterpart of the reference's `cgac_env.PytorchEnv`
(`deqmpc/cgac_env.py`, num_envs~4096): a functional batched rollout
interface with per-lane step counters and automatic resets on episode
end / non-finite states — used to train RL experts and to run
closed-loop evaluation at scale. State is an explicit pytree; `step`
is jittable."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class VecEnvState(NamedTuple):
    x: Array          # (n_envs, nx)
    num_steps: Array  # (n_envs,)
    rng: Array


class VecEnv:
    def __init__(self, env, n_envs: int = 4096,
                 max_episode_steps: int | None = None):
        self.env = env
        self.n_envs = n_envs
        self.max_steps = max_episode_steps or env._max_episode_steps

    def reset(self, rng: Array) -> VecEnvState:
        rng, sub = jax.random.split(rng)
        x = self.env.reset(sub, self.n_envs)
        return VecEnvState(
            x=x, num_steps=jnp.zeros((self.n_envs,), jnp.int32), rng=rng
        )

    def step(self, state: VecEnvState, u: Array
             ) -> Tuple[VecEnvState, Array, Array, Array]:
        """Returns (new_state, obs, reward, done); done lanes are
        auto-reset (reference `rex_quadrotor.py:182-214` semantics,
        made functional)."""
        x_next, reward = self.env.step(state.x, u)
        bad = self.env.is_bad_state(x_next, reward)
        num_steps = state.num_steps + 1
        done = jnp.logical_or(num_steps >= self.max_steps, bad)
        reward = jnp.where(bad, 0.0, reward)
        rng, sub = jax.random.split(state.rng)
        x_reset = self.env.reset(sub, self.n_envs)
        x_new = jnp.where(done[:, None], x_reset, x_next)
        num_steps = jnp.where(done, 0, num_steps)
        return (
            VecEnvState(x=x_new, num_steps=num_steps, rng=rng),
            x_new,
            reward,
            done,
        )
