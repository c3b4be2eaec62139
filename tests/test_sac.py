"""SAC RL-teacher smoke tests (reference `datagen.py:15-29` sac/cgac
expert path, `cgac_env.py` substrate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqmpc_tpu.envs import make_env
from deqmpc_tpu.training.sac import SACTrainer, obs_featurizer


@pytest.fixture(scope="module")
def trainer():
    env = make_env("pendulum")
    tr = SACTrainer(env, "pendulum", n_envs=16, hdim=32, buffer_size=4096,
                    batch=64, start_steps=64, ep_len=100)
    return tr, tr.init(0)


def test_featurizer_lifts_angles():
    env = make_env("pendulum")
    feat, dim = obs_featurizer("pendulum", env.nx)
    assert dim == 3  # (cos th, sin th, thdot)
    x = jnp.asarray([[0.1, -2.0]])
    f = np.asarray(feat(x))
    np.testing.assert_allclose(
        f, [[np.cos(0.1), np.sin(0.1), -2.0]], atol=1e-6)
    # wrap continuity: theta 0 and 2pi map to the same features
    f0 = np.asarray(feat(jnp.asarray([[0.0, 0.0]])))
    f1 = np.asarray(feat(jnp.asarray([[2 * np.pi, 0.0]])))
    np.testing.assert_allclose(f0, f1, atol=1e-6)


def test_collect_update_loop_runs_and_is_finite(trainer):
    tr, st = trainer
    st, info = tr.run(st, 150)
    for k in ("critic_loss", "actor_loss", "alpha", "rew"):
        assert np.isfinite(np.asarray(info[k])).all(), k
    assert int(st.step) == 150
    assert int(st.replay.size) == min(150 * 16, tr.buffer_size)
    # replay wrote real transitions, not zeros
    assert float(jnp.abs(st.replay.obs[: 16 * 150]).sum()) > 0


def test_expert_rollout_format(trainer):
    tr, st = trainer
    eps = tr.generate_expert(st, n_episodes=3, ep_len=20)
    assert len(eps) == 3 and len(eps[0]) == 20
    s, a = eps[0][0]
    assert s.shape == (2,) and a.shape == (1,)
    # actions respect the torque box
    env = tr.env
    for ep in eps:
        for _, u in ep:
            assert (u >= env.action_space.low - 1e-6).all()
            assert (u <= env.action_space.high + 1e-6).all()


def test_update_actually_learns_q_on_fixed_batch():
    """A critic update step must reduce the TD error on the same batch
    (sanity that gradients are wired, not a convergence test)."""
    env = make_env("pendulum")
    tr = SACTrainer(env, "pendulum", n_envs=8, hdim=32, buffer_size=1024,
                    batch=32, start_steps=8, ep_len=50)
    st = tr.init(1)
    st, _ = tr.run(st, 30)
    key = jax.random.PRNGKey(0)
    batch = tr._sample(st.replay, key)

    def td(stt):
        obs, act, rew, nobs, done = batch
        obs_f, nobs_f = tr.feat(obs), tr.feat(nobs)
        mu_n, ls_n = tr.actor.apply(stt.actor, nobs_f)
        from deqmpc_tpu.training.sac import squash

        a_n, logp_n = squash(mu_n, ls_n, key, tr.u_lo, tr.u_hi)
        q1_t, q2_t = tr.critic.apply(stt.target, nobs_f, a_n)
        alpha = jnp.exp(stt.log_alpha)
        target = rew + tr.gamma * (1 - done) * (
            jnp.minimum(q1_t, q2_t) - alpha * logp_n)
        q1, q2 = tr.critic.apply(stt.critic, obs_f, act)
        return float(jnp.mean((q1 - target) ** 2 + (q2 - target) ** 2))

    before = td(st)
    st2, _ = tr._update(st, batch, key)
    after = td(st2._replace(target=st.target, log_alpha=st.log_alpha))
    assert after < before
