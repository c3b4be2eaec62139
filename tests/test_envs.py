"""Env tests: FD-vs-analytic Jacobians (the reference's de-facto
correctness oracle, `my_envs/dynamics.py:110-247`), shape contracts,
energy sanity for the Lagrangian cartpole, MRP round-trips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqmpc_tpu.envs import (Cartpole2linkEnv, CartpoleEnv, FlyingCartpole,
                             IntegratorEnv, PendulumEnv, RexQuadrotor)
from deqmpc_tpu.utils.rotations import (euler_to_quaternion, mrp2quat,
                                        mrp2rot, quat2mrp, quatrot)

ENVS = [
    PendulumEnv(),
    IntegratorEnv(),
    CartpoleEnv(nx=4, dt=0.05),
    CartpoleEnv(nx=6, dt=0.03),
    RexQuadrotor(),
    FlyingCartpole(),
]


@pytest.mark.parametrize("env", ENVS, ids=lambda e: e.spec_id)
def test_jacobians_match_finite_difference(env):
    rng = np.random.default_rng(0)
    bsz = 4
    x = jnp.asarray(rng.normal(size=(bsz, env.nx)) * 0.3)
    u = jnp.asarray(rng.normal(size=(bsz, env.nu)) * 0.1)
    x_next, (Jx, Ju) = env.dynamics_derivatives(x, u)
    Jx_fd, Ju_fd = env.finite_diff_derivatives(x, u)
    assert x_next.shape == (bsz, env.nx)
    assert Jx.shape == (bsz, env.nx, env.nx)
    assert Ju.shape == (bsz, env.nx, env.nu)
    np.testing.assert_allclose(Jx, Jx_fd, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Ju, Ju_fd, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("env", ENVS, ids=lambda e: e.spec_id)
def test_dynamics_batch_consistency(env):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, env.nx)) * 0.2)
    u = jnp.asarray(rng.normal(size=(3, env.nu)) * 0.1)
    batched = env.dynamics(x, u)
    singles = jnp.stack([env.dynamics(x[i], u[i]) for i in range(3)])
    np.testing.assert_allclose(batched, singles, rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_cartpole_energy_conservation():
    """With zero input and no friction, RK4 at dt=1e-3 conserves energy."""
    env = CartpoleEnv(nx=4, dt=1e-3)
    x = jnp.array([0.0, 0.7, 0.0, 0.0])

    def energy(x):
        q, qd = x[:2], x[2:]
        return env._kinetic(q, qd) + env._potential(q)

    e0 = energy(x)
    for _ in range(200):
        x = env.dynamics(x, jnp.zeros(1))
    assert abs(float(energy(x) - e0)) < 1e-6


@pytest.mark.slow
def test_cartpole2l_energy_conservation():
    """2-link: catches mask-matrix mistakes the 1x1 case hides."""
    env = CartpoleEnv(nx=6, dt=1e-3)
    x = jnp.array([0.0, 0.7, -0.4, 0.0, 0.2, 0.1])

    def energy(x):
        q, qd = x[:3], x[3:]
        return env._kinetic(q, qd) + env._potential(q)

    e0 = energy(x)
    for _ in range(200):
        x = env.dynamics(x, jnp.zeros(1))
    assert abs(float(energy(x) - e0)) < 1e-6


def test_cartpole_pendulum_falls_correct_direction():
    """Upright unstable equilibrium: small perturbation grows."""
    env = CartpoleEnv(nx=4, dt=0.05)
    x = jnp.array([0.0, 0.01, 0.0, 0.0])
    for _ in range(20):
        x = env.dynamics(x, jnp.zeros(1))
    assert float(x[1]) > 0.05  # angle grew away from upright


def test_mrp_quaternion_roundtrip():
    rng = np.random.default_rng(2)
    e = jnp.asarray(rng.uniform(-1.0, 1.0, size=(16, 3)))
    q = euler_to_quaternion(e)
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, rtol=1e-12)
    p = quat2mrp(q)
    q2 = mrp2quat(p)
    np.testing.assert_allclose(q, q2, atol=1e-10)


def test_mrp_rotation_consistency():
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.uniform(-0.3, 0.3, size=(8, 3)))
    v = jnp.asarray(rng.normal(size=(8, 3)))
    R = mrp2rot(p)
    v_rot_mat = jnp.einsum("bij,bj->bi", R, v)
    v_rot_quat = quatrot(mrp2quat(p), v)
    np.testing.assert_allclose(v_rot_mat, v_rot_quat, atol=1e-10)


def test_quadrotor_hover():
    """At hover throttle with zero attitude/velocity, the quad stays put."""
    env = RexQuadrotor()
    x = jnp.zeros(12)
    u = jnp.full(4, env.u_hover)
    x_next = env.dynamics(x, u)
    np.testing.assert_allclose(x_next, x, atol=1e-8)


def test_flying_cartpole_hover_pendulum_dynamics():
    """At hover (u=0 offset) with pole slightly off-down, pole swings."""
    env = FlyingCartpole()
    x = jnp.zeros(14).at[6].set(0.1)
    u = jnp.zeros(4)
    x2 = env.dynamics(x, u)
    # quad stays ~fixed, pendulum angle moves under gravity
    np.testing.assert_allclose(x2[:3], 0.0, atol=1e-6)
    assert abs(float(x2[6]) - 0.1) > 1e-6


def test_rollout_shapes():
    env = PendulumEnv()
    x0 = jnp.zeros((5, 2))
    us = jnp.zeros((5, 7, 1))
    xs = env.rollout(x0, us)
    assert xs.shape == (5, 8, 2)


def test_reset_and_step():
    env = FlyingCartpole(obstacles=True)
    x = env.reset(jax.random.PRNGKey(0), 6)
    assert x.shape == (6, 14)
    xn, r = env.step(x, jnp.zeros((6, 4)))
    assert xn.shape == (6, 14) and r.shape == (6,)
    assert not bool(jnp.any(jnp.isnan(xn)))


def test_reset_x_window_override():
    """reset(x_window=...) narrows the start distribution (reference
    parity: `rex_quadrotor.py:260-270` reset takes an x_window
    override). A zero window pins euler-space dims to their nominal
    values (theta offset 0 -> pole exactly upright at pi)."""
    env = FlyingCartpole()
    w = np.zeros(14)
    w[:3] = 0.5
    x = env.reset(jax.random.PRNGKey(1), 8, x_window=w)
    assert np.abs(np.asarray(x[:, :3])).max() <= 0.5
    np.testing.assert_allclose(np.asarray(x[:, 6]), np.pi, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[:, 7:]), 0.0, atol=1e-6)

    from deqmpc_tpu.envs import RexQuadrotor
    env2 = RexQuadrotor()
    x2 = env2.reset(jax.random.PRNGKey(2), 4, x_window=np.zeros(12))
    np.testing.assert_allclose(np.asarray(x2), 0.0, atol=1e-6)
