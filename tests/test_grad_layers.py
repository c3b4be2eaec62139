"""Tests for the custom-gradient utilities (grad_norm, Hutchinson jac
loss, EMA scale update) and the cost-history AL warm start."""
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.models.grad_layers import (grad_norm, jac_loss_estimate,
                                           update_scales)
from deqmpc_tpu.solvers import ALMPC, QuadCost
from deqmpc_tpu.solvers.al_mpc import warm_start_al, warm_start_al_stream


def test_grad_norm_identity_forward_equalized_backward():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
    w = jnp.array([100.0, 1.0, 0.01, 10.0])
    assert jnp.allclose(grad_norm(x), x)

    g = jax.grad(lambda xx: jnp.sum(jnp.abs(grad_norm(xx)) * w))(x)
    ch = jnp.mean(jnp.abs(g), axis=0)
    # all channels rescaled to carry the same mean magnitude
    assert jnp.allclose(ch, jnp.mean(ch), rtol=1e-4)
    # gradient direction per element is preserved (positive rescale)
    g_plain = jax.grad(lambda xx: jnp.sum(jnp.abs(xx) * w))(x)
    assert jnp.all(jnp.sign(g) == jnp.sign(g_plain))


def test_jac_loss_estimate_linear_map():
    A = jax.random.normal(jax.random.PRNGKey(1), (6, 6)) * 0.3
    z0 = jax.random.normal(jax.random.PRNGKey(2), (6,))
    est = jac_loss_estimate(lambda z: A @ z, z0, jax.random.PRNGKey(3),
                            vecs=4096)
    exact = jnp.sum(A * A) / z0.size
    np.testing.assert_allclose(float(est), float(exact), rtol=0.1)


def test_update_scales_ema():
    deq_iter, T, nx, bsz = 3, 5, 2, 16
    scales = jnp.ones((deq_iter, T - 1, nx))
    rng = jax.random.PRNGKey(0)
    gt = jax.random.normal(rng, (bsz, T, nx))
    init = jnp.zeros((bsz, T, nx))
    trajs = [gt + 0.5, gt - 0.1, gt]  # last one unused (reference [:-1])
    new = update_scales(scales, trajs, gt, init, gamma=0.9)
    assert new.shape == scales.shape
    err0 = jnp.median(jnp.abs(gt[:, 1:] - init[:, 1:]), axis=0)
    np.testing.assert_allclose(np.asarray(new[0]),
                               np.asarray(0.9 * scales[0] + 0.1 * err0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new[1]),
                               np.asarray(0.9 * scales[1] + 0.1 * 0.5),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new[2]),
                               np.asarray(0.9 * scales[2] + 0.1 * 0.1),
                               rtol=1e-4)


def test_warm_start_al_selection():
    H, bsz, ncon = 4, 3, 5
    cost_hist = jnp.array([[10.0, 10.0, 10.0],
                           [5.0, 10.0, 10.0],
                           [1.0, 2.0, 10.0],
                           [0.5, 1.0, 10.0]])
    cost_start = jnp.array([6.0, 3.0, 1.0])
    # first hits: sample0 -> row1, sample1 -> row2, sample2 -> none -> row0
    lam_hist = jnp.arange(H * bsz * ncon, dtype=jnp.float32).reshape(H, bsz, ncon)
    rho_hist = jnp.stack([jnp.full((bsz, 1), 10.0 ** i) for i in range(H)])
    lam = jnp.ones((bsz, ncon))
    rho = jnp.full((bsz, 1), 123.0)
    lam_new, rho_new = warm_start_al(lam, rho, cost_start, cost_hist,
                                     lam_hist, rho_hist)
    np.testing.assert_allclose(np.asarray(rho_new[:, 0]), [10.0, 100.0, 1.0])
    # lam rescaled to the selected history entry's norm
    expect = [float(jnp.linalg.norm(lam_hist[1, 0])),
              float(jnp.linalg.norm(lam_hist[2, 1])),
              float(jnp.linalg.norm(lam_hist[0, 2]))]
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(lam_new, axis=-1)),
                               expect, rtol=1e-5)

    rho_only = warm_start_al_stream(rho, cost_start, cost_hist, rho_hist)
    np.testing.assert_allclose(np.asarray(rho_only), np.asarray(rho_new))


def test_solve_history_roundtrip():
    """solve(return_history=True) produces a usable cost_lam_hist."""
    env = PendulumEnv()
    T, bsz = 5, 4
    def dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], axis=-1)

    mpc = ALMPC(env.nx, env.nu, T, u_lower=env.action_space.low,
                u_upper=env.action_space.high,
                dyn=env.dynamics, dyn_jac=dyn_jac,
                dtype=jnp.float64, rho_max=1e8)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (bsz, env.nx)))
    Q = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(env.Qlqr), jnp.asarray(env.Rlqr)])[None, None],
        (bsz, T, env.nx + env.nu))
    q = jnp.zeros((bsz, T, env.nx + env.nu))
    cost = QuadCost(Q=Q, q=q, f=jnp.zeros((bsz, T)))
    st = mpc.init_state(bsz)
    x, u, status, st2, hist = mpc.solve(x0, cost, st, al_iter=3,
                                        return_history=True)
    cost_hist, lam_hist, rho_hist = hist
    assert cost_hist.shape == (4, bsz)
    assert lam_hist.shape == (4, bsz, mpc.ncon)
    assert rho_hist.shape == (4, bsz, 1)
    assert bool(jnp.all(jnp.isfinite(cost_hist)))
    lam2, rho2 = warm_start_al(st2.lam, st2.rho, cost_hist[0],
                               cost_hist, lam_hist, rho_hist)
    assert lam2.shape == st2.lam.shape and rho2.shape == st2.rho.shape
    assert bool(jnp.all(jnp.isfinite(lam2)))


def test_solve_consumes_warm_start_history():
    """`solve(warm_start_history=...)` restarts (lam, rho) from a prior
    return_history solve — the consumable wiring of the reference's
    otherwise-unused `warm_start_al` helpers (`al_utils.py:17-49`)."""
    env = PendulumEnv()
    T, bsz = 5, 4

    def dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], axis=-1)

    mpc = ALMPC(env.nx, env.nu, T, u_lower=env.action_space.low,
                u_upper=env.action_space.high,
                dyn=env.dynamics, dyn_jac=dyn_jac,
                dtype=jnp.float64, rho_max=1e8)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (bsz, env.nx)))
    Q = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(env.Qlqr),
                         jnp.asarray(env.Rlqr)])[None, None],
        (bsz, T, env.nx + env.nu))
    q = jnp.zeros((bsz, T, env.nx + env.nu))
    cost = QuadCost(Q=Q, q=q, f=jnp.zeros((bsz, T)))
    st = mpc.init_state(bsz)
    _, _, _, st2, hist = mpc.solve(x0, cost, st, al_iter=3,
                                   return_history=True)
    # nearby problem: perturbed start, duals/penalty restarted from the
    # recorded history instead of the raw carried state
    x0b = x0 + 0.01
    x, u, _, st3 = mpc.solve(x0b, cost, st2, al_iter=2,
                             warm_start_history=hist)
    assert bool(jnp.all(jnp.isfinite(x))) and bool(jnp.all(jnp.isfinite(u)))
    # two more AL iterations from the restarted duals keep the iterate
    # near-feasible (threshold is loose: the restart resets rho to an
    # early history entry, trading feasibility for cost progress)
    defects = x[:, 1:] - env.dynamics(x[:, :-1], u[:, :-1])
    assert float(jnp.abs(defects).max()) < 0.5
    # and the restart actually engaged: penalty differs from the plain
    # carried state
    x_p, u_p, _, st_p = mpc.solve(x0b, cost, st2, al_iter=2)
    assert float(jnp.abs(st3.rho - st_p.rho).max()) > 0
