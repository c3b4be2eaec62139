"""AL solver tests:
  1. structured merit gradient == autodiff gradient of the merit;
  2. block GN Hessian == dense diag(Q) + rho*J_c'J_c built by autodiff;
  3. equality-constrained LQ problem matches the dense KKT solution;
  4. nonlinear pendulum solve drives constraint violations to ~0 and
     respects control bounds;
  5. implicit custom_vjp gradients (dQ, dq) match finite differences.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.ops.tridiag import block_tridiag_dense
from deqmpc_tpu.solvers import ALMPC, ALState, LinDx, QuadCost
from deqmpc_tpu.solvers.al_core import (full_residuals, lin_dyn_fns,
                                        merit_function, merit_grad_blocks)


def _setup(bsz=3, T=5, seed=0):
    env = PendulumEnv()
    nx, nu = env.nx, env.nu
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(bsz, T, nx)))
    u = jnp.asarray(rng.normal(size=(bsz, T, nu)))
    x0 = jnp.asarray(rng.normal(size=(bsz, nx)))
    Q = jnp.asarray(rng.uniform(0.5, 2.0, size=(bsz, T, nx + nu)))
    q = jnp.asarray(rng.normal(size=(bsz, T, nx + nu)))
    lam = jnp.asarray(rng.normal(size=(bsz, T * nx + 2 * nu * T)))
    rho = jnp.full((bsz, 1), 3.0)
    u_lo = jnp.asarray(env.action_space.low)
    u_hi = jnp.asarray(env.action_space.high)
    return env, x, u, x0, Q, q, lam, rho, u_lo, u_hi


def test_merit_gradient_matches_autodiff():
    env, x, u, x0, Q, q, lam, rho, u_lo, u_hi = _setup()
    nx = env.nx
    xu = jnp.concatenate([x, u], axis=-1)

    def merit_sum(xu_):
        return jnp.sum(
            merit_function(env.dynamics, xu_, Q, q, x0, lam, rho, u_lo, u_hi)
        )

    g_auto = jax.grad(merit_sum)(xu)
    _, F = env.dynamics_derivatives(x[:, :-1], u[:, :-1])
    F = jnp.concatenate(F, axis=-1)
    from deqmpc_tpu.solvers.al_core import eq_residuals

    r_eq = eq_residuals(env.dynamics, x, u, x0)
    g, D, O, _, _ = merit_grad_blocks(
        xu, Q, q, x0, lam, rho, F, u_lo, u_hi, dyn_eq_res=r_eq
    )
    np.testing.assert_allclose(g, g_auto, rtol=1e-7, atol=1e-8)


def test_gn_hessian_matches_dense_jacobian():
    env, x, u, x0, Q, q, lam, rho, u_lo, u_hi = _setup(bsz=2, T=4)
    nx, nu = env.nx, env.nu
    n = nx + nu
    T = x.shape[1]
    xu = jnp.concatenate([x, u], axis=-1)

    def res_clamp_flat(xu_flat, x0_i):
        xu_ = xu_flat.reshape(T, n)
        x_, u_ = xu_[None, :, :nx], xu_[None, :, nx:]
        res, res_c = full_residuals(env.dynamics, x_, u_, x0_i[None], u_lo, u_hi)
        # clamped Jacobian: eq rows use raw res jac; ineq rows use
        # the active-set mask (res >= 0)
        neq = T * nx
        mask = jnp.concatenate(
            [jnp.ones(neq), (res[0, neq:] >= 0).astype(res.dtype)]
        )
        return res[0] * mask

    _, F = env.dynamics_derivatives(x[:, :-1], u[:, :-1])
    F = jnp.concatenate(F, axis=-1)
    from deqmpc_tpu.solvers.al_core import eq_residuals

    r_eq = eq_residuals(env.dynamics, x, u, x0)
    _, D, O, _, _ = merit_grad_blocks(
        xu, Q, q, x0, lam, rho, F, u_lo, u_hi, dyn_eq_res=r_eq
    )
    H_blocks = block_tridiag_dense(D, O)

    for b in range(2):
        J = jax.jacfwd(lambda z: res_clamp_flat(z, x0[b]))(xu[b].reshape(-1))
        H_dense = jnp.diag(Q[b].reshape(-1)) + rho[b, 0] * J.T @ J
        np.testing.assert_allclose(H_blocks[b], H_dense, rtol=1e-6, atol=1e-7)


def test_lq_problem_matches_dense_kkt():
    """Equality-constrained LQ: AL solution vs dense KKT solve."""
    rng = np.random.default_rng(42)
    bsz, T, nx, nu = 2, 4, 3, 2
    n = nx + nu
    A = jnp.asarray(0.5 * rng.normal(size=(bsz, T - 1, nx, nx)))
    B = jnp.asarray(0.5 * rng.normal(size=(bsz, T - 1, nx, nu)))
    F = jnp.concatenate([A, B], axis=-1)
    f = jnp.asarray(0.1 * rng.normal(size=(bsz, T - 1, nx)))
    lind = LinDx(F=F, f=f)
    dyn, dyn_jac = lin_dyn_fns(lind)
    Q = jnp.asarray(rng.uniform(0.5, 2.0, size=(bsz, T, n)))
    q = jnp.asarray(rng.normal(size=(bsz, T, n)))
    x0 = jnp.asarray(rng.normal(size=(bsz, nx)))
    cost = QuadCost(Q=Q, q=q, f=jnp.zeros((bsz, T)))

    mpc = ALMPC(nx, nu, T, u_lower=-1e6 * np.ones(nu), u_upper=1e6 * np.ones(nu),
                dyn=dyn, dyn_jac=dyn_jac, dtype=jnp.float64)
    state = mpc.init_state(bsz)
    x, u, status, _ = mpc.solve(x0, cost, state, al_iter=6)

    # dense KKT reference
    for b in range(bsz):
        nz = T * n
        neq = T * nx
        C = np.zeros((neq, nz))
        d = np.zeros(neq)
        for t in range(T - 1):
            C[t * nx : (t + 1) * nx, t * n : (t + 1) * n] = -np.asarray(F[b, t])
            C[t * nx : (t + 1) * nx, (t + 1) * n : (t + 1) * n + nx] = np.eye(nx)
            d[t * nx : (t + 1) * nx] = np.asarray(f[b, t])
        C[(T - 1) * nx :, :nx] = np.eye(nx)
        d[(T - 1) * nx :] = np.asarray(x0[b])
        K = np.block(
            [[np.diag(np.asarray(Q[b]).reshape(-1)), C.T], [C, np.zeros((neq, neq))]]
        )
        rhs = np.concatenate([-np.asarray(q[b]).reshape(-1), d])
        sol = np.linalg.solve(K, rhs)[:nz].reshape(T, n)
        got = np.concatenate([np.asarray(x[b]), np.asarray(u[b])], axis=-1)
        np.testing.assert_allclose(got, sol, rtol=1e-4, atol=1e-5)


def test_pendulum_al_solve_feasible():
    env = PendulumEnv()
    bsz, T = 8, 5
    nx, nu = env.nx, env.nu
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.uniform(-1, 1, size=(bsz, nx)))
    x_ref = jnp.tile(jnp.asarray([np.pi, 0.0]), (bsz, T, 1))
    Qd = jnp.tile(jnp.asarray(np.concatenate([env.Qlqr, env.Rlqr])), (bsz, T, 1))
    q = -Qd * jnp.concatenate([x_ref, jnp.zeros((bsz, T, nu))], axis=-1)
    cost = QuadCost(Q=Qd, q=q, f=jnp.zeros((bsz, T)))

    def dyn_jac(xx, uu):
        xn, (Jx, Ju) = env.dynamics_derivatives(xx, uu)
        return xn, jnp.concatenate([Jx, Ju], axis=-1)

    # torque-limited swing-up saturates the box constraints, so the AL
    # iterates converge only linearly; with a generous Newton budget the
    # defects reach the reference's feasibility scale (~1e-3,
    # `AL_mpc.py:190` dyn_res_crit=1e-4 in the easy regime)
    mpc = ALMPC(nx, nu, T, u_lower=env.action_space.low,
                u_upper=env.action_space.high,
                dyn=env.dynamics, dyn_jac=dyn_jac,
                max_newton_steps=12, dyn_res_tol=1e-6,
                dtype=jnp.float64)
    state = mpc.init_state(bsz)
    x, u, status, new_state = mpc.solve(x0, cost, state, al_iter=8)

    defects = x[:, 1:] - env.dynamics(x[:, :-1], u[:, :-1])
    assert float(jnp.abs(defects).max()) < 5e-3
    # initial condition pinned
    np.testing.assert_allclose(x[:, 0], x0, atol=5e-3)
    # control bounds respected up to AL feasibility tolerance
    assert float(jnp.max(u)) < env.max_torque + 5e-3
    assert float(jnp.min(u)) > -env.max_torque - 5e-3


@pytest.mark.slow
def test_implicit_gradients_match_fd():
    """dX*/dq via the custom_vjp vs central finite differences."""
    rng = np.random.default_rng(3)
    bsz, T, nx, nu = 1, 3, 2, 1
    n = nx + nu
    A = jnp.asarray(np.tile(np.eye(nx) * 0.9, (bsz, T - 1, 1, 1)))
    B = jnp.asarray(0.5 * rng.normal(size=(bsz, T - 1, nx, nu)))
    F = jnp.concatenate([A, B], axis=-1)
    f = jnp.zeros((bsz, T - 1, nx))
    dyn, dyn_jac = lin_dyn_fns(LinDx(F=F, f=f))
    Qd = jnp.asarray(rng.uniform(0.8, 1.5, size=(bsz, T, n)))
    q0 = jnp.asarray(rng.normal(size=(bsz, T, n)))
    x0 = jnp.asarray(rng.normal(size=(bsz, nx)))

    mpc = ALMPC(nx, nu, T, u_lower=-1e6 * np.ones(nu), u_upper=1e6 * np.ones(nu),
                dyn=dyn, dyn_jac=dyn_jac, dtype=jnp.float64)

    def solve_loss(q):
        cost = QuadCost(Q=Qd, q=q, f=jnp.zeros((bsz, T)))
        x, u, _, _ = mpc.solve(x0, cost, mpc.init_state(bsz), al_iter=8)
        return jnp.sum(x**2) + jnp.sum(u**2)

    g = jax.grad(solve_loss)(q0)
    # finite differences
    eps = 1e-5
    g_fd = np.zeros_like(np.asarray(q0))
    for idx in np.ndindex(*q0.shape):
        dq = jnp.zeros_like(q0).at[idx].set(eps)
        g_fd[idx] = (solve_loss(q0 + dq) - solve_loss(q0 - dq)) / (2 * eps)
    np.testing.assert_allclose(g, g_fd, rtol=2e-3, atol=2e-4)
