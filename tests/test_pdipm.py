"""PDIPM QP solver tests: vs scipy SLSQP oracle, vs the AL solver on
the same MPC problem, and implicit-gradient finite-difference checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from deqmpc_tpu.solvers import LinDx, QuadCost
from deqmpc_tpu.solvers.al_core import lin_dyn_fns
from deqmpc_tpu.solvers.ip_mpc import IPMPC
from deqmpc_tpu.solvers.pdipm import qp_layer, qp_solve


def _random_qp(rng, nz=6, ni=4, ne=2, bsz=3):
    L = rng.normal(size=(bsz, nz, nz))
    Q = L @ np.swapaxes(L, -1, -2) + np.eye(nz) * nz
    p = rng.normal(size=(bsz, nz))
    G = rng.normal(size=(bsz, ni, nz))
    h = rng.normal(size=(bsz, ni)) + 1.0
    A = rng.normal(size=(bsz, ne, nz))
    b = rng.normal(size=(bsz, ne)) * 0.3
    return tuple(jnp.asarray(v) for v in (Q, p, G, h, A, b))


def _scipy_qp(Q, p, G, h, A, b):
    nz = len(p)

    def f(z):
        return 0.5 * z @ Q @ z + p @ z

    cons = [
        {"type": "ineq", "fun": lambda z: h - G @ z},
        {"type": "eq", "fun": lambda z: A @ z - b},
    ]
    r = minimize(f, np.zeros(nz), jac=lambda z: Q @ z + p,
                 constraints=cons, method="SLSQP",
                 options={"maxiter": 200, "ftol": 1e-12})
    return r.x


def test_qp_matches_scipy():
    rng = np.random.default_rng(0)
    Q, p, G, h, A, b = _random_qp(rng)
    sol = qp_solve(Q, p, G, h, A, b, iters=25)
    for i in range(p.shape[0]):
        z_ref = _scipy_qp(*[np.asarray(v[i]) for v in (Q, p, G, h, A, b)])
        np.testing.assert_allclose(np.asarray(sol.z[i]), z_ref,
                                   rtol=1e-5, atol=1e-6)


def test_qp_gradients_match_fd():
    rng = np.random.default_rng(1)
    Q, p, G, h, A, b = _random_qp(rng, nz=4, ni=3, ne=1, bsz=1)

    def loss(p_):
        z = qp_layer(Q, p_, G, h, A, b, 25)
        return jnp.sum(z**2)

    g = jax.grad(loss)(p)
    eps = 1e-5
    g_fd = np.zeros_like(np.asarray(p))
    for idx in np.ndindex(*p.shape):
        dp = jnp.zeros_like(p).at[idx].set(eps)
        g_fd[idx] = (loss(p + dp) - loss(p - dp)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=2e-3, atol=1e-4)


def test_ip_mpc_matches_al_on_lq():
    """On an equality+inactive-box LQ problem, IP and AL must agree."""
    rng = np.random.default_rng(42)
    bsz, T, nx, nu = 2, 4, 3, 2
    n = nx + nu
    A_ = jnp.asarray(0.5 * rng.normal(size=(bsz, T - 1, nx, nx)))
    B_ = jnp.asarray(0.5 * rng.normal(size=(bsz, T - 1, nx, nu)))
    F = jnp.concatenate([A_, B_], axis=-1)
    f = jnp.asarray(0.1 * rng.normal(size=(bsz, T - 1, nx)))
    lindx = LinDx(F=F, f=f)
    dyn, dyn_jac = lin_dyn_fns(lindx)
    Qd = jnp.asarray(rng.uniform(0.5, 2.0, size=(bsz, T, n)))
    q = jnp.asarray(rng.normal(size=(bsz, T, n)))
    x0 = jnp.asarray(rng.normal(size=(bsz, nx)))
    cost = QuadCost(Q=Qd, q=q, f=jnp.zeros((bsz, T)))

    ip = IPMPC(nx, nu, T, u_lower=-1e3 * np.ones(nu), u_upper=1e3 * np.ones(nu),
               dyn=dyn, dyn_jac=dyn_jac, lindx=lindx, qp_iter=1, ipm_iters=30,
               dtype=jnp.float64)
    x_ip, u_ip = ip.solve(x0, cost)

    from deqmpc_tpu.solvers import ALMPC

    al = ALMPC(nx, nu, T, u_lower=-1e3 * np.ones(nu), u_upper=1e3 * np.ones(nu),
               dyn=dyn, dyn_jac=dyn_jac, dtype=jnp.float64)
    x_al, u_al, _, _ = al.solve(x0, cost, al.init_state(bsz), al_iter=8)

    np.testing.assert_allclose(np.asarray(x_ip), np.asarray(x_al),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_ip), np.asarray(u_al),
                               rtol=1e-4, atol=1e-5)


def test_ip_mpc_respects_box():
    rng = np.random.default_rng(3)
    bsz, T, nx, nu = 4, 4, 2, 1
    from deqmpc_tpu.envs import PendulumEnv

    env = PendulumEnv()

    def dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], -1)

    x0 = jnp.asarray(rng.uniform(-1, 1, (bsz, nx)))
    x_ref = jnp.tile(jnp.asarray([np.pi, 0.0]), (bsz, T, 1))
    Qd = jnp.tile(jnp.asarray(np.concatenate([env.Qlqr, env.Rlqr])), (bsz, T, 1))
    q = -Qd * jnp.concatenate([x_ref, jnp.zeros((bsz, T, nu))], -1)
    cost = QuadCost(Q=Qd, q=q, f=jnp.zeros((bsz, T)))
    ip = IPMPC(nx, nu, T, u_lower=env.action_space.low,
               u_upper=env.action_space.high,
               dyn=env.dynamics, dyn_jac=dyn_jac, qp_iter=3, ipm_iters=25,
               dtype=jnp.float64)
    x, u = ip.solve(x0, cost)
    assert float(jnp.max(u)) <= env.max_torque + 1e-5
    assert float(jnp.min(u)) >= -env.max_torque - 1e-5
    assert bool(jnp.all(jnp.isfinite(x)))


def test_sl1qp_elastic_mode():
    """Elastic mode recovers the same solution on a feasible problem and
    stays solvable on an infeasible linearization."""
    rng = np.random.default_rng(5)
    bsz, T, nx, nu = 2, 3, 2, 1
    from deqmpc_tpu.envs import PendulumEnv

    env = PendulumEnv()

    def dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], -1)

    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (bsz, nx)))
    x_ref = jnp.tile(jnp.asarray([np.pi, 0.0]), (bsz, T, 1))
    Qd = jnp.tile(jnp.asarray(np.concatenate([env.Qlqr, env.Rlqr])), (bsz, T, 1))
    q = -Qd * jnp.concatenate([x_ref, jnp.zeros((bsz, T, nu))], -1)
    cost = QuadCost(Q=Qd, q=q, f=jnp.zeros((bsz, T)))
    kw = dict(u_lower=env.action_space.low, u_upper=env.action_space.high,
              dyn=env.dynamics, dyn_jac=dyn_jac, qp_iter=1, ipm_iters=30,
              dtype=jnp.float64)
    ip = IPMPC(nx, nu, T, **kw)
    ip_el = IPMPC(nx, nu, T, elastic=True, elastic_mu=1e4, **kw)
    x_a, u_a = ip.solve(x0, cost)
    x_b, u_b = ip_el.solve(x0, cost)
    # with a large penalty the elastic solution matches the exact one
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_a),
                               rtol=1e-3, atol=1e-3)
    assert bool(jnp.all(jnp.isfinite(u_b)))


def test_qp_prefactored_matches_dense():
    """The Schur-complement (pre-factored) path produces the same
    solution as the dense-KKT path (`pdipm/batch.py` vs `batch_LU.py`)."""
    rng = np.random.default_rng(7)
    Q, p, G, h, A, b = _random_qp(rng)
    dense = qp_solve(Q, p, G, h, A, b)
    pref = qp_solve(Q, p, G, h, A, b, prefactor=True)
    np.testing.assert_allclose(np.asarray(pref.z), np.asarray(dense.z),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pref.lam), np.asarray(dense.lam),
                               rtol=1e-3, atol=1e-4)
    # no-equality case
    A0 = jnp.zeros((Q.shape[0], 0, Q.shape[1]))
    b0 = jnp.zeros((Q.shape[0], 0))
    dense0 = qp_solve(Q, p, G, h, A0, b0)
    pref0 = qp_solve(Q, p, G, h, A0, b0, prefactor=True)
    np.testing.assert_allclose(np.asarray(pref0.z), np.asarray(dense0.z),
                               rtol=1e-4, atol=1e-5)


def test_qp_single_instance():
    """Unbatched wrapper (`pdipm/single.py` parity)."""
    from deqmpc_tpu.solvers.pdipm import qp_solve_single
    rng = np.random.default_rng(3)
    Q, p, G, h, A, b = _random_qp(rng, bsz=1)
    sol = qp_solve_single(Q[0], p[0], G[0], h[0], A[0], b[0])
    zs = _scipy_qp(*(np.asarray(v[0], np.float64) for v in (Q, p, G, h, A, b)))
    np.testing.assert_allclose(np.asarray(sol.z), zs, rtol=1e-3, atol=1e-4)
    sol_nf = qp_solve_single(Q[0], p[0], G[0], h[0])
    assert sol_nf.z.shape == (Q.shape[1],)
    assert bool(jnp.all(jnp.isfinite(sol_nf.z)))


def test_ip_grad_methods_agree():
    """GradMethods parity (`qp_wrapper.py:27-31,466-581`): the autodiff
    and finite-difference linearizations must reproduce the analytic
    SQP solution."""
    rng = np.random.default_rng(7)
    bsz, T = 3, 4
    from deqmpc_tpu.envs import PendulumEnv

    env = PendulumEnv()
    nx, nu = env.nx, env.nu

    def dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], -1)

    x0 = jnp.asarray(rng.uniform(-1, 1, (bsz, nx)))
    x_ref = jnp.tile(jnp.asarray([np.pi, 0.0]), (bsz, T, 1))
    Qd = jnp.tile(jnp.asarray(np.concatenate([env.Qlqr, env.Rlqr])), (bsz, T, 1))
    q = -Qd * jnp.concatenate([x_ref, jnp.zeros((bsz, T, nu))], -1)
    cost = QuadCost(Q=Qd, q=q, f=jnp.zeros((bsz, T)))
    kw = dict(u_lower=env.action_space.low, u_upper=env.action_space.high,
              dyn=env.dynamics, qp_iter=3, ipm_iters=25, dtype=jnp.float64)
    x_an, u_an = IPMPC(nx, nu, T, dyn_jac=dyn_jac,
                       grad_method="analytic", **kw).solve(x0, cost)
    x_ad, u_ad = IPMPC(nx, nu, T, grad_method="autodiff", **kw).solve(x0, cost)
    x_fd, u_fd = IPMPC(nx, nu, T, grad_method="finite_diff", **kw).solve(x0, cost)
    np.testing.assert_allclose(np.asarray(u_ad), np.asarray(u_an),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(u_fd), np.asarray(u_an),
                               rtol=1e-3, atol=1e-5)


def test_ip_eps_freezes_converged_samples():
    """--eps wiring (`qp_wrapper.py:173,377`): with a huge eps every
    sample freezes after the first SQP iteration, so qp_iter=4 must
    agree with qp_iter=1 up to the always-run final differentiable QP;
    with eps=0 extra iterations refine the solution."""
    rng = np.random.default_rng(11)
    bsz, T = 3, 4
    from deqmpc_tpu.envs import PendulumEnv

    env = PendulumEnv()
    nx, nu = env.nx, env.nu

    def dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], -1)

    x0 = jnp.asarray(rng.uniform(-1, 1, (bsz, nx)))
    x_ref = jnp.tile(jnp.asarray([np.pi, 0.0]), (bsz, T, 1))
    Qd = jnp.tile(jnp.asarray(np.concatenate([env.Qlqr, env.Rlqr])), (bsz, T, 1))
    q = -Qd * jnp.concatenate([x_ref, jnp.zeros((bsz, T, nu))], -1)
    cost = QuadCost(Q=Qd, q=q, f=jnp.zeros((bsz, T)))
    kw = dict(u_lower=env.action_space.low, u_upper=env.action_space.high,
              dyn=env.dynamics, dyn_jac=dyn_jac, ipm_iters=25,
              dtype=jnp.float64)
    # frozen after iter 1 -> iterate entering the final QP equals the
    # qp_iter=2 state entering ITS final QP
    x_a, u_a = IPMPC(nx, nu, T, qp_iter=4, eps=1e9, **kw).solve(x0, cost)
    x_b, u_b = IPMPC(nx, nu, T, qp_iter=2, eps=1e9, **kw).solve(x0, cost)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b),
                               rtol=1e-9, atol=1e-11)
    # eps=0 never freezes: more iterations shrink the dynamics defect
    x_c, u_c = IPMPC(nx, nu, T, qp_iter=4, eps=0.0, **kw).solve(x0, cost)
    def defect(x, u):
        return float(jnp.max(jnp.abs(x[:, 1:] - env.dynamics(x[:, :-1], u[:, :-1]))))
    assert defect(x_c, u_c) <= defect(x_b, u_b) + 1e-8
