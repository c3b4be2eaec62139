"""Anderson/Broyden fixed-point solver tests on a contraction map."""
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.solvers.fp import anderson, broyden


def _contraction(seed=0, bsz=4, n=16, rate=0.6):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(n, n))
    W = rate * W / np.linalg.norm(W, 2)  # spectral norm => contraction rate
    b = rng.normal(size=(bsz, n))
    Wj, bj = jnp.asarray(W), jnp.asarray(b)

    def f(z):
        return jnp.tanh(z @ Wj.T + bj)

    # fixed point by plain iteration
    z = jnp.zeros((bsz, n))
    for _ in range(200):
        z = f(z)
    return f, z


def test_anderson_converges():
    f, z_star = _contraction()
    z0 = jnp.zeros_like(z_star)
    z, info = anderson(f, z0, m=5, max_steps=25, tol=1e-9)
    # the lam-regularized mixing solve limits final accuracy to ~1e-5
    # (same as the reference's lam=1e-4, `fp_solvers.py:219`)
    np.testing.assert_allclose(z, z_star, atol=1e-4)
    assert float(info.best_err.max()) < 1e-3


def test_anderson_beats_plain_iteration():
    # slow *linear* contraction: plain iteration converges at rate
    # 0.95 per step, Anderson (Krylov-like mixing) accelerates hard
    rng = np.random.default_rng(1)
    n, bsz = 16, 4
    W = rng.normal(size=(n, n))
    W = W + W.T  # symmetric => spectral radius == 2-norm
    W = 0.95 * W / np.linalg.norm(W, 2)
    b = rng.normal(size=(bsz, n))
    Wj, bj = jnp.asarray(W), jnp.asarray(b)

    def f(z):
        return z @ Wj.T + bj

    z_star = jnp.asarray(np.linalg.solve(np.eye(n) - W, b.T).T)
    z0 = jnp.zeros((bsz, n))
    z_and, _ = anderson(f, z0, m=5, max_steps=12)
    z_plain = z0
    for _ in range(12):
        z_plain = f(z_plain)
    err_and = float(jnp.abs(z_and - z_star).max())
    err_plain = float(jnp.abs(z_plain - z_star).max())
    assert err_and < 0.1 * err_plain


def test_broyden_converges():
    f, z_star = _contraction(seed=2)
    z0 = jnp.zeros_like(z_star)
    z, info = broyden(f, z0, max_steps=30)
    np.testing.assert_allclose(z, z_star, atol=1e-5)


def test_anderson_jits_and_multidim():
    f0, z_star = _contraction(seed=3, bsz=2, n=12)

    def f3(z):  # operate on (bsz, 3, 4) shaped iterates
        return f0(z.reshape(2, -1)).reshape(2, 3, 4)

    run = jax.jit(lambda z0: anderson(f3, z0, m=5, max_steps=25)[0])
    z = run(jnp.zeros((2, 3, 4)))
    np.testing.assert_allclose(z.reshape(2, -1), z_star, atol=1e-5)


def test_anderson_jiio():
    from deqmpc_tpu.solvers.fp import anderson_jiio

    f0, z_star = _contraction(seed=4)

    def f_cost(z, k):
        out = f0(z)
        cost = jnp.sum((out - z) ** 2, axis=-1)
        return out, cost

    z, info = anderson_jiio(f_cost, jnp.zeros_like(z_star), max_steps=25)
    np.testing.assert_allclose(z, z_star, atol=1e-3)
