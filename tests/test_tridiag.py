"""Block-tridiagonal factor/solve vs dense reference."""
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.ops.tridiag import (block_tridiag_dense, block_tridiag_matvec,
                                    block_tridiag_solve)


def _random_spd_block_tridiag(rng, bsz, T, n):
    A = rng.normal(size=(bsz, T, n, n))
    D = A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(n) * (T + 1)
    O = 0.3 * rng.normal(size=(bsz, T - 1, n, n))
    return jnp.asarray(D), jnp.asarray(O)


def test_solve_matches_dense():
    rng = np.random.default_rng(0)
    bsz, T, n = 3, 5, 4
    D, O = _random_spd_block_tridiag(rng, bsz, T, n)
    b = jnp.asarray(rng.normal(size=(bsz, T, n)))
    x = block_tridiag_solve(D, O, b)
    H = block_tridiag_dense(D, O)
    x_dense = jnp.linalg.solve(H, b.reshape(bsz, -1, 1))[..., 0].reshape(bsz, T, n)
    np.testing.assert_allclose(x, x_dense, rtol=1e-8, atol=1e-9)


def test_matvec_roundtrip():
    rng = np.random.default_rng(1)
    bsz, T, n = 2, 7, 3
    D, O = _random_spd_block_tridiag(rng, bsz, T, n)
    v = jnp.asarray(rng.normal(size=(bsz, T, n)))
    b = block_tridiag_matvec(D, O, v)
    v2 = block_tridiag_solve(D, O, b)
    np.testing.assert_allclose(v, v2, rtol=1e-8, atol=1e-9)


def test_single_block():
    rng = np.random.default_rng(2)
    D, O = _random_spd_block_tridiag(rng, 2, 1, 4)
    b = jnp.asarray(rng.normal(size=(2, 1, 4)))
    x = block_tridiag_solve(D, jnp.zeros((2, 0, 4, 4)), b)
    x_ref = jnp.linalg.solve(D[:, 0], b[:, 0][..., None])[..., 0]
    np.testing.assert_allclose(x[:, 0], x_ref, rtol=1e-8, atol=1e-9)
