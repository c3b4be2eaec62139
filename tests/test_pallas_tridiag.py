"""Pallas block-tridiag kernel vs the XLA scan implementation
(interpret mode on CPU; the compiled path is exercised on TPU by
bench/profiling scripts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqmpc_tpu.ops.pallas_tridiag import pallas_block_tridiag_solve
from deqmpc_tpu.ops.tridiag import block_tridiag_solve


def _problem(bsz, T, n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(bsz, T, n, n))
    D = A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(n) * (T + 1)
    O = 0.3 * rng.normal(size=(bsz, max(T - 1, 0), n, n))
    b = rng.normal(size=(bsz, T, n))
    return (jnp.asarray(D, dtype), jnp.asarray(O, dtype), jnp.asarray(b, dtype))


@pytest.mark.parametrize("bsz,T,n", [(4, 5, 3), (130, 5, 3), (8, 5, 16), (16, 1, 4)])
def test_pallas_matches_xla(bsz, T, n):
    D, O, b = _problem(bsz, T, n, dtype=jnp.float64)
    x_ref = block_tridiag_solve(D, O, b)
    x_pl = pallas_block_tridiag_solve(D, O, b, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-9)


def test_pallas_f32_accuracy():
    D, O, b = _problem(64, 5, 8, dtype=jnp.float32)
    x_ref = block_tridiag_solve(D, O, b)
    x_pl = pallas_block_tridiag_solve(D, O, b, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)
