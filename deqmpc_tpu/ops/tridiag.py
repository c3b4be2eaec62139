"""Batched block-tridiagonal SPD factor / solve (Riccati-structured).

The AL-Newton system H dx = -g has H = diag(Q) + rho * J'J with J the
block-banded constraint Jacobian (one [A_t B_t] block per step plus
identity shifts — reference `qpth/al_utils.py:233-284`), so H is
block-tridiagonal with (nx+nu)-sized blocks. The reference factorizes
the *dense* (T*n)^2 matrix with `cholesky_ex`
(`qpth/al_utils.py:510-513`): O(T^3 n^3) work and O(T^2 n^2) memory
per sample. Here we exploit the structure: block Cholesky along the
horizon — O(T n^3) work, O(T n^2) memory — sequential over T (tiny),
fully parallel over the batch. This is the XLA `lax.scan`
implementation; `deqmpc_tpu/ops/pallas_tridiag.py` provides the Pallas
TPU kernel with the batch laid out in vector lanes.

Layout:
  D: (bsz, T, n, n)   diagonal blocks (symmetric)
  O: (bsz, T-1, n, n) super-diagonal blocks, H[t, t+1] = O[t]
  b: (bsz, T, n)      right-hand side

Factorization (lower block bidiagonal L with diagonal Cholesky blocks
Ld[t] and sub-diagonal blocks M[t] = O[t-1]' Ld[t-1]^{-T}):
  Ld[0] Ld[0]' = D[0]
  M[t]         = O[t-1]' Ld[t-1]^{-T}
  Ld[t] Ld[t]' = D[t] - M[t] M[t]'
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class BTFactor(NamedTuple):
    Ld: Array  # (bsz, T, n, n) lower-triangular Cholesky blocks
    M: Array   # (bsz, T, n, n); M[0] unused (zeros)


def _tri_solve(L, B, *, trans=False):
    """Solve L X = B (or L' X = B) for lower-triangular L, batched."""
    return lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True, transpose_a=trans
    )


def block_tridiag_factor(D: Array, O: Array, jitter: float = 0.0) -> BTFactor:
    """Block Cholesky of an SPD block-tridiagonal matrix via lax.scan."""
    bsz, T, n, _ = D.shape
    eye = jnp.eye(n, dtype=D.dtype)
    if jitter:
        D = D + jitter * eye

    # pad O so the scan has T-1 off-diagonal inputs aligned with steps 1..T-1
    O_shift = jnp.concatenate(
        [jnp.zeros((bsz, 1, n, n), D.dtype), O], axis=1
    )  # (bsz, T, n, n)

    def step(Ld_prev, inputs):
        D_t, O_prev, first = inputs
        # M_t = O_{t-1}' Ld_{t-1}^{-T}  => solve Ld_{t-1} X = O_{t-1}, M = X'
        X = _tri_solve(Ld_prev, O_prev)
        M_t = jnp.where(first, jnp.zeros_like(X), X.mT)
        S = D_t - M_t @ M_t.mT
        Ld_t = lax.linalg.cholesky(S)
        return Ld_t, (Ld_t, M_t)

    D_t = jnp.moveaxis(D, 1, 0)          # (T, bsz, n, n)
    O_t = jnp.moveaxis(O_shift, 1, 0)
    firsts = jnp.arange(T) == 0
    init = jnp.broadcast_to(eye, (bsz, n, n))
    _, (Ld, M) = lax.scan(step, init, (D_t, O_t, firsts))
    return BTFactor(Ld=jnp.moveaxis(Ld, 0, 1), M=jnp.moveaxis(M, 0, 1))


def block_tridiag_solve_factored(fac: BTFactor, b: Array) -> Array:
    """Solve H x = b given the factorization. b: (bsz, T, n)."""
    Ld_t = jnp.moveaxis(fac.Ld, 1, 0)  # (T, bsz, n, n)
    M_t = jnp.moveaxis(fac.M, 1, 0)
    b_t = jnp.moveaxis(b, 1, 0)[..., None]  # (T, bsz, n, 1)

    # forward: y_t = Ld_t^{-1} (b_t - M_t y_{t-1})
    def fwd(y_prev, inputs):
        Ld, M, bb = inputs
        y = _tri_solve(Ld, bb - M @ y_prev)
        return y, y

    y0 = jnp.zeros_like(b_t[0])
    _, ys = lax.scan(fwd, y0, (Ld_t, M_t, b_t))

    # backward: x_t = Ld_t^{-T} (y_t - M_{t+1}' x_{t+1}), scanned in reverse
    M_next = jnp.concatenate([M_t[1:], jnp.zeros_like(M_t[:1])], axis=0)

    def bwd(x_next, inputs):
        Ld, Mn, yy = inputs
        x = _tri_solve(Ld, yy - Mn.mT @ x_next, trans=True)
        return x, x

    x0 = jnp.zeros_like(b_t[0])
    _, xs = lax.scan(bwd, x0, (Ld_t, M_next, ys), reverse=True)
    return jnp.moveaxis(xs[..., 0], 0, 1)


def block_tridiag_solve(D: Array, O: Array, b: Array, jitter: float = 0.0) -> Array:
    return block_tridiag_solve_factored(block_tridiag_factor(D, O, jitter), b)


def block_tridiag_matvec(D: Array, O: Array, v: Array) -> Array:
    """H v for testing: v (bsz, T, n)."""
    out = jnp.einsum("btij,btj->bti", D, v)
    upper = jnp.einsum("btij,btj->bti", O, v[:, 1:])
    lower = jnp.einsum("btji,btj->bti", O, v[:, :-1])
    out = out.at[:, :-1].add(upper)
    out = out.at[:, 1:].add(lower)
    return out


def block_tridiag_dense(D: Array, O: Array) -> Array:
    """Materialize dense H (tests / fallback). (bsz, T*n, T*n)."""
    bsz, T, n, _ = D.shape
    H = jnp.zeros((bsz, T * n, T * n), D.dtype)
    for t in range(T):
        H = H.at[:, t * n : (t + 1) * n, t * n : (t + 1) * n].set(D[:, t])
        if t < T - 1:
            H = H.at[:, t * n : (t + 1) * n, (t + 1) * n : (t + 2) * n].set(O[:, t])
            H = H.at[:, (t + 1) * n : (t + 2) * n, t * n : (t + 1) * n].set(O[:, t].mT)
    return H
