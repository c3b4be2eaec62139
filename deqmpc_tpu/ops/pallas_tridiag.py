"""Pallas TPU kernel: batched block-tridiagonal SPD solve.

The speed-of-light layout for the AL-Newton system (SURVEY.md §7):
the batch lives in the vector lanes (last dim, 128-wide), and the
small (n x n) block algebra — Cholesky, triangular solves, block
matmuls — runs as unrolled/masked vector ops over all lanes at once.
Each grid step processes one 128-sample tile; the T-recursion is
sequential per sample (tiny) and fully parallel across lanes.

Data layout inside the kernel (lanes-last):
    D: (T, n, n, B)   diagonal blocks
    O: (T-1, n, n, B) super-diagonal blocks
    b: (T, n, B)      right-hand side
The public wrapper `pallas_block_tridiag_solve` takes the framework's
(bsz, T, n, n) layout, transposes, pads the batch to a lane multiple,
and undoes both on the way out.

Correctness oracle: `deqmpc_tpu/ops/tridiag.py` (XLA scan version);
parity tested in interpret mode on CPU and compiled on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; interpret mode works without it
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

LANE = 128


# -- small-matrix algebra on (n, n, B) / (n, B) vector registers ------------

def _mm(A, B):
    """C[i,j,:] = sum_k A[i,k,:] * B[k,j,:]  (VPU mul-adds over lanes).

    Written as a k-loop of rank-1 outer accumulations: einsum/
    dot_general with a trailing batch dim crashes the Mosaic lowering,
    and a single broadcast-reduce materializes an (n,n,n,B) temp that
    blows VMEM."""
    n = A.shape[0]
    # pure slices (A[:, k:k+1]) — integer-index + newaxis lowers to an
    # unsupported >2D gather in Mosaic
    C = A[:, 0:1, :] * B[0:1, :, :]
    for k in range(1, n):
        C = C + A[:, k : k + 1, :] * B[k : k + 1, :, :]
    return C


def _chol(S):
    """Lower Cholesky of (n, n, B) SPD blocks: static column unroll,
    scatter-free (columns collected in a list and stacked — Mosaic has
    no scatter lowering)."""
    n = S.shape[0]
    cols = []
    row_idx = jnp.arange(n)[:, None]
    for j in range(n):
        d = jnp.sqrt(S[j, j])            # (B,)
        inv_d = 1.0 / d
        col = S[:, j] * inv_d            # (n, B)
        below = jnp.where(row_idx > j, col, 0.0)
        cols.append(below + jnp.where(row_idx == j, d[None, :], 0.0))
        # rank-1 downdate of the trailing submatrix
        S = S - below[:, None, :] * below[None, :, :]
    return jnp.stack(cols, axis=1)       # (n, n, B), column j at [:, j]


def _tri_solve_lower(L, B):
    """Solve L X = B for lower-triangular L: (n,n,B),(n,m,B)->(n,m,B).
    Row-sequential, scatter-free (rows stacked at the end)."""
    n = L.shape[0]
    rows = []
    for i in range(n):
        acc = B[i]
        for k in range(i):
            acc = acc - L[i, k][None, :] * rows[k]
        rows.append(acc / L[i, i][None, :])
    return jnp.stack(rows, axis=0)


def _tri_solve_lower_T(L, B):
    """Solve L' X = B (backward substitution), scatter-free."""
    n = L.shape[0]
    rows = [None] * n
    for i in reversed(range(n)):
        acc = B[i]
        for k in range(i + 1, n):
            acc = acc - L[k, i][None, :] * rows[k]
        rows[i] = acc / L[i, i][None, :]
    return jnp.stack(rows, axis=0)


def _solve_kernel(T: int, n: int, D_ref, O_ref, b_ref, x_ref):
    # load everything for this lane tile
    Ld = []
    M = []
    for t in range(T):
        S = D_ref[t]
        if t > 0:
            X = _tri_solve_lower(Ld[t - 1], O_ref[t - 1])  # Ld^{-1} O
            Mt = jnp.swapaxes(X, 0, 1)                     # O' Ld^{-T}
            S = S - _mm(Mt, jnp.swapaxes(Mt, 0, 1))
        else:
            Mt = jnp.zeros((n, n, S.shape[-1]), S.dtype)
        M.append(Mt)
        Ld.append(_chol(S))
    # forward sweep: y_t = Ld_t^{-1} (b_t - M_t y_{t-1})
    ys = []
    for t in range(T):
        rhs = b_ref[t][:, None, :]  # (n, 1, B)
        if t > 0:
            rhs = rhs - _mm(M[t], ys[t - 1])
        ys.append(_tri_solve_lower(Ld[t], rhs))
    # backward sweep: x_t = Ld_t^{-T} (y_t - M_{t+1}' x_{t+1})
    xs = [None] * T
    for t in reversed(range(T)):
        rhs = ys[t]
        if t < T - 1:
            rhs = rhs - _mm(jnp.swapaxes(M[t + 1], 0, 1), xs[t + 1])
        xs[t] = _tri_solve_lower_T(Ld[t], rhs)
    for t in range(T):
        x_ref[t] = xs[t][:, 0, :]


def _pallas_solve_lanes(D, O, b, interpret: bool = False):
    """D: (T, n, n, Bp), O: (T-1, n, n, Bp), b: (T, n, Bp); Bp % LANE == 0."""
    T, n, _, Bp = D.shape
    grid = (Bp // LANE,)

    # index maps return BLOCK indices (scaled by block_shape internally)
    def idx4(i):
        return (0, 0, 0, i)

    def idx3(i):
        return (0, 0, i)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        specs = dict(memory_space=pltpu.VMEM)
    else:
        specs = {}
    # O can be zero-length along axis 0 when T == 1; pad one block so the
    # BlockSpec shape stays positive (unused by the kernel).
    O_in = O if T > 1 else jnp.zeros((1, n, n, Bp), D.dtype)
    O_blk = max(T - 1, 1)
    return pl.pallas_call(
        functools.partial(_solve_kernel, T, n),
        out_shape=jax.ShapeDtypeStruct((T, n, Bp), D.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, n, n, LANE), idx4, **specs),
            pl.BlockSpec((O_blk, n, n, LANE), idx4, **specs),
            pl.BlockSpec((T, n, LANE), idx3, **specs),
        ],
        out_specs=pl.BlockSpec((T, n, LANE), idx3, **specs),
        interpret=interpret,
    )(D, O_in, b)


def pallas_block_tridiag_solve(D, O, b, interpret: bool = False):
    """Solve H x = b for the block-tridiagonal SPD H.

    Framework layout: D (bsz, T, n, n), O (bsz, T-1, n, n),
    b (bsz, T, n) -> x (bsz, T, n).
    """
    bsz, T, n, _ = D.shape
    Bp = ((bsz + LANE - 1) // LANE) * LANE
    pad = Bp - bsz

    def to_lanes(a, ndims):
        a = jnp.moveaxis(a, 0, -1)  # (..., bsz)
        if pad:
            a = jnp.pad(a, [(0, 0)] * (ndims - 1) + [(0, pad)],
                        constant_values=1.0 if ndims == 4 else 0.0)
        return a

    Dl = to_lanes(D, 4)
    if pad:
        # padded lanes need SPD diagonal blocks: overwrite with identity
        eye = jnp.eye(n, dtype=D.dtype)[..., None]
        lane_idx = jnp.arange(Bp) >= bsz
        Dl = jnp.where(lane_idx[None, None, None, :], eye[None], Dl)
    if T > 1:
        Ol = to_lanes(O, 4)
        if pad:
            Ol = jnp.where((jnp.arange(Bp) >= bsz)[None, None, None, :], 0.0, Ol)
    else:
        Ol = jnp.zeros((0, n, n, Bp), D.dtype)
    bl = to_lanes(b, 3)
    xl = _pallas_solve_lanes(Dl, Ol, bl, interpret=interpret)
    x = jnp.moveaxis(xl, -1, 0)
    return x[:bsz]
