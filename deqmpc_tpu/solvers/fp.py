"""Fixed-point accelerators for the DEQ layer: Anderson + Broyden.

Counterparts of the reference's `deqmpc/fp_solvers.py` (anderson
:219-303, broyden :46-124), rewritten as fixed-iteration
`lax.fori_loop` programs with masked best-iterate tracking — no
data-dependent Python control flow, so they fuse into the jitted
training step. Per-sample best iterates are tracked with `where`
masks exactly like the reference (`fp_solvers.py:283-287`); the
global `.all()` early exit becomes a no-op update mask (running the
remaining iterations on converged samples is cheaper on TPU than
divergent control flow).

The Anderson mixing system is solved with a fixed-size (m+1)x(m+1)
bordered system; slots not yet filled are masked to identity rows so
their mixing weights are exactly zero (replacing the reference's
dynamic `n = min(k, m)` slicing, which would force recompilation
per step under XLA).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class FPInfo(NamedTuple):
    best_err: Array    # (bsz,) best residual (stop_mode metric)
    best_step: Array   # (bsz,) iteration index of the best iterate
    final_err: Array   # (bsz,) last-iterate residual


def _solve_small_qr(H: Array, y: Array) -> Array:
    """Batched tiny general solve H x = y via unrolled MGS-QR.

    `jnp.linalg.solve` on a traced (bsz, n, n) lowers to a batched LU
    with serialized inner loops on TPU — the same ~100x trap as the
    batched small cholesky (CLAUDE.md perf notes); at the Anderson
    mixing size n = m+1 = 6 it dominated the whole network phase. An
    unrolled modified-Gram-Schmidt QR + back-substitution is ~40 fused
    elementwise (bsz, n) ops the VPU eats in one pass. The mixing
    system is always jitter-regularized, so the pivot-free QR is safe.
    H: (bsz, n, n), y: (bsz, n) -> (bsz, n).
    """
    n = H.shape[-1]
    cols = [H[..., j] for j in range(n)]
    qs: list = []
    R: list = [[None] * n for _ in range(n)]
    for j in range(n):
        v = cols[j]
        for i in range(j):
            r = jnp.sum(qs[i] * v, axis=-1, keepdims=True)
            R[i][j] = r
            v = v - r * qs[i]
        nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-30)
        R[j][j] = nrm
        qs.append(v / nrm)
    b = [jnp.sum(qs[i] * y, axis=-1, keepdims=True) for i in range(n)]
    x: list = [None] * n
    for j in range(n - 1, -1, -1):
        acc = b[j]
        for k in range(j + 1, n):
            acc = acc - R[j][k] * x[k]
        x[j] = acc / R[j][j]
    return jnp.concatenate(x, axis=-1)


def anderson(f, x0: Array, m: int = 5, lam: float = 1e-6, max_steps: int = 10,
             tol: float = 1e-2, stop_mode: str = "rel", beta: float = 0.8,
             acc_type: str = "good") -> Tuple[Array, FPInfo]:
    """Anderson acceleration of the fixed point z = f(z).

    x0: (bsz, ...) initial iterate; f maps (bsz, ...) -> (bsz, ...).
    Returns (best iterate, FPInfo).

    NOTE on `tol`: unlike the reference (`fp_solvers.py:261-265`, which
    breaks out of the Python loop once every sample is below tol), this
    implementation always runs exactly `max_steps` iterations — a
    data-dependent early exit would prevent a single compiled TPU
    program. `tol` is therefore accepted for signature parity but
    IGNORED; per-sample best-iterate tracking supplies the same result
    the reference's early exit would have returned. Callers porting
    reference code should size `max_steps`, not `tol`.
    """
    orig_shape = x0.shape
    bsz = orig_shape[0]
    z0 = x0.reshape(bsz, -1)
    N = z0.shape[1]
    dtype = z0.dtype

    def ff(z_flat):
        return f(z_flat.reshape(orig_shape)).reshape(bsz, -1)

    X = jnp.zeros((bsz, m, N), dtype)
    F = jnp.zeros((bsz, m, N), dtype)
    f0 = ff(z0)
    X = X.at[:, 0].set(z0)
    F = F.at[:, 0].set(f0)
    f1 = ff(f0)
    X = X.at[:, 1].set(f0)
    F = F.at[:, 1].set(f1)

    big = jnp.asarray(1e12, dtype)
    best_err = jnp.full((bsz,), big, dtype)
    best_step = jnp.ones((bsz,), jnp.int32)
    best_z = X[:, 1]

    ones_col = jnp.ones((m,), dtype)

    def body(k, carry):
        X, F, best_z, best_err, best_step, final_err = carry
        valid = (jnp.arange(m) < jnp.minimum(k, m)).astype(dtype)  # (m,)
        G = F - X
        if acc_type == "good":
            Hb = jnp.einsum("bin,bjn->bij", X, G)
        else:
            Hb = jnp.einsum("bin,bjn->bij", G, G)
        # bordered system [[0, 1_v'], [1_v, Hb_vv]] alpha_ext = e_0,
        # with invalid slots pinned to alpha_j = 0 via identity rows.
        # Regularization is scaled to the diagonal magnitude (the
        # reference only adds lam on solve failure, `fp_solvers.py:263-270`;
        # a tiny always-on relative jitter is the jit-compatible analog).
        vmask = valid[:, None] * valid[None, :]
        diag_scale = jnp.mean(
            jnp.abs(jnp.diagonal(Hb, axis1=-2, axis2=-1)), axis=-1
        )[:, None, None] + 1e-30
        Hb = Hb * vmask + lam * diag_scale * jnp.eye(m, dtype=dtype) * valid[:, None]
        Hb = Hb + jnp.eye(m, dtype=dtype) * (1.0 - valid)[:, None]
        Hfull = jnp.zeros((bsz, m + 1, m + 1), dtype)
        Hfull = Hfull.at[:, 0, 1:].set(valid)
        Hfull = Hfull.at[:, 1:, 0].set(valid)
        Hfull = Hfull.at[:, 1:, 1:].set(Hb)
        y = jnp.zeros((bsz, m + 1), dtype).at[:, 0].set(1.0)
        alpha = _solve_small_qr(Hfull, y)[:, 1:]  # (bsz, m)
        alpha = alpha * valid  # safety: exact zeros for unfilled slots

        x_new = beta * jnp.einsum("bm,bmn->bn", alpha, F) + (1 - beta) * jnp.einsum(
            "bm,bmn->bn", alpha, X
        )
        f_new = ff(x_new)
        slot = k % m
        X = X.at[:, slot].set(x_new)
        F = F.at[:, slot].set(f_new)

        gx = f_new - x_new
        abs_diff = jnp.linalg.norm(gx, axis=1)
        rel_diff = abs_diff / (1e-5 + jnp.linalg.norm(f_new, axis=1))
        err = rel_diff if stop_mode == "rel" else abs_diff
        improved = err < best_err
        best_z = jnp.where(improved[:, None], x_new, best_z)
        best_err = jnp.where(improved, err, best_err)
        best_step = jnp.where(improved, k, best_step)
        return X, F, best_z, best_err, best_step, err

    init = (X, F, best_z, best_err, best_step, jnp.full((bsz,), big, dtype))
    X, F, best_z, best_err, best_step, final_err = lax.fori_loop(
        2, max_steps, body, init
    )
    info = FPInfo(best_err=best_err, best_step=best_step, final_err=final_err)
    return best_z.reshape(orig_shape), info


def anderson_jiio(f, x0: Array, m: int = 5, lam: float = 1e-6,
                  max_steps: int = 50, tol: float = 1e-5,
                  stop_mode: str = "rel", beta: float = 0.8,
                  warmup: int = 10) -> Tuple[Array, FPInfo]:
    """JIIO-flavored Anderson (`fp_solvers.py:126-217`): f returns
    (next_iterate, cost); the best-iterate acceptance trades off the
    fixed-point residual against the cost — accept when the residual
    improves, when still in warmup, or when the cost improves and the
    residual is within 1.3x of the best.

    `tol` is accepted for signature parity but IGNORED (fixed-iteration
    jit; see `anderson`)."""
    orig_shape = x0.shape
    bsz = orig_shape[0]
    z0 = x0.reshape(bsz, -1)
    dtype = z0.dtype

    costs = {}

    def ff(z_flat, k):
        out, cost = f(z_flat.reshape(orig_shape), k)
        return out.reshape(bsz, -1), cost

    # reuse the plain Anderson mixing by tracking cost alongside
    N = z0.shape[1]
    X = jnp.zeros((bsz, m, N), dtype)
    F = jnp.zeros((bsz, m, N), dtype)
    f0, c0 = ff(z0, 0)
    X = X.at[:, 0].set(z0)
    F = F.at[:, 0].set(f0)
    f1, c1 = ff(f0, 1)
    X = X.at[:, 1].set(f0)
    F = F.at[:, 1].set(f1)
    big = jnp.asarray(1e12, dtype)
    best_err = jnp.full((bsz,), big, dtype)
    best_cost = c1
    best_z = X[:, 1]
    best_step = jnp.ones((bsz,), jnp.int32)

    def body(k, carry):
        X, F, best_z, best_err, best_cost, best_step, final_err = carry
        valid = (jnp.arange(m) < jnp.minimum(k, m)).astype(dtype)
        G = F - X
        Hb = jnp.einsum("bin,bjn->bij", X, G)
        vmask = valid[:, None] * valid[None, :]
        diag_scale = jnp.mean(
            jnp.abs(jnp.diagonal(Hb, axis1=-2, axis2=-1)), axis=-1
        )[:, None, None] + 1e-30
        Hb = Hb * vmask + lam * diag_scale * jnp.eye(m, dtype=dtype) * valid[:, None]
        Hb = Hb + jnp.eye(m, dtype=dtype) * (1.0 - valid)[:, None]
        Hfull = jnp.zeros((bsz, m + 1, m + 1), dtype)
        Hfull = Hfull.at[:, 0, 1:].set(valid)
        Hfull = Hfull.at[:, 1:, 0].set(valid)
        Hfull = Hfull.at[:, 1:, 1:].set(Hb)
        y = jnp.zeros((bsz, m + 1), dtype).at[:, 0].set(1.0)
        alpha = _solve_small_qr(Hfull, y)[:, 1:] * valid
        x_new = beta * jnp.einsum("bm,bmn->bn", alpha, F) + (1 - beta) * jnp.einsum(
            "bm,bmn->bn", alpha, X
        )
        f_new, cost = ff(x_new, k)
        slot = k % m
        X = X.at[:, slot].set(x_new)
        F = F.at[:, slot].set(f_new)
        gx = f_new - x_new
        abs_diff = jnp.linalg.norm(gx, axis=1)
        err = abs_diff / (1e-5 + jnp.linalg.norm(f_new, axis=1)) \
            if stop_mode == "rel" else abs_diff
        improved_res = err < best_err
        accept = jnp.logical_or(
            jnp.logical_or(improved_res, k < warmup),
            jnp.logical_and(cost < best_cost, err < 1.3 * best_err),
        )
        best_z = jnp.where(accept[:, None], x_new, best_z)
        best_cost = jnp.where(accept, cost, best_cost)
        best_step = jnp.where(accept, k, best_step)
        best_err = jnp.where(improved_res, err, best_err)
        return X, F, best_z, best_err, best_cost, best_step, err

    init = (X, F, best_z, best_err, best_cost, best_step,
            jnp.full((bsz,), big, dtype))
    out = lax.fori_loop(2, max_steps, body, init)
    _, _, best_z, best_err, _, best_step, final_err = out
    info = FPInfo(best_err=best_err, best_step=best_step, final_err=final_err)
    return best_z.reshape(orig_shape), info


def broyden(f, x0: Array, max_steps: int = 20, tol: float = 1e-5,
            stop_mode: str = "abs") -> Tuple[Array, FPInfo]:
    """'Good Broyden' root-finder for g(z) = f(z) - z with a low-rank
    Sherman-Morrison inverse-Jacobian estimate (reference
    `fp_solvers.py:46-124`, einsum matvecs :16-43), fixed-iteration
    with masked best-iterate tracking.

    `tol` is accepted for signature parity but IGNORED (fixed-iteration
    jit; see `anderson`)."""
    orig_shape = x0.shape
    bsz = orig_shape[0]
    z0 = x0.reshape(bsz, -1)
    N = z0.shape[1]
    dtype = z0.dtype
    L = max_steps  # low-rank memory

    def gg(z_flat):
        return f(z_flat.reshape(orig_shape)).reshape(bsz, -1) - z_flat

    def matvec(Us, VTs, x, nstep):
        """(-I + U V') x with only the first `nstep` rank-1 terms."""
        mask = (jnp.arange(L) < nstep).astype(dtype)
        VTx = jnp.einsum("bdn,bn->bd", VTs, x) * mask
        return -x + jnp.einsum("bnd,bd->bn", Us, VTx)

    gx0 = gg(z0)
    Us = jnp.zeros((bsz, N, L), dtype)
    VTs = jnp.zeros((bsz, L, N), dtype)
    best_err = jnp.linalg.norm(gx0, axis=1)
    best_z = z0
    best_step = jnp.zeros((bsz,), jnp.int32)

    def body(k, carry):
        z, gx, Us, VTs, best_z, best_err, best_step, final_err = carry
        update = -matvec(jnp.moveaxis(Us, 1, 1), VTs, gx, k)
        z_new = z + update
        gx_new = gg(z_new)
        delta_z = z_new - z
        delta_g = gx_new - gx
        # good Broyden: v = delta_g, u = (delta_z - (-I+UV')delta_g)/(v'delta_g)
        denom = jnp.einsum("bn,bn->b", delta_g, delta_g)[:, None]
        u = (delta_z - matvec(Us, VTs, delta_g, k)) / jnp.where(
            jnp.abs(denom) < 1e-30, 1.0, denom
        )
        u = jnp.nan_to_num(u)
        slot = k % L
        Us = Us.at[:, :, slot].set(u)
        VTs = VTs.at[:, slot].set(jnp.nan_to_num(delta_g))
        err = jnp.linalg.norm(gx_new, axis=1)
        if stop_mode == "rel":
            err = err / (1e-5 + jnp.linalg.norm(z_new, axis=1))
        improved = err < best_err
        best_z = jnp.where(improved[:, None], z_new, best_z)
        best_err = jnp.where(improved, err, best_err)
        best_step = jnp.where(improved, k + 1, best_step)
        return z_new, gx_new, Us, VTs, best_z, best_err, best_step, err

    init = (z0, gx0, Us, VTs, best_z, best_err, best_step, best_err)
    out = lax.fori_loop(0, max_steps, body, init)
    _, _, _, _, best_z, best_err, best_step, final_err = out
    info = FPInfo(best_err=best_err, best_step=best_step, final_err=final_err)
    return best_z.reshape(orig_shape), info
