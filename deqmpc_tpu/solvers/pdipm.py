"""Batched primal-dual interior-point QP solver + differentiable layer.

Counterpart of the reference's OptNet-style stack
(`qpth/qp.py` QPFunction/DenseQPFunction, `qpth/solvers/pdipm/
batch.py` Mehrotra predictor-corrector :46-208, `batch_LU.py` dense
KKT). Solves, batched over samples:

    min_z 0.5 z'Qz + p'z   s.t.  Gz <= h,  Az = b

Redesign notes (TPU-first):
  * fixed iteration count with per-sample best-iterate tracking
    (mirroring `batch.py:119-144`) instead of `.item()` breaks;
  * one symmetrized KKT factorization per iteration, solved for both
    the affine and centering-corrector steps (Mehrotra);
  * backward is generic implicit differentiation through the KKT
    residual map: solve (dF/dsol)' w = cotangent and pull back with
    jax.vjp — covers dQ, dp, dG, dh, dA, db without hand-derived
    formulas (`qp.py:128-183` derives them manually).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class QPSolution(NamedTuple):
    z: Array     # (bsz, nz)
    s: Array     # (bsz, ni) slacks
    lam: Array   # (bsz, ni) ineq duals
    nu: Array    # (bsz, ne) eq duals
    res: Array   # (bsz,) final KKT residual norm


def _kkt_residuals(z, s, lam, nu, Q, p, G, h, A, b, mu=0.0):
    rz = jnp.einsum("bij,bj->bi", Q, z) + p + jnp.einsum("bij,bi->bj", G, lam)
    if A.shape[1] > 0:
        rz = rz + jnp.einsum("bij,bi->bj", A, nu)
    rs = lam * s - mu
    ri = jnp.einsum("bij,bj->bi", G, z) + s - h
    re = jnp.einsum("bij,bj->bi", A, z) - b if A.shape[1] > 0 else jnp.zeros_like(b)
    return rz, rs, ri, re


def _solve_kkt(Q, G, A, s, lam, rz, rs, ri, re, eps=1e-9):
    """Solve the symmetrized Newton-KKT system for (dz, dnu, dlam); ds
    recovered from the slack row. Dense batched solve (the reference's
    `batch_LU.py` dense-K path)."""
    bsz, ni, nz = G.shape
    ne = A.shape[1]
    dt = Q.dtype
    Dsl = s / lam  # (bsz, ni)
    # K = [[Q, G', A'], [G, -D(s/lam), 0], [A, 0, 0]]
    N = nz + ni + ne
    K = jnp.zeros((bsz, N, N), dt)
    K = K.at[:, :nz, :nz].set(Q)
    K = K.at[:, :nz, nz : nz + ni].set(jnp.swapaxes(G, -1, -2))
    K = K.at[:, nz : nz + ni, :nz].set(G)
    K = K.at[:, nz : nz + ni, nz : nz + ni].set(
        -jnp.einsum("ij,bj->bij", jnp.eye(ni, dtype=dt), Dsl + eps)
    )
    if ne > 0:
        K = K.at[:, :nz, nz + ni :].set(jnp.swapaxes(A, -1, -2))
        K = K.at[:, nz + ni :, :nz].set(A)
    rhs = jnp.concatenate([-rz, -ri + rs / lam, -re], axis=1)[..., None]
    sol = jnp.linalg.solve(K, rhs)[..., 0]
    dz = sol[:, :nz]
    dlam = sol[:, nz : nz + ni]
    dnu = sol[:, nz + ni :]
    ds = -(rs + s * dlam) / lam
    return dz, ds, dlam, dnu


def _chol_solve(L, B):
    """Batched solve of (L L') X = B given lower-triangular L."""
    from jax.scipy.linalg import solve_triangular
    y = solve_triangular(L, B, lower=True)
    return solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)


class KKTFactors(NamedTuple):
    """One-time factorizations for the Schur-complement KKT solve
    (`pdipm/batch.py:377-428` pre_factor_kkt). Computed once per QP;
    the per-IPM-iteration work drops from one (nz+2ni+ne) dense solve
    to one (ni x ni) Cholesky.

        S = [ A Q^-1 A'   A Q^-1 G'            ]
            [ G Q^-1 A'   G Q^-1 G' + D^-1     ],  D = diag(lam/s)

    R = G Q^-1 G' - (G Q^-1 A') (A Q^-1 A')^-1 (A Q^-1 G') is the
    D-independent part of S's Schur complement; each iteration only
    factors T = R + diag(s/lam) (the reference's factor_kkt :434-469).
    """
    Lq: Array          # (bsz, nz, nz) chol(Q)
    invQ_GT: Array     # (bsz, nz, ni)
    G_invQ_GT: Array   # (bsz, ni, ni)
    La: Array          # (bsz, ne, ne) chol(A Q^-1 A') (ne>0) else (bsz,0,0)
    invQ_AT: Array     # (bsz, nz, ne)
    G_invQ_AT: Array   # (bsz, ni, ne)
    R: Array           # (bsz, ni, ni)


def pre_factor_kkt(Q, G, A) -> KKTFactors:
    """All D-independent factorizations (`batch.py:377-428`)."""
    bsz, ni, nz = G.shape
    ne = A.shape[1]
    Lq = jnp.linalg.cholesky(Q)
    invQ_GT = _chol_solve(Lq, jnp.swapaxes(G, -1, -2))
    G_invQ_GT = jnp.einsum("bij,bjk->bik", G, invQ_GT)
    if ne > 0:
        invQ_AT = _chol_solve(Lq, jnp.swapaxes(A, -1, -2))
        A_invQ_AT = jnp.einsum("bij,bjk->bik", A, invQ_AT)
        G_invQ_AT = jnp.einsum("bij,bjk->bik", G, invQ_AT)
        La = jnp.linalg.cholesky(A_invQ_AT)
        R = G_invQ_GT - jnp.einsum(
            "bij,bjk->bik", G_invQ_AT,
            _chol_solve(La, jnp.swapaxes(G_invQ_AT, -1, -2)))
    else:
        invQ_AT = jnp.zeros((bsz, nz, 0), Q.dtype)
        G_invQ_AT = jnp.zeros((bsz, ni, 0), Q.dtype)
        La = jnp.zeros((bsz, 0, 0), Q.dtype)
        R = G_invQ_GT
    return KKTFactors(Lq, invQ_GT, G_invQ_GT, La, invQ_AT, G_invQ_AT, R)


def _solve_kkt_prefactored(fac: KKTFactors, G, A, s, lam,
                           rz, rs, ri, re, eps=1e-9):
    """Same Newton step as `_solve_kkt`, via the pre-factored Schur
    blocks (`batch.py:351-374` solve_kkt + :434-469 factor_kkt).

    Block elimination of the symmetrized system
      [[Q, G', A'], [G, -diag(s/lam), 0], [A, 0, 0]] d = -[rz, ri-rs/lam, re]
    gives S w = [re - A Q^-1 rz ; ri - rs/lam - G Q^-1 rz] for
    w = (dnu, dlam), then dz, ds by back-substitution.
    """
    ne = A.shape[1]
    Dsl = s / lam + eps
    T = fac.R + jnp.einsum(
        "ij,bj->bij", jnp.eye(G.shape[1], dtype=G.dtype), Dsl)
    Lt = jnp.linalg.cholesky(T)
    invQ_rz = _chol_solve(fac.Lq, rz[..., None])[..., 0]
    b2 = ri - rs / lam - jnp.einsum("bij,bj->bi", G, invQ_rz)
    if ne > 0:
        b1 = re - jnp.einsum("bij,bj->bi", A, invQ_rz)
        y1 = _chol_solve(fac.La, b1[..., None])[..., 0]
        t = b2 - jnp.einsum("bij,bj->bi", fac.G_invQ_AT, y1)
        dlam = _chol_solve(Lt, t[..., None])[..., 0]
        dnu = _chol_solve(
            fac.La,
            (b1 - jnp.einsum("bji,bj->bi", fac.G_invQ_AT, dlam))[..., None]
        )[..., 0]
        dz = -_chol_solve(
            fac.Lq,
            (rz + jnp.einsum("bij,bi->bj", G, dlam)
             + jnp.einsum("bij,bi->bj", A, dnu))[..., None])[..., 0]
    else:
        dlam = _chol_solve(Lt, b2[..., None])[..., 0]
        dnu = jnp.zeros((s.shape[0], 0), s.dtype)
        dz = -_chol_solve(
            fac.Lq,
            (rz + jnp.einsum("bij,bi->bj", G, dlam))[..., None])[..., 0]
    ds = -(rs + s * dlam) / lam
    return dz, ds, dlam, dnu


def qp_solve(Q, p, G, h, A, b, iters: int = 18,
             prefactor: bool = False) -> QPSolution:
    """Mehrotra predictor-corrector PDIPM, fixed iterations, batched.

    prefactor=True uses the Schur-complement path with Q and A Q^-1 A'
    factored once (`pdipm/batch.py` pre_factor_kkt/factor_kkt); the
    default factors the full dense KKT each iteration
    (`pdipm/batch_LU.py`). Both produce the same Newton steps.
    """
    return _qp_solve_impl(Q, p, G, h, A, b, iters, prefactor)


def _qp_solve_impl(Q, p, G, h, A, b, iters, prefactor):
    # interior-point steps need true f32 products; TPU's default
    # bfloat16 matmul precision silently degrades the KKT solves
    # (see solvers/newton_al.py for the measured AL-side failure)
    with jax.default_matmul_precision("highest"):
        return _qp_solve_body(Q, p, G, h, A, b, iters, prefactor)


def _qp_solve_body(Q, p, G, h, A, b, iters, prefactor):
    bsz, nz = p.shape
    ni = G.shape[1]
    ne = A.shape[1]
    dt = p.dtype

    if prefactor:
        fac = pre_factor_kkt(Q, G, A)

        def kkt(s, lam, rz, rs, ri, re):
            return _solve_kkt_prefactored(fac, G, A, s, lam, rz, rs, ri, re)
    else:
        def kkt(s, lam, rz, rs, ri, re):
            return _solve_kkt(Q, G, A, s, lam, rz, rs, ri, re)

    # initialization (OptNet-style): one least-squares-ish KKT solve
    # with s = lam = 1, then shift into the positive orthant
    s0 = jnp.ones((bsz, ni), dt)
    l0 = jnp.ones((bsz, ni), dt)
    nu0 = jnp.zeros((bsz, ne), dt)
    z0 = jnp.zeros((bsz, nz), dt)
    rz, rs, ri, re = _kkt_residuals(z0, s0, l0, nu0, Q, p, G, h, A, b, mu=0.0)
    dz, ds, dlam, dnu = kkt(s0, l0, rz, rs, ri, re)
    z = z0 + dz
    nu = nu0 + dnu
    s_cand = s0 + ds
    l_cand = l0 + dlam
    shift_s = jnp.maximum(0.0, -jnp.min(s_cand, axis=1, keepdims=True)) + 1.0
    shift_l = jnp.maximum(0.0, -jnp.min(l_cand, axis=1, keepdims=True)) + 1.0
    s = s_cand + shift_s
    lam = l_cand + shift_l

    def res_norm(z, s, lam, nu):
        rz, _, ri, re = _kkt_residuals(z, s, lam, nu, Q, p, G, h, A, b)
        gap = jnp.abs(jnp.sum(s * lam, axis=1)) / ni
        return (jnp.linalg.norm(rz, axis=1) + jnp.linalg.norm(ri, axis=1)
                + jnp.linalg.norm(re, axis=1) + gap)

    best = (z, s, lam, nu, res_norm(z, s, lam, nu))

    def body(carry, _):
        z, s, lam, nu, best = carry
        rz, rs, ri, re = _kkt_residuals(z, s, lam, nu, Q, p, G, h, A, b)
        # affine (predictor) step
        dz_a, ds_a, dl_a, dnu_a = kkt(s, lam, rz, rs, ri, re)

        def max_step(v, dv):
            # largest alpha in (0, 1] keeping v + alpha dv >= 0
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, jnp.min(ratio, axis=1))

        alpha_a = jnp.minimum(max_step(s, ds_a), max_step(lam, dl_a))[:, None]
        mu = jnp.sum(s * lam, axis=1) / ni
        mu_aff = jnp.sum((s + alpha_a * ds_a) * (lam + alpha_a * dl_a), axis=1) / ni
        sigma = (mu_aff / (mu + 1e-30)) ** 3
        # corrector + centering
        rs_c = rs + ds_a * dl_a - (sigma * mu)[:, None]
        dz, ds, dlam, dnu = kkt(s, lam, rz, rs_c, ri, re)
        alpha = 0.99 * jnp.minimum(max_step(s, ds), max_step(lam, dlam))[:, None]
        z = z + alpha * dz
        s = s + alpha * ds
        lam = lam + alpha * dlam
        nu = nu + alpha * dnu
        r = res_norm(z, s, lam, nu)
        bz, bs, bl, bn, br = best
        better = r < br
        best = (
            jnp.where(better[:, None], z, bz),
            jnp.where(better[:, None], s, bs),
            jnp.where(better[:, None], lam, bl),
            jnp.where(better[:, None], nu, bn),
            jnp.where(better, r, br),
        )
        return (z, s, lam, nu, best), None

    (z, s, lam, nu, best), _ = lax.scan(
        body, (z, s, lam, nu, best), None, length=iters
    )
    bz, bs, bl, bn, br = best
    return QPSolution(z=bz, s=bs, lam=bl, nu=bn, res=br)


# --------------------------------------------------------------------------
# differentiable layer (implicit function theorem through the KKT map)
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(6,))
def qp_layer(Q, p, G, h, A, b, iters: int = 18):
    """Differentiable QP: returns the primal solution z*."""
    return qp_solve(Q, p, G, h, A, b, iters).z


def _qp_fwd(Q, p, G, h, A, b, iters):
    sol = qp_solve(Q, p, G, h, A, b, iters)
    return sol.z, (sol, Q, p, G, h, A, b)


def _qp_bwd(iters, saved, gz):
    sol, Q, p, G, h, A, b = saved
    z, s, lam, nu = sol.z, sol.s, sol.lam, sol.nu
    bsz, nz = z.shape
    ni = G.shape[1]
    ne = A.shape[1]

    def F(solvec, theta):
        """Flat KKT residual map at fixed mu=0 (complementarity)."""
        Q_, p_, G_, h_, A_, b_ = theta
        z_ = solvec[:nz]
        s_ = solvec[nz : nz + ni]
        l_ = solvec[nz + ni : nz + 2 * ni]
        n_ = solvec[nz + 2 * ni :]
        rz = Q_ @ z_ + p_ + G_.T @ l_ + (A_.T @ n_ if ne > 0 else 0.0)
        rs = l_ * s_
        ri = G_ @ z_ + s_ - h_
        re = A_ @ z_ - b_ if ne > 0 else jnp.zeros(0, z_.dtype)
        return jnp.concatenate([rz, rs, ri, re])

    def one_sample(zb, sb, lb, nb, Qb, pb, Gb, hb, Ab, bb, gzb):
        solvec = jnp.concatenate([zb, sb, lb, nb])
        theta = (Qb, pb, Gb, hb, Ab, bb)
        J = jax.jacfwd(F, argnums=0)(solvec, theta)  # (N, N)
        rhs = jnp.concatenate(
            [gzb, jnp.zeros(2 * ni + ne, zb.dtype)]
        )
        # (dF/dsol)' w = dL/dsol  (only z part nonzero)
        w = jnp.linalg.solve(
            J.T + 1e-10 * jnp.eye(J.shape[0], dtype=J.dtype), rhs
        )
        _, vjp_theta = jax.vjp(lambda th: F(solvec, th), theta)
        grads = vjp_theta(-w)[0]
        return grads

    grads = jax.vmap(one_sample)(z, s, lam, nu, Q, p, G, h, A, b, gz)
    return grads


qp_layer.defvjp(_qp_fwd, _qp_bwd)


def qp_solve_single(Q, p, G, h, A=None, b=None, iters: int = 18,
                    prefactor: bool = False) -> QPSolution:
    """Single-instance PDIPM (`qpth/solvers/pdipm/single.py:10-94`):
    unbatched convenience wrapper over the batched solver (on TPU a
    batch of one compiles to the same program)."""
    nz = p.shape[0]
    if A is None:
        A = jnp.zeros((0, nz), p.dtype)
        b = jnp.zeros((0,), p.dtype)
    sol = qp_solve(Q[None], p[None], G[None], h[None], A[None], b[None],
                   iters=iters, prefactor=prefactor)
    return QPSolution(*(x[0] for x in sol))
