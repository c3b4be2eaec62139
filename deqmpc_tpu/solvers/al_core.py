"""Augmented-Lagrangian math core: residuals, merit, structured KKT assembly.

Re-derives the math of the reference's `qpth/al_utils.py` (merit
`:52-77`, gradient/Hessian `:80-123`, constraint Jacobians `:183-404`,
cost `:425-446`) in block-structured form: instead of materializing the
(T*nx + 2*nu*T) x (T*(nx+nu)) constraint Jacobian and forming the dense
Gauss-Newton Hessian with a bmm (`al_utils.py:203-205`), the gradient
J'lam and the Hessian blocks of diag(Q) + rho*J'J are assembled
directly from the per-step dynamics Jacobians — O(T n^2) memory, and
the Newton system stays block-tridiagonal for the O(T) Riccati solve.

Constraint ordering (matching `al_utils.py:209-226,288-326`):
  equality rows   : defect residuals r_t = x_{t+1} - f(x_t, u_t) for
                    t = 0..T-2, then the initial-state row x_0 - x0;
  inequality rows : per step t, [u_t - u_hi ; u_lo - u_t]
                    (2*nu rows), then optionally per-step obstacle
                    rows radius^2 - |xyz_t - o_k|^2 (k over the
                    selected nearest obstacles).
Duals `lam` are stored flat: [eq (T*nx) | ineq (T*n_ineq_t)].
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .types import LinDx

Array = jax.Array


class ObstacleSet(NamedTuple):
    """Per-(sample, step) selected obstacle centers + shared radius.

    centers: (bsz, T, n_sel, 3); radius: scalar.
    (Counterpart of `AL_mpc_custom.py:100-135`'s 4-nearest-of-40.)
    """

    centers: Array
    radius: float


# --------------------------------------------------------------------------
# residuals
# --------------------------------------------------------------------------

def eq_residuals(dyn, x: Array, u: Array, x0: Array) -> Array:
    """Equality residuals stacked (bsz, T, nx): rows 0..T-2 are dynamics
    defects, row T-1 is the initial-state residual."""
    bsz, T, nx = x.shape
    x_next = dyn(x[:, :-1], u[:, :-1])  # (bsz, T-1, nx)
    defects = x[:, 1:] - x_next
    init = (x[:, 0] - x0)[:, None]
    return jnp.concatenate([defects, init], axis=1)


def eq_residuals_se(dyn, x: Array, u: Array, x0: Array) -> Array:
    """State-estimator (MHE) flavor: no initial-state constraint
    (`al_utils_se.py` drops the x0 row); zero row keeps shapes static."""
    bsz, T, nx = x.shape
    x_next = dyn(x[:, :-1], u[:, :-1])
    defects = x[:, 1:] - x_next
    return jnp.concatenate([defects, jnp.zeros_like(defects[:, :1])], axis=1)


def ineq_residuals(u: Array, u_lower, u_upper) -> Tuple[Array, Array]:
    """Control box rows per step: [u - u_hi ; u_lo - u]. Returns
    (res, res_clamp) with shape (bsz, T, 2*nu)."""
    res = jnp.concatenate([u - u_upper, u_lower - u], axis=-1)
    return res, jnp.maximum(res, 0.0)


def obstacle_residuals(x: Array, obs: ObstacleSet) -> Tuple[Array, Array]:
    """Sphere-avoidance rows: radius^2 - |xyz - center|^2 <= 0.
    Returns (res, res_clamp) with shape (bsz, T, n_sel)."""
    xyz = x[..., None, :3]  # (bsz, T, 1, 3)
    d2 = jnp.sum((xyz - obs.centers) ** 2, axis=-1)
    res = obs.radius**2 - d2
    return res, jnp.maximum(res, 0.0)


def full_residuals(dyn, x, u, x0, u_lower, u_upper,
                   obs: Optional[ObstacleSet] = None,
                   state_estimator: bool = False):
    """All residuals, flattened: (res, res_clamp), shape (bsz, ncon)."""
    bsz = x.shape[0]
    eq_fn = eq_residuals_se if state_estimator else eq_residuals
    r_eq = eq_fn(dyn, x, u, x0).reshape(bsz, -1)
    parts, parts_c = [r_eq], [r_eq]
    if u_lower is not None and not state_estimator:
        r_in, r_in_c = ineq_residuals(u, u_lower, u_upper)
        parts.append(r_in.reshape(bsz, -1))
        parts_c.append(r_in_c.reshape(bsz, -1))
    if obs is not None:
        r_o, r_o_c = obstacle_residuals(x, obs)
        parts.append(r_o.reshape(bsz, -1))
        parts_c.append(r_o_c.reshape(bsz, -1))
    return jnp.concatenate(parts, axis=1), jnp.concatenate(parts_c, axis=1)


# --------------------------------------------------------------------------
# cost & merit
# --------------------------------------------------------------------------

def compute_cost(xu: Array, Q: Array, q: Array, f: Optional[Array] = None) -> Array:
    """Diagonal quadratic cost per sample (`al_utils.py:425-433`)."""
    c = jnp.sum(0.5 * xu * Q * xu + q * xu, axis=(-2, -1))
    if f is not None:
        c = c + jnp.sum(f, axis=-1)
    return c


def cost_gradient(xu: Array, Q: Array, q: Array) -> Array:
    return Q * xu + q


def merit_function(dyn, xu, Q, q, x0, lam, rho, u_lower, u_upper,
                   obs=None, state_estimator=False, f=None) -> Array:
    """L = cost + 0.5*rho*|res_clamp|^2 + lam'res (`al_utils.py:52-77`).
    Shapes: xu (bsz, T, n); rho (bsz, 1); lam (bsz, ncon)."""
    nx = x0.shape[-1]
    x, u = xu[..., :nx], xu[..., nx:]
    res, res_c = full_residuals(dyn, x, u, x0, u_lower, u_upper, obs, state_estimator)
    cost = compute_cost(xu, Q, q, f)
    return (
        cost
        + 0.5 * rho[:, 0] * jnp.sum(res_c * res_c, axis=1)
        + jnp.sum(lam * res, axis=1)
    )


# --------------------------------------------------------------------------
# structured gradient + block-tridiagonal Gauss-Newton Hessian
# --------------------------------------------------------------------------

def merit_grad_blocks(xu, Q, q, x0, lam, rho, F,
                      u_lower, u_upper, obs: Optional[ObstacleSet] = None,
                      state_estimator: bool = False,
                      dyn_eq_res: Optional[Array] = None):
    """Merit gradient and GN Hessian in block-tridiagonal form.

    Args:
      xu: (bsz, T, n); F: per-step dynamics Jacobians (bsz, T-1, nx, n)
        = [A_t B_t]; dyn_eq_res: precomputed stacked eq residuals
        (bsz, T, nx) (required — the caller computes them alongside F).
    Returns:
      g: (bsz, T, n) merit gradient
      D: (bsz, T, n, n) Hessian diagonal blocks
      O: (bsz, T-1, n, n) Hessian super-diagonal blocks
      res, res_clamp: (bsz, ncon) residuals (for dual updates)
    """
    bsz, T, n = xu.shape
    nx = x0.shape[-1]
    nu = n - nx
    x, u = xu[..., :nx], xu[..., nx:]
    dtype = xu.dtype

    r_eq = dyn_eq_res  # (bsz, T, nx)
    parts, parts_c = [r_eq.reshape(bsz, -1)], [r_eq.reshape(bsz, -1)]

    lam_eq = lam[:, : T * nx].reshape(bsz, T, nx)
    off = T * nx

    # ----- gradient: cost + J'lam + rho * J_c' res_clamp ------------------
    # assembled scatter-free (pads/concats only): XLA-TPU lowers .at
    # scatters to serialized dynamic-update loops, which dominated the
    # Newton step in profiling.
    g = cost_gradient(xu, Q, q)

    def pad_T(a, front, back):
        """Pad (bsz, t, n) along the time axis."""
        return jnp.pad(a, ((0, 0), (front, back), (0, 0)))

    def pad_feat(a, back):
        return jnp.pad(a, ((0, 0), (0, 0), (0, back)))

    def eq_terms(v_eq):
        """J_eq' v for stacked eq duals/residuals v (bsz, T, nx)."""
        # defect row t: -F_t' v_t on block t, +S' v_t on block t+1
        gt = -jnp.einsum("btij,bti->btj", F, v_eq[:, : T - 1])  # (bsz,T-1,n)
        out = pad_T(gt, 0, 1)
        out = out + pad_feat(pad_T(v_eq[:, : T - 1], 1, 0), nu)
        if not state_estimator:
            # initial-state row (stored at slot T-1) acts on block 0
            out = out + pad_feat(pad_T(v_eq[:, T - 1][:, None], 0, T - 1), nu)
        return out

    g = g + eq_terms(lam_eq) + eq_terms(rho[..., None] * r_eq)  # J_c == J on eq

    active_u = None
    if u_lower is not None and not state_estimator:
        r_in, r_in_c = ineq_residuals(u, u_lower, u_upper)  # (bsz,T,2nu)
        parts.append(r_in.reshape(bsz, -1))
        parts_c.append(r_in_c.reshape(bsz, -1))
        lam_in = lam[:, off : off + T * 2 * nu].reshape(bsz, T, 2 * nu)
        off += T * 2 * nu
        # rows [u - u_hi] have +I_u, rows [u_lo - u] have -I_u
        gu = (lam_in[..., :nu] - lam_in[..., nu:]) + rho[..., None] * (
            r_in_c[..., :nu] - r_in_c[..., nu:]
        )
        g = g + jnp.pad(gu, ((0, 0), (0, 0), (nx, 0)))
        active_u = (r_in >= 0).astype(dtype)  # (bsz, T, 2nu)

    jac_obs = None
    active_obs = None
    if obs is not None:
        r_o, r_o_c = obstacle_residuals(x, obs)  # (bsz, T, n_sel)
        parts.append(r_o.reshape(bsz, -1))
        parts_c.append(r_o_c.reshape(bsz, -1))
        n_sel = r_o.shape[-1]
        lam_o = lam[:, off : off + T * n_sel].reshape(bsz, T, n_sel)
        jac_obs = -2.0 * (x[..., None, :3] - obs.centers)  # (bsz,T,n_sel,3)
        active_obs = (r_o >= 0).astype(dtype)
        go = jnp.einsum("btk,btkj->btj", lam_o, jac_obs) + rho[..., None] * (
            jnp.einsum("btk,btkj->btj", r_o_c * active_obs, jac_obs)
        )
        g = g + jnp.pad(go, ((0, 0), (0, 0), (0, n - 3)))

    # ----- Hessian blocks: diag(Q) + rho * J_c'J_c ------------------------
    eye_x = jnp.concatenate([jnp.ones((nx,), dtype), jnp.zeros((nu,), dtype)])
    eye_n = jnp.eye(n, dtype=dtype)
    D = jnp.einsum("ij,btj->btij", eye_n, Q)  # diag(Q) blocks
    # S'S (identity on x-part) appears once per block: from the defect
    # row t-1 for t >= 1, from the initial-state row for t = 0.
    if state_estimator:
        # no init row: block 0 gets no S'S
        sts = jnp.concatenate(
            [jnp.zeros((1, n), dtype), jnp.tile(eye_x[None], (T - 1, 1))], axis=0
        )
        D = D + rho[..., None, None] * jnp.einsum("ij,tj->tij", eye_n, sts)[None]
    else:
        D = D + rho[..., None, None] * (eye_n * eye_x)[None, None]
    # F_t'F_t on blocks 0..T-2 (padded along T, no scatter)
    FtF = jnp.einsum("btik,btil->btkl", F, F)  # (bsz, T-1, n, n)
    D = D + rho[..., None, None] * jnp.pad(
        FtF, ((0, 0), (0, 1), (0, 0), (0, 0))
    )
    # active control-box rows: diagonal on the u-part
    if active_u is not None:
        act = active_u[..., :nu] + active_u[..., nu:]  # (bsz, T, nu)
        act_full = jnp.pad(act, ((0, 0), (0, 0), (nx, 0)))  # (bsz,T,n)
        D = D + rho[..., None, None] * jnp.einsum("ij,btj->btij", eye_n, act_full)
    # active obstacle rows: 3x3 on the xyz part
    if jac_obs is not None:
        JoJo = jnp.einsum(
            "btk,btki,btkj->btij", active_obs, jac_obs, jac_obs
        )
        D = D + rho[..., None, None] * jnp.pad(
            JoJo, ((0, 0), (0, 0), (0, n - 3), (0, n - 3))
        )

    # super-diagonal: block (t, t+1) = -rho * F_t' S = [-rho F_t' | 0]
    O = jnp.pad(
        -rho[..., None, None] * jnp.swapaxes(F, -1, -2),
        ((0, 0), (0, 0), (0, 0), (0, nu)),
    )

    res = jnp.concatenate(parts, axis=1)
    res_c = jnp.concatenate(parts_c, axis=1)
    return g, D, O, res, res_c


def lin_dyn_fns(lindx: LinDx):
    """Build (dyn, dyn_jac) callables from time-varying linear dynamics
    x_{t+1} = F_t [x;u] + f_t (reference `LinDx` path,
    `AL_mpc.py:448-456,521-534`)."""

    def dyn(x, u):
        # written for the canonical (bsz, T-1, .) layout; vmap lifts any
        # extra leading axes (e.g. the line-search candidate axis)
        xu = jnp.concatenate([x, u], axis=-1)
        return jnp.einsum("btij,btj->bti", lindx.F, xu) + lindx.f

    def dyn_jac(x, u):
        return dyn(x, u), lindx.F

    return dyn, dyn_jac


def num_constraints(T: int, nx: int, nu: int, has_u_box: bool = True,
                    n_obs_sel: int = 0, state_estimator: bool = False) -> int:
    """Constraint count (`AL_mpc.py:186-201`): eq rows always occupy
    T*nx (the SE variant zero-pads the dropped x0 row)."""
    ncon = T * nx
    if has_u_box and not state_estimator:
        ncon += 2 * nu * T
    ncon += n_obs_sel * T
    return ncon
