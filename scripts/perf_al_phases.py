"""Phase split of one AL-Newton iteration on TPU (VERDICT r4 #7).

Decides the fused-Pallas-AL-kernel question with numbers: times the
four phases of a Newton step — (a) dynamics linearization (dyn_jac),
(b) merit-gradient/Hessian assembly, (c) block-tridiag factor+solve
(the existing Pallas kernel), (d) the 20-candidate merit line search
(20 dynamics rollouts) — plus the end-to-end al_solve, at bsz
128/512/1024 on RexQuadrotor T=5 (the BASELINE #4 blocks).

A fused batch-in-lanes kernel can absorb (b)+(c); (a) and (d) are
dominated by env dynamics (RK4 + MRP attitude math), which Mosaic
would need reimplemented per env. The (b)+(c) share of the iteration
bounds the fused kernel's possible win (Amdahl).

Usage: python scripts/perf_al_phases.py  (TPU by default)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.envs import RexQuadrotor
from deqmpc_tpu.ops.pallas_tridiag import pallas_block_tridiag_solve
from deqmpc_tpu.ops.tridiag import (block_tridiag_factor,
                                    block_tridiag_solve_factored)
from deqmpc_tpu.policies.tracking_mpc import TrackingMPC
from deqmpc_tpu.solvers.al_core import merit_function, merit_grad_blocks


def timeit(fn, *args, n_warm=2, n_rep=30, n_blocks=5):
    out = None
    for _ in range(n_warm):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n_rep)
    return float(np.median(ts))


def main():
    env = RexQuadrotor()
    T, nx, nu = 5, env.nx, env.nu
    n = nx + nu
    dyn = env.dynamics

    def dyn_jac(x, u):  # (x, u) -> (x_next, [A B]) as TrackingMPC builds it
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], axis=-1)
    u_lo = jnp.asarray(env.action_space.low, jnp.float32)
    u_hi = jnp.asarray(env.action_space.high, jnp.float32)

    rows = []
    for bsz in (128, 512, 1024):
        rng = np.random.default_rng(0)
        xu = jnp.asarray(rng.uniform(-0.3, 0.3, (bsz, T, n)), jnp.float32)
        x0 = xu[:, 0, :nx]
        Q = jnp.tile(
            jnp.concatenate([jnp.asarray(env.Qlqr), jnp.asarray(env.Rlqr)]
                            ).astype(jnp.float32), (bsz, T, 1))
        q = -Q * xu
        ncon = T * nx + 2 * T * nu
        lam = jnp.zeros((bsz, ncon), jnp.float32)
        rho = jnp.ones((bsz, 1), jnp.float32)

        @jax.jit
        def phase_linearize(xu):
            x, u = xu[..., :nx], xu[..., nx:]
            return dyn_jac(x[:, :-1], u[:, :-1])

        @jax.jit
        def phase_assemble(xu, F, r_eq):
            return merit_grad_blocks(xu, Q, q, x0, lam, rho, F, u_lo, u_hi,
                                     dyn_eq_res=r_eq)

        interp = jax.default_backend() not in ("tpu", "axon")

        @jax.jit
        def phase_solve_pallas(g, D, O):
            return pallas_block_tridiag_solve(D, O, g, interpret=interp)

        @jax.jit
        def phase_solve_xla(g, D, O):
            fac = block_tridiag_factor(D, O)
            return block_tridiag_solve_factored(fac, g)

        @jax.jit
        def phase_linesearch(xu, update):
            steps = 2.0 ** (-jnp.arange(20, dtype=xu.dtype))
            cands = xu[None] + steps[:, None, None, None] * update[None]
            merits = jax.vmap(
                lambda c: merit_function(dyn, c, Q, q, x0, lam, rho,
                                         u_lo, u_hi))(cands)
            return jnp.argmin(merits, axis=0)

        with jax.default_matmul_precision("highest"):
            x_next, F = phase_linearize(xu)
            x = xu[..., :nx]
            r_eq = jnp.concatenate(
                [x[:, 1:] - x_next, (x[:, 0] - x0)[:, None]], axis=1)
            g, D, O, _, _ = phase_assemble(xu, F, r_eq)
            upd = phase_solve_pallas(g, D, O)

            t_lin = timeit(phase_linearize, xu)
            t_asm = timeit(phase_assemble, xu, F, r_eq)
            t_sol = timeit(phase_solve_pallas, g, D, O)
            t_sol_xla = timeit(phase_solve_xla, g, D, O)
            t_ls = timeit(phase_linesearch, xu, upd)

        # end-to-end al_solve for context (2 AL iters, <=4 Newton each)
        tracking = TrackingMPC(env, T, al_iter=2, dtype=jnp.float32,
                               rho_max=1e5)
        x_ref = jnp.broadcast_to(jnp.asarray(env.targ_pos, jnp.float32),
                                 (bsz, T, nx))
        u_ref = jnp.full((bsz, T, nu), env.u_hover, jnp.float32)

        @jax.jit
        def full_solve(x0_):
            st = tracking.init_state(bsz)
            return tracking(x0_, x_ref, u_ref, st, al_iters=2)[1]

        t_full = timeit(full_solve, x0, n_rep=10)

        newton_iter = t_lin + t_asm + t_sol + t_ls
        rows.append({
            "bsz": bsz,
            "linearize_ms": round(t_lin * 1e3, 3),
            "assemble_ms": round(t_asm * 1e3, 3),
            "tridiag_pallas_ms": round(t_sol * 1e3, 3),
            "tridiag_xla_ms": round(t_sol_xla * 1e3, 3),
            "linesearch20_ms": round(t_ls * 1e3, 3),
            "newton_iter_ms": round(newton_iter * 1e3, 3),
            "fusible_share": round((t_asm + t_sol) / newton_iter, 3),
            "al_solve_full_ms": round(t_full * 1e3, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "rows": rows}))


if __name__ == "__main__":
    main()
