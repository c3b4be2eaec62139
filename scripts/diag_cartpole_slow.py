"""Localize the cartpole-T10 train-step slowness on TPU.

perf_ab measured: net_fwd 0.04 ms, full_fwd 563 ms on the axon chip
while the same program runs at 1.35x the rexquad-T5 cost on CPU —
something in the cartpole AL solve hits a pathological TPU path.
Times each phase independently.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *a, n=10, warm=2):
    for _ in range(warm):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from deqmpc_tpu.envs import make_env
    from deqmpc_tpu.policies.tracking_mpc import TrackingMPC
    from deqmpc_tpu.ops.pallas_tridiag import pallas_block_tridiag_solve

    env = make_env("cartpole1link")
    T, bsz = 10, 128
    nx, nu = env.nx, env.nu
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (bsz, nx)), jnp.float32)
    x_ref = jnp.zeros((bsz, T, nx), jnp.float32)
    u_ref = jnp.zeros((bsz, T, nu), jnp.float32)

    # 1. full tracking solve al_iters=2
    tracking = TrackingMPC(env, T, al_iter=2, dtype=jnp.float32, rho_max=1e5)

    @jax.jit
    def solve(x0):
        st = tracking.init_state(bsz)
        xs, us, status, _ = tracking(x0, x_ref, u_ref, st, al_iters=2)
        return us

    print("tracking_solve_ms", round(t(solve, x0), 2), flush=True)

    # 2. batched dynamics + jacobians over the horizon
    xs = jnp.asarray(rng.normal(size=(bsz, T - 1, nx)) * 0.3, jnp.float32)
    us = jnp.asarray(rng.normal(size=(bsz, T - 1, nu)) * 0.3, jnp.float32)

    @jax.jit
    def dyn(xs, us):
        return env.dynamics(xs, us)

    @jax.jit
    def dyn_jac(xs, us):
        return env.dynamics_derivatives(xs, us)

    print("dyn_ms", round(t(dyn, xs, us), 3), flush=True)
    print("dyn_jac_ms", round(t(dyn_jac, xs, us), 3), flush=True)

    # 3. the pallas tridiag solve at cartpole dims (n=5, T=10)
    n = nx + nu
    A = jnp.asarray(rng.normal(size=(bsz, T, n, n)), jnp.float32)
    D = A @ jnp.swapaxes(A, -1, -2) + 5.0 * jnp.eye(n)
    O = jnp.asarray(rng.normal(size=(bsz, T - 1, n, n)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(bsz, T, n)), jnp.float32)

    @jax.jit
    def tri(D, O, b):
        return pallas_block_tridiag_solve(D, O, b)

    print("pallas_tridiag_ms", round(t(tri, D, O, b), 3), flush=True)

    # rexquad comparison at same bsz
    env2 = make_env("rexquadrotor")
    tracking2 = TrackingMPC(env2, 5, al_iter=2, dtype=jnp.float32,
                            rho_max=1e5)
    x0b = jnp.asarray(rng.uniform(-0.3, 0.3, (bsz, env2.nx)), jnp.float32)
    xr = jnp.broadcast_to(jnp.asarray(env2.targ_pos, jnp.float32),
                          (bsz, 5, env2.nx))
    ur = jnp.full((bsz, 5, env2.nu), env2.u_hover, jnp.float32)

    @jax.jit
    def solve2(x0):
        st = tracking2.init_state(bsz)
        xs, us, status, _ = tracking2(x0, xr, ur, st, al_iters=2)
        return us

    print("rexquad_solve_ms", round(t(solve2, x0b), 2), flush=True)

    # cartpole T=5 (isolate T from env)
    tracking3 = TrackingMPC(env, 5, al_iter=2, dtype=jnp.float32,
                            rho_max=1e5)

    @jax.jit
    def solve3(x0):
        st = tracking3.init_state(bsz)
        xs, us, status, _ = tracking3(x0, x_ref[:, :5], u_ref[:, :5], st,
                                      al_iters=2)
        return us

    print("cartpole_T5_solve_ms", round(t(solve3, x0), 2), flush=True)


if __name__ == "__main__":
    main()
