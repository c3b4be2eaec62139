"""Headline benchmark: batched AL trajectory-solve throughput.

Measures end-to-end solves/s of the augmented-Lagrangian MPC on the
RexQuadrotor config (T=5, al_iter=2 — BASELINE.md config #4, the
hardest per-sample KKT blocks: 16x16) at batch 1024 in f32 on one
chip. Prints ONE JSON line; vs_baseline is relative to the
BASELINE.json north-star target of 10,000 solves/s on a v5e chip
(the reference publishes no numbers — BASELINE.md).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from deqmpc_tpu.envs import RexQuadrotor
    from deqmpc_tpu.policies.tracking_mpc import TrackingMPC

    env = RexQuadrotor()
    bsz, T = 1024, 5
    tracking = TrackingMPC(env, T, al_iter=2, dtype=jnp.float32, rho_max=1e5)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (bsz, env.nx)), jnp.float32)
    x_ref = jnp.broadcast_to(
        jnp.asarray(env.targ_pos, jnp.float32), (bsz, T, env.nx)
    )
    u_ref = jnp.full((bsz, T, env.nu), env.u_hover, jnp.float32)

    @jax.jit
    def solve(x0):
        st = tracking.init_state(bsz)
        xs, us, status, _ = tracking(x0, x_ref, u_ref, st, al_iters=2)
        return xs, us

    xs, us = solve(x0)  # compile
    jax.block_until_ready(xs)
    # sanity: finite output
    assert bool(jnp.all(jnp.isfinite(us))), "non-finite solver output"

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        xs, us = solve(x0)
    jax.block_until_ready(xs)
    dt = (time.perf_counter() - t0) / n_rep
    solves_per_s = bsz / dt

    target = 10_000.0
    print(json.dumps({
        "metric": "rexquad_al_solve_throughput",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / target, 3),
    }))


if __name__ == "__main__":
    main()
