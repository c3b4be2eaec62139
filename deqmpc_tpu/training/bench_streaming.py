"""Streaming warm-start per-step latency benchmark (BASELINE config #5).

Measures the real-time receding-horizon control budget: one
`forward_warm_start` call per control tick (the deployment mode of the
reference's streaming trainer, `deqmpc/policies.py:205-259`,
`qpth/AL_mpc.py:342-423`). The reference publishes no latency numbers
(BASELINE.md) — the contract is the env's own control period
(dt seconds/tick): real-time means per-step latency < dt.

Reports cold-start latency (tick 0), warm-start latency (steady
state), both at control batch 1 (a single vehicle) and at a fleet
batch, plus the realtime margin vs the env dt.

Usage:
    python -m deqmpc_tpu.training.bench_streaming --env rexquadrotor \
        --deq_iter 6 --streaming_steps 2
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import make_env
from ..policies import DEQMPCPolicy, PolicyConfig


def time_fn(fn, *args, n_warmup=3, n_rep=50):
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep, out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="rexquadrotor")
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--deq_iter", type=int, default=6)
    p.add_argument("--str_deq_iter", type=int, default=3,
                   help="warm-start iterations per tick (the reference's "
                        "str_al_iter schedule, train.py:142-148)")
    p.add_argument("--hdim", type=int, default=256)
    p.add_argument("--fleet_bsz", type=int, default=256)
    p.add_argument("--n_rep", type=int, default=50)
    args = p.parse_args(argv)

    env = make_env(args.env)
    nq = env.nq if env.nq <= env.nx // 2 else env.nx // 2

    results = {}
    for tag, bsz in (("single", 1), ("fleet", args.fleet_bsz)):
        # deployment-mode policy: full deq_iter cold start at tick 0,
        # str_deq_iter warm iterations per subsequent tick
        cold_cfg = PolicyConfig(
            nx=env.nx, nu=env.nu, nq=nq, T=args.T, dt=env.dt, bsz=bsz,
            hdim=args.hdim, deq_iter=args.deq_iter,
            solver_dtype=jnp.float32, rho_max=1e5,
        )
        warm_cfg = PolicyConfig(
            nx=env.nx, nu=env.nu, nq=nq, T=args.T, dt=env.dt, bsz=bsz,
            hdim=args.hdim, deq_iter=args.str_deq_iter,
            solver_dtype=jnp.float32, rho_max=1e5,
        )
        cold_policy = DEQMPCPolicy(cold_cfg, env)
        warm_policy = DEQMPCPolicy(warm_cfg, env)
        params = cold_policy.init(jax.random.PRNGKey(0))

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-0.3, 0.3, (bsz, env.nx)), jnp.float32)

        @jax.jit
        def cold_step(params, x):
            po, carry = cold_policy.forward(params, x, qp_solve=True)
            return po["trajs"][-1][2][:, 0], carry

        @jax.jit
        def warm_step(params, x, carry):
            po, carry = warm_policy.forward_warm_start(
                params, x, carry, qp_solve=True
            )
            return po["trajs"][-1][2][:, 0], carry

        dt_cold, (u0, carry) = time_fn(
            cold_step, params, x, n_rep=max(args.n_rep // 5, 5))
        dt_warm, _ = time_fn(warm_step, params, x, carry, n_rep=args.n_rep)
        assert bool(jnp.all(jnp.isfinite(u0))), "non-finite control"
        results[tag] = {
            "bsz": bsz,
            "cold_ms": round(dt_cold * 1e3, 3),
            "warm_ms_per_tick": round(dt_warm * 1e3, 3),
            "realtime_margin": round(env.dt / dt_warm, 2),
        }

    out = {
        "metric": "streaming_warm_start_latency",
        "env": args.env,
        "control_period_ms": round(env.dt * 1e3, 2),
        **results,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
