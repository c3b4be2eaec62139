"""A/B timing of the DEQ-MPC forward/train step across configs.

Times (a) network-only forward, (b) full forward, (c) train step for
each requested variant, on whatever backend jax resolves (TPU by
default). Used to drive the VERDICT-r3 #5 network-phase optimization:
compute-dtype (f32 vs bf16 MXU), horizon scaling, fp-solver depth.

Usage:
    python scripts/perf_ab.py --env rexquadrotor --T 5 \
        --variants f32,bf16
    python scripts/perf_ab.py --env cartpole1link --T 10 --variants f32
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, n_warmup=2, n_rep=10):
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="rexquadrotor")
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--bsz", type=int, default=128)
    p.add_argument("--hdim", type=int, default=256)
    p.add_argument("--deq_iter", type=int, default=6)
    p.add_argument("--fp_max_steps", type=int, default=10)
    p.add_argument("--variants", type=str, default="f32,bf16")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from deqmpc_tpu.envs import make_env
    from deqmpc_tpu.policies import (DEQMPCPolicy, PolicyConfig,
                                     compute_loss_deqmpc)

    env = make_env(args.env)
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.uniform(-0.3, 0.3, (args.bsz, env.nx)), jnp.float32)
    batch = {
        "state": jnp.asarray(rng.normal(size=(args.bsz, args.T, env.nx)) * 0.3,
                             jnp.float32),
        "action": jnp.full((args.bsz, args.T, env.nu), float(env.u_trim),
                           jnp.float32),
        "mask": jnp.ones((args.bsz, args.T), jnp.float32),
    }

    for variant in args.variants.split(","):
        cfg = PolicyConfig(
            nx=env.nx, nu=env.nu, nq=env.nx // 2, T=args.T, dt=env.dt,
            bsz=args.bsz, hdim=args.hdim, layer_type="gcn",
            deq_iter=args.deq_iter, fp_max_steps=args.fp_max_steps,
            solver_dtype=jnp.float32, rho_max=1e5,
            compute_dtype=jnp.bfloat16 if variant == "bf16" else None,
        )
        policy = DEQMPCPolicy(cfg, env)
        params = policy.init(jax.random.PRNGKey(0))

        @jax.jit
        def net_fwd(p, o):
            po, _ = policy.forward(p, o, qp_solve=False)
            return po["trajs"][-1][0]

        @jax.jit
        def fwd(p, o):
            po, _ = policy.forward(p, o, qp_solve=True)
            return po["trajs"][-1][1]

        optimizer = optax.chain(optax.clip_by_global_norm(2.0),
                                optax.adam(1e-3))
        opt_state = optimizer.init(params)

        def loss_fn(p):
            po, _ = policy.forward(p, obs, qp_solve=True)
            d = compute_loss_deqmpc(policy, batch["state"], batch["action"],
                                    batch["mask"], po,
                                    x_init=po["init_states"])
            return d["loss"]

        @jax.jit
        def train_step(p, o):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = optimizer.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        dt_net, _ = _time(net_fwd, params, obs)
        dt_fwd, _ = _time(fwd, params, obs)
        dt_tr, out = _time(train_step, params, opt_state)
        print(json.dumps({
            "variant": variant, "env": args.env, "T": args.T,
            "net_fwd_ms": round(dt_net * 1e3, 2),
            "full_fwd_ms": round(dt_fwd * 1e3, 2),
            "train_step_ms": round(dt_tr * 1e3, 2),
            "fwd_throughput": round(args.bsz / dt_fwd, 1),
            "loss": float(out[2]),
        }), flush=True)


if __name__ == "__main__":
    main()
