"""Train-step time decomposition: network vs solver vs backward.

Answers the question the reference leaves to commented-out prints
(`qpth/al_utils.py:500-556` time1..time4, `deqmpc/train.py:355-376`):
where does one DEQ-MPC training step spend its time? Each phase is
measured as its own jitted program (XLA fuses across phase boundaries
inside the real step, so the sum slightly over-counts — the deltas,
not the absolute split, are what guide optimization):

- `network_fwd`: deq_iter x DEQ-cell forward (qp_solve=False)
- `full_fwd`:    deq_iter x {network -> AL solve}
- `fwd_loss`:    + per-iteration loss
- `train_step`:  + backward + Adam (the real step)

solver_fwd = full_fwd - network_fwd; backward+opt = train_step -
fwd_loss.

Usage:
    python -m deqmpc_tpu.training.profile_step --env cartpole1link \
        --T 10 --hdim 256 --bsz 128
    (add --trace to also dump a jax.profiler trace to /tmp/deqmpc_trace)
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs import make_env
from ..policies import DEQMPCPolicy, PolicyConfig, compute_loss_deqmpc


def _time(fn, *args, n_warmup=2, n_rep=10):
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="cartpole1link")
    p.add_argument("--T", type=int, default=10)
    p.add_argument("--deq_iter", type=int, default=6)
    p.add_argument("--hdim", type=int, default=256)
    p.add_argument("--bsz", type=int, default=128)
    p.add_argument("--n_rep", type=int, default=10)
    p.add_argument("--trace", action="store_true")
    args = p.parse_args(argv)

    env = make_env(args.env)
    nq = env.nq if env.nq <= env.nx // 2 else env.nx // 2
    cfg = PolicyConfig(
        nx=env.nx, nu=env.nu, nq=nq, T=args.T, dt=env.dt, bsz=args.bsz,
        hdim=args.hdim, layer_type="gcn", deq_iter=args.deq_iter,
        solver_dtype=jnp.float32, rho_max=1e5,
    )
    policy = DEQMPCPolicy(cfg, env)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.uniform(-0.3, 0.3, (args.bsz, env.nx)), jnp.float32)
    batch = {
        "state": jnp.asarray(rng.normal(size=(args.bsz, args.T, env.nx)) * 0.3,
                             jnp.float32),
        "action": jnp.asarray(rng.normal(size=(args.bsz, args.T, env.nu)),
                              jnp.float32),
        "mask": jnp.ones((args.bsz, args.T), jnp.float32),
    }

    @jax.jit
    def network_fwd(p, o):
        po, _ = policy.forward(p, o, qp_solve=False)
        return po["trajs"][-1][0]

    @jax.jit
    def full_fwd(p, o):
        po, _ = policy.forward(p, o, qp_solve=True)
        return po["trajs"][-1][1]

    def loss_fn(p, o, b):
        po, _ = policy.forward(p, o, qp_solve=True)
        d = compute_loss_deqmpc(policy, b["state"], b["action"], b["mask"],
                                po, x_init=po["init_states"])
        return d["loss"]

    fwd_loss = jax.jit(loss_fn)
    optimizer = optax.chain(optax.clip_by_global_norm(2.0), optax.adam(1e-3))
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(p, o_state, o, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, o, b)
        updates, o_state = optimizer.update(grads, o_state, p)
        return optax.apply_updates(p, updates), o_state, loss

    t_net = _time(network_fwd, params, obs, n_rep=args.n_rep)
    t_full = _time(full_fwd, params, obs, n_rep=args.n_rep)
    t_loss = _time(fwd_loss, params, obs, batch, n_rep=args.n_rep)
    t_step = _time(train_step, params, opt_state, obs, batch,
                   n_rep=args.n_rep)

    out = {
        "env": args.env, "T": args.T, "bsz": args.bsz, "hdim": args.hdim,
        "network_fwd_ms": round(t_net * 1e3, 2),
        "solver_fwd_ms": round((t_full - t_net) * 1e3, 2),
        "full_fwd_ms": round(t_full * 1e3, 2),
        "loss_overhead_ms": round((t_loss - t_full) * 1e3, 2),
        "backward_opt_ms": round((t_step - t_loss) * 1e3, 2),
        "train_step_ms": round(t_step * 1e3, 2),
    }
    print(json.dumps(out))

    if args.trace:
        from ..utils.profiling import device_trace

        with device_trace("/tmp/deqmpc_trace"):
            for _ in range(3):
                train_step(params, opt_state, obs, batch)
            jax.block_until_ready(obs)
        print("trace written to /tmp/deqmpc_trace")
    return out


if __name__ == "__main__":
    main()
