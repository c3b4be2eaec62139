"""Multi-host SPMD worker: one process of a `jax.distributed` run.

Proves the SURVEY.md §2.4 multi-host contract end-to-end without pod
hardware: N processes (this script) each own `--devices_per_host`
virtual CPU devices, join a cluster via `jax.distributed.initialize`,
build ONE global mesh over all N*devices_per_host devices, feed only
their LOCAL shard of the global batch (per-host data loading,
`shard_batch_local`), and run the full sharded DEQ-MPC train step —
loss + grads (automatic cross-host psum over gloo) + an optimizer
update whose output is replicated.

Each process writes {loss, grad_norm, new_param_norm} to --out; the
driver test (tests/test_multihost.py) asserts all processes agree with
each other AND with a single-process run of the same global batch.

On a real TPU pod the same code path runs with `--platform tpu`
(arguments to `initialize` auto-detect) and the per-host batch comes
from each host's data loader shard; collectives ride ICI instead of
gloo. Scaling recipe: fix global bsz, measure step time at 1, 2, 4
hosts; the only cross-host traffic is the gradient all-reduce, so
steps/s should scale >=90% linearly until the all-reduce saturates.
"""
import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", type=str, required=True)
    ap.add_argument("--devices_per_host", type=int, default=2)
    ap.add_argument("--global_bsz", type=int, default=16)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    args = ap.parse_args()

    # The harness pre-imports jax (sitecustomize), so XLA_FLAGS must be
    # set by the launcher in our env; here we only flip the lazy config.
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_enable_x64", True)
    cache_dir = os.environ.get("DEQMPC_TEST_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == args.devices_per_host

    import jax.numpy as jnp
    import numpy as np
    import optax

    from deqmpc_tpu.envs import PendulumEnv
    from deqmpc_tpu.parallel import (make_mesh, replicate_local,
                                     shard_batch_local)
    from deqmpc_tpu.policies import (DEQMPCPolicy, PolicyConfig,
                                     compute_loss_deqmpc)

    env = PendulumEnv()
    bsz = args.global_bsz
    cfg = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=env.dt, bsz=bsz, hdim=16,
                       layer_type="gcn", deq_iter=2, fp_max_steps=5,
                       solver_dtype=jnp.float64)
    policy = DEQMPCPolicy(cfg, env)
    # Same PRNG seed on every host -> identical local param copies.
    params = policy.init(jax.random.PRNGKey(0))

    # Deterministic GLOBAL batch; each host slices out its shard —
    # per-host data loading, nothing ships the full batch anywhere.
    rng = np.random.default_rng(0)
    global_batch = {
        "obs": rng.uniform(-1, 1, (bsz, 2)).astype(np.float32),
        "state": rng.normal(size=(bsz, 4, 2)).astype(np.float32),
        "action": rng.normal(size=(bsz, 4, 1)).astype(np.float32),
        "mask": np.ones((bsz, 4), np.float32),
    }
    per_host = bsz // args.num_processes
    lo = args.process_id * per_host
    local_batch = {k: v[lo:lo + per_host] for k, v in global_batch.items()}

    mesh = make_mesh()  # ALL global devices
    params_g = replicate_local(params, mesh)
    batch_g = shard_batch_local(local_batch, mesh)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params_g)

    def loss_fn(p, b):
        policy_out, _ = policy.forward(p, b["obs"], qp_solve=True)
        d = compute_loss_deqmpc(policy, b["state"], b["action"], b["mask"],
                                policy_out)
        return d["loss"]

    @jax.jit
    def step(p, o, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, optax.global_norm(grads)

    new_params, _, loss, gnorm = step(params_g, opt_state, batch_g)
    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "loss": float(loss),
        "grad_norm": float(gnorm),
        "new_param_norm": float(optax.global_norm(new_params)),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
