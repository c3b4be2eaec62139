"""Multi-PROCESS multi-host proof (SURVEY.md §2.4).

Launches two real OS processes, each owning 2 virtual CPU devices,
joined via `jax.distributed.initialize` with gloo cross-process
collectives — the CPU stand-in for a 2-host TPU pod slice. Each
process feeds only its per-host batch shard (`shard_batch_local`) and
runs the full sharded DEQ-MPC train step; the gradient all-reduce
crosses the process boundary.

Asserts: both processes report identical loss/grad-norm/updated-param
norm (SPMD consistency), and those match a single-process run of the
same global batch (multi-host == single-host semantics).

Reference target: the reference is single-GPU torch; this capability
is the TPU-native scale-out SURVEY §2.4 mandates in its place.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["DEQMPC_TEST_CACHE"] = os.environ.get(
        "DEQMPC_TEST_CACHE", str(tmp_path / "cache"))
    os.makedirs(env["DEQMPC_TEST_CACHE"], exist_ok=True)
    env.pop("PYTHONPATH", None)

    procs = []
    for pid in (0, 1):
        out = tmp_path / f"p{pid}.json"
        log = open(tmp_path / f"p{pid}.log", "w")
        procs.append((subprocess.Popen(
            [sys.executable, WORKER,
             "--process_id", str(pid), "--num_processes", "2",
             "--coordinator", f"localhost:{port}",
             "--devices_per_host", "2", "--global_bsz", "16",
             "--out", str(out)],
            stdout=log, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        ), out, log))

    results = []
    try:
        for p, out, log in procs:
            rc = p.wait(timeout=600)
            log.close()
            logtxt = (tmp_path / os.path.basename(log.name)).read_text()
            assert rc == 0, f"worker failed (rc={rc}):\n{logtxt[-3000:]}"
            results.append(json.loads(out.read_text()))
    finally:
        for p, _, _ in procs:
            if p.poll() is None:
                p.kill()

    r0, r1 = results
    assert r0["process_count"] == 2 and r0["global_devices"] == 4
    # SPMD consistency: both hosts computed the same replicated scalars.
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=0)
    np.testing.assert_allclose(r0["grad_norm"], r1["grad_norm"], rtol=0)
    np.testing.assert_allclose(
        r0["new_param_norm"], r1["new_param_norm"], rtol=0)

    # Single-process reference on the SAME global batch/config (this
    # process already holds an 8-device mesh; semantics must agree).
    import jax
    import jax.numpy as jnp
    import optax

    from deqmpc_tpu.envs import PendulumEnv
    from deqmpc_tpu.policies import (DEQMPCPolicy, PolicyConfig,
                                     compute_loss_deqmpc)

    envp = PendulumEnv()
    cfg = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=envp.dt, bsz=16, hdim=16,
                       layer_type="gcn", deq_iter=2, fp_max_steps=5,
                       solver_dtype=jnp.float64)
    policy = DEQMPCPolicy(cfg, envp)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "obs": jnp.asarray(rng.uniform(-1, 1, (16, 2)).astype(np.float32)),
        "state": jnp.asarray(rng.normal(size=(16, 4, 2)).astype(np.float32)),
        "action": jnp.asarray(rng.normal(size=(16, 4, 1)).astype(np.float32)),
        "mask": jnp.ones((16, 4), jnp.float32),
    }

    def loss_fn(p, b):
        policy_out, _ = policy.forward(p, b["obs"], qp_solve=True)
        d = compute_loss_deqmpc(policy, b["state"], b["action"], b["mask"],
                                policy_out)
        return d["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, batch)
    gnorm = float(optax.global_norm(grads))
    np.testing.assert_allclose(r0["loss"], float(loss), rtol=2e-5)
    np.testing.assert_allclose(r0["grad_norm"], gnorm, rtol=2e-4)
