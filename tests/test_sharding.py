"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.parallel import make_mesh, replicate, shard_batch
from deqmpc_tpu.policies import (DEQMPCPolicy, PolicyConfig,
                                 compute_loss_deqmpc)


@pytest.fixture(scope="module")
def setup():
    env = PendulumEnv()
    cfg = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=env.dt, bsz=16, hdim=16,
                       layer_type="gcn", deq_iter=2, fp_max_steps=5,
                       solver_dtype=jnp.float64)
    policy = DEQMPCPolicy(cfg, env)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "obs": rng.uniform(-1, 1, (16, 2)).astype(np.float32),
        "state": rng.normal(size=(16, 4, 2)).astype(np.float32),
        "action": rng.normal(size=(16, 4, 1)).astype(np.float32),
        "mask": np.ones((16, 4), np.float32),
    }
    return env, policy, params, batch


def _loss_fn(policy):
    def loss_fn(p, b):
        policy_out, _ = policy.forward(p, b["obs"], qp_solve=True)
        d = compute_loss_deqmpc(policy, b["state"], b["action"], b["mask"],
                                policy_out)
        return d["loss"]

    return loss_fn


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device(setup):
    env, policy, params, batch = setup
    loss_fn = _loss_fn(policy)
    # single-device reference
    loss_ref = jax.jit(loss_fn)(params, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(8)
    params_r = replicate(params, mesh)
    batch_s = shard_batch(batch, mesh)
    loss_sharded = jax.jit(loss_fn)(params_r, batch_s)
    np.testing.assert_allclose(float(loss_ref), float(loss_sharded), rtol=2e-5)


def test_sharded_train_step_runs_and_grads_sync(setup):
    env, policy, params, batch = setup
    loss_fn = _loss_fn(policy)
    optimizer = optax.adam(1e-3)
    mesh = make_mesh(8)
    params_r = replicate(params, mesh)
    opt_state = optimizer.init(params_r)
    batch_s = shard_batch(batch, mesh)

    @jax.jit
    def step(p, o, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p2, o2, loss = step(params_r, opt_state, batch_s)
    assert np.isfinite(float(loss))
    # updated params remain replicated (all-reduce happened inside jit)
    leaf = jax.tree_util.tree_leaves(p2)[0]
    assert leaf.sharding.is_fully_replicated


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_shard_batch_local_single_process_equivalence(setup):
    """Multi-host feeding path: single-process, the per-host local
    shard IS the global batch, so shard_batch_local == shard_batch."""
    from deqmpc_tpu.parallel import shard_batch_local

    env, policy, params, batch = setup
    mesh = make_mesh(8)
    a = shard_batch(batch, mesh)
    b = shard_batch_local(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
