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


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def _per_sample(fn, args_sharded, args_single):
    """Run fn on sharded and unsharded inputs; return both outputs."""
    out_s = jax.jit(fn)(*args_sharded)
    out_r = jax.jit(fn)(*args_single)
    return np.asarray(out_s), np.asarray(out_r)


@pytest.mark.slow
def test_sharded_streaming_warm_start_matches_single_device(setup):
    """The warm-started receding-horizon step carries per-sample solver
    state (lambda, rho, primal iterate) — it must shard with zero
    collectives and reproduce the unsharded per-sample trajectories."""
    env, policy, params, batch = setup
    mesh = make_mesh(8)
    obs = jnp.asarray(batch["obs"])

    def two_ticks(p, o):
        po, carry = policy.forward(p, o, qp_solve=True)
        po2, _ = policy.forward_warm_start(p, o, carry, qp_solve=True)
        return po2["trajs"][-1][1]

    params_r = replicate(params, mesh)
    obs_s = shard_batch({"obs": batch["obs"]}, mesh)["obs"]
    out_s, out_r = _per_sample(two_ticks, (params_r, obs_s), (params, obs))
    np.testing.assert_allclose(out_s, out_r, rtol=1e-5, atol=1e-6)


def test_sharded_history_variant_matches_single_device():
    """History-variant policy (3-D obs window) under the mesh."""
    from deqmpc_tpu.policies.policy_variants import DEQMPCPolicyHistory

    env = PendulumEnv()
    H = 3
    cfg = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=env.dt, bsz=16, hdim=16,
                       layer_type="mlp", deq_iter=2, fp_max_steps=4,
                       solver_dtype=jnp.float64)
    policy = DEQMPCPolicyHistory(cfg, env, H=H)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    obs_hist = rng.uniform(-1, 1, (16, H, 2)).astype(np.float32)

    def fwd(p, o):
        po, _ = policy.forward(p, o, qp_solve=True)
        return po["trajs"][-1][1]

    mesh = make_mesh(8)
    params_r = replicate(params, mesh)
    obs_s = shard_batch({"obs": obs_hist}, mesh)["obs"]
    out_s, out_r = _per_sample(
        fwd, (params_r, obs_s), (params, jnp.asarray(obs_hist)))
    np.testing.assert_allclose(out_s, out_r, rtol=1e-5, atol=1e-6)


def test_sharded_obstacle_solve_matches_single_device():
    """Obstacle-MPC: the selected per-(b,t) obstacle tensor is a
    batch-leading constant captured at trace time — it must shard along
    with the batch and match the unsharded solve per sample."""
    from deqmpc_tpu.solvers import ALMPC, ObstacleSet, QuadCost
    from deqmpc_tpu.solvers.al_core import lin_dyn_fns
    from deqmpc_tpu.solvers.types import LinDx
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsz, T, nx, nu = 16, 6, 3, 3
    dt = 0.2
    F = jnp.tile(
        jnp.concatenate([jnp.eye(nx), dt * jnp.eye(nu)], axis=1)[None, None],
        (bsz, T - 1, 1, 1),
    )
    dyn, dyn_jac = lin_dyn_fns(LinDx(F=F, f=jnp.zeros((bsz, T - 1, nx))))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        np.concatenate([-np.ones((bsz, 1)), rng.uniform(-0.2, 0.2, (bsz, 2))],
                       axis=1), jnp.float64)
    goal = jnp.asarray([1.0, 0.0, 0.0])
    Q = jnp.tile(jnp.asarray([1.0] * nx + [0.1] * nu), (bsz, T, 1))
    q = -Q * jnp.tile(jnp.concatenate([goal, jnp.zeros(nu)]), (bsz, T, 1))
    cost = QuadCost(Q=Q, q=q, f=jnp.zeros((bsz, T)))
    centers = jnp.zeros((40, 3)).at[1:].set(
        jnp.asarray(rng.uniform(5, 10, (39, 3))))
    obstacles = ObstacleSet(centers=centers, radius=0.3)

    mpc = ALMPC(nx, nu, T, u_lower=-5 * np.ones(nu), u_upper=5 * np.ones(nu),
                dyn=dyn, dyn_jac=dyn_jac, dtype=jnp.float64,
                obstacles=obstacles, n_obs_sel=4)
    x_ref = jnp.broadcast_to(goal, (bsz, T, nx))
    mpc.select_obstacles(x_ref)

    def solve(x0, cost):
        st = mpc.init_state(x0.shape[0])
        x, u, _, _ = mpc.solve(x0, cost, st, al_iter=6)
        return x

    out_r = np.asarray(jax.jit(solve)(x0, cost))

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    x0_s = jax.device_put(x0, sh)
    cost_s = QuadCost(Q=jax.device_put(Q, sh), q=jax.device_put(q, sh),
                      f=jax.device_put(cost.f, sh))
    out_s = np.asarray(jax.jit(solve)(x0_s, cost_s))
    np.testing.assert_allclose(out_s, out_r, rtol=1e-6, atol=1e-8)


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
