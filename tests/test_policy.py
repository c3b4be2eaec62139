"""End-to-end policy tests: forward shapes, loss, gradient flow,
jit-ability, warm-start carry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.policies import (DEQMPCPolicy, PolicyConfig,
                                 compute_loss_deqmpc)


def _make_policy(layer_type="gcn", deq_iter=2, T=5, bsz=4):
    env = PendulumEnv()
    cfg = PolicyConfig(
        nx=env.nx, nu=env.nu, nq=1, T=T, dt=env.dt, bsz=bsz, hdim=32,
        layer_type=layer_type, deq_iter=deq_iter, fp_max_steps=6,
        solver_dtype=jnp.float64, max_newton_steps=4,
    )
    return DEQMPCPolicy(cfg, env), env


@pytest.mark.parametrize("layer_type", ["mlp", "gcn"])
def test_forward_shapes(layer_type):
    policy, env = _make_policy(layer_type=layer_type)
    params = policy.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((4, env.nx))
    policy_out, carry = policy.forward(params, obs, qp_solve=True)
    assert len(policy_out["trajs"]) == 2
    net_s, opt_s, acts = policy_out["trajs"][-1]
    assert net_s.shape == (4, 5, env.nx)
    assert opt_s.shape == (4, 5, env.nx)
    assert acts.shape == (4, 5, env.nu)
    assert carry.x.shape == (4, 5, env.nx)
    assert not bool(jnp.any(jnp.isnan(opt_s)))


def test_loss_and_gradients_flow():
    policy, env = _make_policy(layer_type="gcn")
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    bsz, T = 4, 5
    obs = jnp.asarray(rng.uniform(-1, 1, (bsz, env.nx)), jnp.float32)
    gt_states = jnp.asarray(rng.normal(size=(bsz, T, env.nx)), jnp.float32)
    gt_actions = jnp.asarray(rng.normal(size=(bsz, T, env.nu)), jnp.float32)
    mask = jnp.ones((bsz, T), jnp.float32)

    def loss_fn(p):
        policy_out, _ = policy.forward(p, obs, qp_solve=True)
        d = compute_loss_deqmpc(policy, gt_states, gt_actions, mask,
                                policy_out, x_init=policy_out["init_states"])
        return d["loss"], d

    (loss, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(grads)
    gnorm = float(jnp.linalg.norm(flat))
    assert np.isfinite(gnorm) and gnorm > 0
    assert d["losses_iter_opt"].shape == (2,)


def test_forward_jits():
    policy, env = _make_policy(layer_type="mlp", deq_iter=1)
    params = policy.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((4, env.nx))

    @jax.jit
    def run(p, o):
        policy_out, carry = policy.forward(p, o)
        return policy_out["trajs"][-1][1]

    out = run(params, obs)
    assert out.shape == (4, 5, env.nx)


def test_warm_start_carry():
    policy, env = _make_policy(layer_type="gcn", deq_iter=2)
    params = policy.init(jax.random.PRNGKey(0))
    obs = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (4, env.nx)),
                      jnp.float32)
    policy_out, carry = policy.forward(params, obs, qp_solve=True)
    # next receding-horizon step from the shifted carry
    obs2 = policy_out["trajs"][-1][1][:, 1]  # next state along the plan
    policy_out2, carry2 = policy.forward_warm_start(params, obs2, carry)
    assert len(policy_out2["trajs"]) == 2
    assert not bool(jnp.any(jnp.isnan(policy_out2["trajs"][-1][1])))
    # solver state advanced (rho clamped + grown)
    assert carry2.solver.lam.shape == carry.solver.lam.shape


def test_nn_policy_variant():
    from deqmpc_tpu.policies import NNMPCPolicy
    env = PendulumEnv()
    cfg = PolicyConfig(nx=env.nx, nu=env.nu, nq=1, T=5, dt=env.dt, bsz=4,
                       hdim=32, layer_type="mlp", solver_dtype=jnp.float64)
    policy = NNMPCPolicy(cfg, env)
    params = policy.init(jax.random.PRNGKey(0))
    policy_out, _ = policy.forward(params, jnp.zeros((4, env.nx)),
                                   qp_solve=False, lastqp_solve=True)
    assert len(policy_out["trajs"]) == 1
