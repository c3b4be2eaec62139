"""Forward + gradient smoke tests for every DEQ layer / policy variant."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.policies import PolicyConfig, compute_loss_deqmpc
from deqmpc_tpu.policies.policy_variants import (DEQMPCPolicyFeedback,
                                                 DEQMPCPolicyHistory,
                                                 DEQMPCPolicyHistoryEstPred,
                                                 DEQMPCPolicyMem,
                                                 DEQMPCPolicyQ)

ENV = PendulumEnv()
BSZ, T, H = 4, 5, 3


def _cfg(layer_type="gcn", **kw):
    return PolicyConfig(
        nx=ENV.nx, nu=ENV.nu, nq=1, T=T, dt=ENV.dt, bsz=BSZ, hdim=32,
        layer_type=layer_type, deq_iter=2, fp_max_steps=5,
        solver_dtype=jnp.float64, **kw,
    )


def _batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return (
        jnp.asarray(rng.uniform(-1, 1, (BSZ, ENV.nx)), jnp.float32),
        jnp.asarray(rng.normal(size=(BSZ, T, ENV.nx)), jnp.float32),
        jnp.asarray(rng.normal(size=(BSZ, T, ENV.nu)), jnp.float32),
        jnp.ones((BSZ, T), jnp.float32),
    )


def _grad_check(policy, params, forward_fn, gt):
    gt_s, gt_a, mask = gt

    def loss_fn(p):
        policy_out, _ = forward_fn(p)
        d = compute_loss_deqmpc(policy, gt_s, gt_a, mask, policy_out)
        return d["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    flat, _ = ravel_pytree(grads)
    assert np.isfinite(float(loss))
    assert bool(jnp.all(jnp.isfinite(flat)))
    assert float(jnp.linalg.norm(flat)) > 0


@pytest.mark.slow
def test_mem_policy():
    policy = DEQMPCPolicyMem(_cfg(), ENV)
    params = policy.init(jax.random.PRNGKey(0))
    obs, gt_s, gt_a, mask = _batch()
    po, carry = policy.forward(params, obs)
    assert len(po["trajs"]) == 2
    _grad_check(policy, params, lambda p: policy.forward(p, obs),
                (gt_s, gt_a, mask))


@pytest.mark.slow
def test_history_policy():
    policy = DEQMPCPolicyHistory(_cfg(), ENV, H=H)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    obs_hist = jnp.asarray(rng.uniform(-1, 1, (BSZ, H, ENV.nx)), jnp.float32)
    _, gt_s, gt_a, mask = _batch()
    po, _ = policy.forward(params, obs_hist)
    assert po["trajs"][-1][1].shape == (BSZ, T, ENV.nx)
    _grad_check(policy, params, lambda p: policy.forward(p, obs_hist),
                (gt_s, gt_a, mask))


@pytest.mark.slow
def test_history_estpred_policy():
    policy = DEQMPCPolicyHistoryEstPred(_cfg(), ENV, H=H)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    obs_hist = jnp.asarray(rng.uniform(-1, 1, (BSZ, H, ENV.nx)), jnp.float32)
    u_hist = jnp.asarray(rng.normal(size=(BSZ, H, ENV.nu)), jnp.float32)
    _, gt_s, gt_a, mask = _batch()
    po, _ = policy.forward(params, obs_hist, u_hist)
    assert len(po["nominal_x_ests"]) == 2
    assert po["nominal_x_ests"][0][0].shape == (BSZ, H, ENV.nx)
    _grad_check(policy, params, lambda p: policy.forward(p, obs_hist, u_hist),
                (gt_s, gt_a, mask))


def test_feedback_policy():
    policy = DEQMPCPolicyFeedback(_cfg(), ENV)
    params = policy.init(jax.random.PRNGKey(0))
    obs, gt_s, gt_a, mask = _batch(3)
    po, _ = policy.forward(params, obs)
    assert len(po["trajs"]) == 2
    _grad_check(policy, params, lambda p: policy.forward(p, obs),
                (gt_s, gt_a, mask))


def test_q_policy_scales_cost():
    policy = DEQMPCPolicyQ(_cfg(), ENV)
    params = policy.init(jax.random.PRNGKey(0))
    obs, gt_s, gt_a, mask = _batch(4)
    po, _ = policy.forward(params, obs)
    assert len(po["q_scaling"]) == 2
    q = po["q_scaling"][0]
    assert q.shape == (BSZ, T)
    np.testing.assert_allclose(np.asarray(q[:, 0]), 1.0)  # knot 0 pinned
    assert bool(jnp.all(q >= 0))
    _grad_check(policy, params, lambda p: policy.forward(p, obs),
                (gt_s, gt_a, mask))


def test_delta_layer():
    from deqmpc_tpu.models.deq_layer import DEQLayerConfig
    from deqmpc_tpu.models.deq_layer_variants import DEQLayerDelta

    mcfg = DEQLayerConfig(nx=2, nu=1, nq=1, T=T, dt=0.05, hdim=32,
                          layer_type="mlp", deq_iter=2)
    layer = DEQLayerDelta(mcfg)
    params = layer.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((BSZ, 2))
    aux = {"x": jnp.zeros((BSZ, T, 2)), "u": jnp.zeros((BSZ, T, 1)),
           "z": layer.init_z(BSZ), "iter": 1}
    out_mpc, out_aux = layer(params, {"o": obs}, aux)
    assert out_mpc["x_ref"].shape == (BSZ, T, 2)


def test_delta_policy():
    """`--policy_variant delta` end-to-end: forward, gradients, and the
    trainer's update_scales EMA on the optimizer trajectories
    (reference `policies.py:92` + `deq_layer_utils.py:55-63`)."""
    from deqmpc_tpu.models.grad_layers import update_scales
    from deqmpc_tpu.policies.policy_variants import DEQMPCPolicyDelta

    policy = DEQMPCPolicyDelta(_cfg(), ENV)
    assert policy.is_delta
    params = policy.init(jax.random.PRNGKey(0))
    assert params["scales"].shape == (2, T - 1, ENV.nx)
    obs, gt_s, gt_a, mask = _batch(5)
    po, carry = policy.forward(params, obs)
    assert len(po["trajs"]) == 2
    _grad_check(policy, params, lambda p: policy.forward(p, obs),
                (gt_s, gt_a, mask))
    # scales receive gradient (reference ScaleMultiplyLayer backward
    # returns grad_output * input for the scale, deq_layer_utils.py:53)
    def loss_fn(p):
        pol_out, _ = policy.forward(p, obs)
        return compute_loss_deqmpc(policy, gt_s, gt_a, mask, pol_out)["loss"]

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.linalg.norm(grads["scales"])) > 0
    # trainer-side EMA: scale row 0 tracks |gt - init| medians
    opt_states = jnp.stack([t[1] for t in po["trajs"]])
    new_scales = update_scales(params["scales"], list(opt_states), gt_s,
                               po["init_states"])
    assert new_scales.shape == params["scales"].shape
    err0 = jnp.median(jnp.abs(gt_s[:, 1:] - po["init_states"][:, 1:]), axis=0)
    np.testing.assert_allclose(
        np.asarray(new_scales[0]),
        np.asarray(params["scales"][0] * 0.98 + 0.02 * err0), rtol=1e-5)
