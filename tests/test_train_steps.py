"""End-to-end train-step tests: estpred plumbing, the streaming
training step's window alignment, and the f64 CLI mode.

These cover the training-harness seams the reference exercises only
implicitly (`/root/reference/deqmpc/train.py:293-336` train loop,
`:142-148,323-325` streaming schedule, `policies.py:317-407` estpred).
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.training import train as train_mod

ENV = PendulumEnv()
BSZ, T, H = 4, 4, 3


def _args(**kw):
    defaults = dict(
        env="pendulum", T=T, H=1, qp_iter=1, lr=1e-3, bsz=BSZ, deq=True,
        hdim=16, deq_iter=2, seed=0, layer_type="mlp", kernel_width=3,
        model_type="deq-mpc-deq", lastqp_solve=False, qp_solve=True,
        solver_type="al", dtype="float32", deq_out_type=1, policy_out_type=1,
        loss_type="l1", deq_reg=0.1, grad_coeff=False, rho_init_max=1e4,
        rho_max=None, fp_type="anderson", grad_type="fp_grad", addmem=False,
        streaming=False, streaming_steps=2, deq_type="deq",
        policy_variant="base", Qscale=1.0, m=5, max_steps=4, nq=-1,
    )
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def _batch(horizon, H=H, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "obs": jnp.asarray(rng.uniform(-1, 1, (BSZ, H, ENV.nx)), jnp.float32),
        "obs_action": jnp.asarray(rng.normal(size=(BSZ, H, ENV.nu)),
                                  jnp.float32),
        "state": jnp.asarray(rng.normal(size=(BSZ, horizon, ENV.nx)),
                             jnp.float32),
        "action": jnp.asarray(rng.normal(size=(BSZ, horizon, ENV.nu)),
                              jnp.float32),
        "mask": jnp.ones((BSZ, horizon), jnp.float32),
    }


def test_estpred_train_step_end_to_end():
    """`--policy_variant estpred` must train: the loss_fn plumbs
    batch["obs_action"] (u_gt_est) into the estimator and logs the
    per-iteration x_est losses (`policies.py:329,373,624-691`)."""
    args = _args(policy_variant="estpred", H=H)
    policy = train_mod.build_policy(args, ENV)
    params = policy.init(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.clip_by_global_norm(2.0), optax.adam(1e-3))
    opt_state = optimizer.init(params)
    train_step, loss_fn = train_mod.make_train_step(policy, optimizer, args)
    batch = _batch(T)
    coeffs = jnp.ones((args.deq_iter, 3))
    params2, opt_state, loss, aux, gnorm = train_step(
        params, opt_state, batch, coeffs
    )
    assert np.isfinite(float(loss))
    assert float(gnorm) > 0
    assert "losses_x_ests" in aux
    assert aux["losses_x_ests"].shape == (args.deq_iter,)
    assert bool(jnp.all(jnp.isfinite(aux["losses_x_ests"])))
    # params actually moved
    d0 = jax.tree_util.tree_leaves(params)[0]
    d1 = jax.tree_util.tree_leaves(params2)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


@pytest.mark.slow
def test_streaming_train_step_window_alignment():
    """The streaming loss must supervise warm-started forward l with
    the window batch["state"][:, l:l+T] (reference schedule
    `train.py:142-148,323-325`)."""
    L = 2
    args = _args(streaming=True, streaming_steps=L, H=1)
    policy = train_mod.build_policy(args, ENV)
    params = policy.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train_step, loss_fn = train_mod.make_streaming_train_step(
        policy, optimizer, args
    )
    batch = _batch(T + L, H=1)
    coeffs = jnp.ones((args.deq_iter, 3))

    # intercept the supervision slices fed to the loss
    seen = []
    orig = train_mod.compute_loss_deqmpc

    def spy(policy, gt_states, gt_actions, gt_mask, policy_out, **kw):
        seen.append(np.asarray(gt_states))
        return orig(policy, gt_states, gt_actions, gt_mask, policy_out, **kw)

    train_mod.compute_loss_deqmpc = spy
    try:
        loss, aux = loss_fn(params, batch, coeffs)
    finally:
        train_mod.compute_loss_deqmpc = orig
    assert len(seen) == L + 1
    for l in range(L + 1):
        np.testing.assert_array_equal(
            seen[l], np.asarray(batch["state"][:, l:l + T])
        )
    assert np.isfinite(float(loss))

    # the jitted step produces finite grads and updates params
    params2, opt_state, loss, aux, gnorm = train_step(
        params, opt_state, batch, coeffs
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_checkpoint_lenient_load_old_layout(tmp_path):
    """Checkpoints written before a param was added (e.g. the base
    layer's `iter_emb`) must still load: missing leaves keep their
    init values, present leaves restore exactly."""
    from flax import serialization

    from deqmpc_tpu.training.train import _from_bytes_lenient

    old = {"cell": {"w": np.ones((2, 2), np.float32)},
           "out": {"k": np.full((3,), 2.0, np.float32)}}
    blob = serialization.to_bytes(old)
    template = {"cell": {"w": np.zeros((2, 2), np.float32)},
                "out": {"k": np.zeros((3,), np.float32)},
                "iter_emb": np.full((4,), 7.0, np.float32)}
    restored = _from_bytes_lenient(template, blob)
    np.testing.assert_array_equal(restored["cell"]["w"], old["cell"]["w"])
    np.testing.assert_array_equal(restored["out"]["k"], old["out"]["k"])
    np.testing.assert_array_equal(restored["iter_emb"], template["iter_emb"])
    # exact-match layout still round-trips bit-exact
    same = _from_bytes_lenient({"cell": {"w": np.zeros((2, 2), np.float32)},
                                "out": {"k": np.zeros((3,), np.float32)}},
                               blob)
    np.testing.assert_array_equal(same["out"]["k"], old["out"]["k"])


def test_dtype_double_solver_runs_f64():
    """--dtype double must actually produce an f64 solve (x64 is on in
    tests; the CLI wires jax_enable_x64 itself — reference solves in
    f64, `AL_mpc.py:261-263`)."""
    args = _args(dtype="double")
    policy = train_mod.build_policy(args, ENV)
    assert policy.cfg.solver_dtype == jnp.float64
    assert policy.cfg.rho_max == 1e8
    params = policy.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((BSZ, ENV.nx), jnp.float32).at[:, 0].set(0.3)
    po, _ = policy.forward(params, obs)
    _, opt_states, actions = po["trajs"][-1]
    assert opt_states.dtype == jnp.float64
    assert bool(jnp.all(jnp.isfinite(opt_states)))
