"""Gradient-ratio coefficient tests."""
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.policies import DEQMPCPolicy, PolicyConfig
from deqmpc_tpu.training.grad_coeffs import (compute_grad_ratio_coeffs,
                                             update_coeffs_ema)


def test_grad_ratios_shape_and_positive():
    env = PendulumEnv()
    cfg = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=env.dt, bsz=4, hdim=16,
                       layer_type="mlp", deq_iter=3, fp_max_steps=4,
                       solver_dtype=jnp.float64)
    policy = DEQMPCPolicy(cfg, env)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "obs": jnp.asarray(rng.uniform(-1, 1, (4, 2)), jnp.float32),
        "state": jnp.asarray(rng.normal(size=(4, 4, 2)), jnp.float32),
        "action": jnp.asarray(rng.normal(size=(4, 4, 1)), jnp.float32),
        "mask": jnp.ones((4, 4), jnp.float32),
    }
    ratios, lo, ln = compute_grad_ratio_coeffs(policy, params, batch)
    assert ratios.shape == (3,)
    assert bool(jnp.all(ratios > 0))
    assert bool(jnp.all(jnp.isfinite(ratios)))
    coeffs = jnp.ones((3, 3))
    c2 = update_coeffs_ema(coeffs, ratios)
    assert c2.shape == (3, 3)
    assert bool(jnp.all(jnp.isfinite(c2)))
