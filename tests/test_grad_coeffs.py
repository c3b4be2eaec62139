"""Gradient-ratio coefficient tests."""
import pytest
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


def test_out_head_path_nested():
    """The head lookup must find `out` anywhere in a nested params
    tree, and _set_at must splice copy-on-write."""
    from deqmpc_tpu.training.grad_coeffs import (_get_at, _out_head_path,
                                                 _set_at)

    params = {"model": {"cell": {"w": 1}, "out": {"kernel": 2}}}
    path = _out_head_path(params)
    assert path == ("model", "out")
    assert _get_at(params, path) == {"kernel": 2}
    p2 = _set_at(params, path, {"kernel": 7})
    assert p2["model"]["out"] == {"kernel": 7}
    assert params["model"]["out"] == {"kernel": 2}  # original untouched
    assert _out_head_path({"a": {"b": 1}}) is None


def _variant_batch(env, bsz=4, T=4, H=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "obs": jnp.asarray(rng.uniform(-1, 1, (bsz, H, env.nx)), jnp.float32),
        "obs_action": jnp.asarray(rng.normal(size=(bsz, H, env.nu)), jnp.float32),
        "state": jnp.asarray(rng.normal(size=(bsz, T, env.nx)), jnp.float32),
        "action": jnp.asarray(rng.normal(size=(bsz, T, env.nu)), jnp.float32),
        "mask": jnp.ones((bsz, T), jnp.float32),
    }


def _variant_grad_ratios_impl():
    from deqmpc_tpu.policies.policy_variants import (DEQMPCPolicyHistory,
                                                     DEQMPCPolicyMem)

    env = PendulumEnv()
    cfg = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=env.dt, bsz=4, hdim=16,
                       layer_type="mlp", deq_iter=2, fp_max_steps=4,
                       solver_dtype=jnp.float64)
    batch = _variant_batch(env)
    for policy in (DEQMPCPolicyMem(cfg, env),
                   DEQMPCPolicyHistory(cfg, env, H=3)):
        params = policy.init(jax.random.PRNGKey(0))
        ratios, _, _ = compute_grad_ratio_coeffs(policy, params, batch)
        assert ratios.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(ratios)))
        assert bool(jnp.all(ratios > 0))


@pytest.mark.slow
def test_grad_ratios_mem_and_history_variants():
    """--grad_coeff must work for variants, not just the base policy
    (it used to silently degrade to a no-op).

    Runs in a FRESH subprocess: the jacrev-over-Mem-policy program is
    the largest XLA:CPU compile in the suite, and compiling (or
    cache-deserializing) it after ~55 tests of accumulated process
    state segfaults XLA:CPU (3/3 full-suite runs in round 2, plus one
    reproduction this round — crash frames in
    `compilation_cache.get_executable_and_time` /
    `compiler.backend_compile_and_load`). The same body passes every
    time in a clean process, so the suite isolates it rather than
    carrying a known native crash."""
    import os
    import subprocess
    import sys

    if os.environ.get("DEQMPC_GRAD_COEFF_SUBPROC") == "1":
        _variant_grad_ratios_impl()
        return
    env = {**os.environ, "DEQMPC_GRAD_COEFF_SUBPROC": "1"}
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         f"{__file__}::test_grad_ratios_mem_and_history_variants",
         "-q", "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (
        f"subprocess run failed (rc={r.returncode}):\n"
        f"{r.stdout[-3000:]}\n{r.stderr[-2000:]}")
