"""f32 vs f64 control match (BASELINE.md target: controls within 1e-3).

The reference solves in f64 (`AL_mpc.py:261-263`); the TPU default is
f32 with a capped rho. This test checks the f32 solve's controls match
the f64 solve on the rexquad tracking problem — the triage gate for
the fp64->fp32 migration (SURVEY.md §7 hard part #2).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.envs import RexQuadrotor
from deqmpc_tpu.policies.tracking_mpc import TrackingMPC


def _solve(dtype, rho_max):
    env = RexQuadrotor()
    bsz, T = 16, 5
    tracking = TrackingMPC(env, T, al_iter=2, dtype=dtype, rho_max=rho_max,
                           max_newton_steps=6)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.2, 0.2, (bsz, env.nx)), jnp.float32)
    x_ref = jnp.broadcast_to(jnp.asarray(env.targ_pos, jnp.float32),
                             (bsz, T, env.nx))
    u_ref = jnp.full((bsz, T, env.nu), env.u_hover, jnp.float32)
    st = tracking.init_state(bsz)
    x, u, _, _ = tracking(x0, x_ref, u_ref, st, al_iters=4)
    return np.asarray(x), np.asarray(u)


@pytest.mark.slow
def test_f32_controls_match_f64():
    x64, u64 = _solve(jnp.float64, 1e8)
    x32, u32 = _solve(jnp.float32, 1e5)
    # control-sequence match within the BASELINE tolerance, relative to
    # the hover-scale control magnitude (~15)
    err = np.abs(u32 - u64).max()
    scale = np.abs(u64).max()
    assert err / scale < 1e-3, f"control mismatch {err} (scale {scale})"
    assert np.abs(x32 - x64).max() < 5e-3
