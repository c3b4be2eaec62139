"""Cross-implementation parity: our AL solver vs the reference solver.

BASELINE.md north-star target: rex_quadrotor DEQ-MPC control-sequence
match vs the reference within 1e-3 (T=5). The reference PyTorch
implementation (`/root/reference/qpth/AL_mpc.py`) is run READ-ONLY as
a test oracle on the SAME dynamics (our JAX dynamics called through a
numpy bridge), the same cost, and the same initialization — none of
its code is vendored. Skipped when the reference tree is absent.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "qpth")),
    reason="reference implementation not available",
)


@pytest.fixture(scope="module")
def ref_qpth():
    torch = pytest.importorskip("torch")
    # the reference imports ipdb (debug trap, `qpth/util.py:3`) and
    # cvxpy (optional fallback) unconditionally; stub them
    for name in ("ipdb", "cvxpy"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.set_trace = lambda: None
            sys.modules[name] = m
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from qpth import AL_mpc, al_utils

    return AL_mpc, al_utils


def _torch_bridge(env):
    """Wrap our JAX dynamics as the torch callables the reference
    expects (`deqmpc/policies.py:1126-1127`): dx(x,u)->x', and
    dx_jac(x,u)->(x', (Jx, Ju))."""
    import jax
    import jax.numpy as jnp
    import torch

    dyn = jax.jit(env.dynamics)
    jac = jax.jit(env.dynamics_derivatives)

    def dx(x, u):
        out = dyn(jnp.asarray(x.detach().cpu().numpy()),
                  jnp.asarray(u.detach().cpu().numpy()))
        return torch.from_numpy(np.asarray(out)).to(x.dtype)

    def dx_jac(x, u):
        xn, (Jx, Ju) = jac(jnp.asarray(x.detach().cpu().numpy()),
                           jnp.asarray(u.detach().cpu().numpy()))
        t = lambda a: torch.from_numpy(np.asarray(a)).to(x.dtype)
        return t(xn), (t(Jx), t(Ju))

    return dx, dx_jac


def _solve_ours(env, x0, x_ref, u_ref, al_iters):
    import jax.numpy as jnp

    from deqmpc_tpu.policies.tracking_mpc import TrackingMPC

    bsz = x0.shape[0]
    tracking = TrackingMPC(env, x_ref.shape[1], al_iter=al_iters,
                           dtype=jnp.float64, rho_max=1e8)
    st = tracking.init_state(bsz)
    xs, us, _, _ = tracking(jnp.asarray(x0), jnp.asarray(x_ref),
                            jnp.asarray(u_ref), st, al_iters=al_iters)
    return np.asarray(xs), np.asarray(us)


def _solve_reference(ref_qpth, env, x0, x_ref, u_ref, al_iters):
    """Drive the reference exactly as its Tracking_MPC does
    (`policies.py:1236-1283`): diagonal Q=diag([Qlqr,Rlqr]),
    p=-Q*xu_ref, f=0.5*xu_ref'Q xu_ref, x/u initialized at the refs."""
    import torch

    AL_mpc, al_utils = ref_qpth
    bsz, T = x_ref.shape[0], x_ref.shape[1]
    dt = torch.float64
    dx, dx_jac = _torch_bridge(env)

    mpc = AL_mpc.MPC(
        env.nx, env.nu, T,
        u_lower=torch.tensor(np.asarray(env.action_space.low), dtype=dt),
        u_upper=torch.tensor(np.asarray(env.action_space.high), dtype=dt),
        al_iter=al_iters, exit_unconverged=False, eps=1e-2, n_batch=bsz,
        backprop=False, verbose=0, solver_type="dense", dtype=dt,
    )
    mpc.reinitialize(torch.zeros(bsz, env.nx, dtype=dt),
                     torch.ones(bsz, T, 1, dtype=dt))

    Qd = torch.tensor(np.concatenate([np.asarray(env.Qlqr),
                                      np.asarray(env.Rlqr)]), dtype=dt)
    Q = torch.diag(Qd).repeat(bsz, T, 1, 1)
    xu_ref = torch.tensor(np.concatenate([x_ref, u_ref], axis=-1), dtype=dt)
    p = -(Q * xu_ref.unsqueeze(-2)).sum(dim=-1)
    f = 0.5 * (xu_ref * (Q * xu_ref.unsqueeze(-2)).sum(dim=-1)).sum(dim=-1)
    cost = al_utils.QuadCost(Q, p, f)

    with torch.no_grad():
        x, u, _ = mpc.forward(
            torch.tensor(x0, dtype=dt), cost, dx, dx_jac, None,
            u_init=torch.tensor(u_ref, dtype=dt),
            x_init=torch.tensor(x_ref, dtype=dt),
        )
    return x.double().numpy(), u.double().numpy()


def test_rexquad_control_sequence_match(ref_qpth):
    """The BASELINE.json north-star parity metric."""
    from deqmpc_tpu.envs import RexQuadrotor

    env = RexQuadrotor()
    bsz, T, al_iters = 4, 5, 6
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-0.3, 0.3, (bsz, env.nx))
    x_ref = np.broadcast_to(
        np.asarray(env.targ_pos, np.float64), (bsz, T, env.nx)).copy()
    u_ref = np.full((bsz, T, env.nu), float(env.u_hover))

    xs_ours, us_ours = _solve_ours(env, x0, x_ref, u_ref, al_iters)
    xs_ref, us_ref = _solve_reference(ref_qpth, env, x0, x_ref, u_ref,
                                      al_iters)

    assert np.isfinite(us_ref).all() and np.isfinite(us_ours).all()
    np.testing.assert_allclose(us_ours, us_ref, atol=1e-3)
    np.testing.assert_allclose(xs_ours, xs_ref, atol=1e-3)


def test_pendulum_control_sequence_match_active_box(ref_qpth):
    """Swing-up start: the torque box constraint is active, so this
    also checks the inequality dual handling agrees."""
    from deqmpc_tpu.envs import PendulumEnv

    env = PendulumEnv()
    bsz, T, al_iters = 4, 5, 6
    rng = np.random.default_rng(1)
    th = rng.uniform(-np.pi, np.pi, (bsz, 1))
    thdot = rng.uniform(-1.0, 1.0, (bsz, 1))
    x0 = np.concatenate([th, thdot], axis=-1)
    x_ref = np.broadcast_to(
        np.asarray(env.targ_pos, np.float64), (bsz, T, env.nx)).copy()
    u_ref = np.zeros((bsz, T, env.nu))

    xs_ours, us_ours = _solve_ours(env, x0, x_ref, u_ref, al_iters)
    xs_ref, us_ref = _solve_reference(ref_qpth, env, x0, x_ref, u_ref,
                                      al_iters)

    assert np.isfinite(us_ref).all() and np.isfinite(us_ours).all()
    np.testing.assert_allclose(us_ours, us_ref, atol=1e-3)
    np.testing.assert_allclose(xs_ours, xs_ref, atol=1e-3)
