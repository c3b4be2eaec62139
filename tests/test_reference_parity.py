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


@pytest.mark.slow
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


def test_streaming_warm_solve_match_and_rho_exit(ref_qpth):
    """Streaming mechanics parity (`AL_mpc.py:342-423`): put both
    implementations in the SAME warm state (previous solution, zeroed
    duals, clamped rho — the reference's warm_start_initialize zeroes
    lamda, `AL_mpc.py:589`) and compare the streaming solve and the
    rho-overflow exit status."""
    import types as _t

    import jax.numpy as jnp
    import torch

    from deqmpc_tpu.envs import PendulumEnv
    from deqmpc_tpu.policies.tracking_mpc import TrackingMPC
    from deqmpc_tpu.solvers import ALState

    AL_mpc, al_utils = ref_qpth
    env = PendulumEnv()
    bsz, T = 4, 5
    rho_init_max = 1e4
    rng = np.random.default_rng(2)
    x0 = np.concatenate([rng.uniform(-0.5, 0.5, (bsz, 1)),
                         rng.uniform(-0.5, 0.5, (bsz, 1))], axis=-1)
    x_ref = np.broadcast_to(
        np.asarray(env.targ_pos, np.float64), (bsz, T, env.nx)).copy()
    u_ref = np.zeros((bsz, T, env.nu))

    # ---- ours: cold solve, manual reference-style warm state, stream
    tracking = TrackingMPC(env, T, al_iter=2, dtype=jnp.float64,
                           rho_max=1e8)
    st = tracking.init_state(bsz)
    xs1, us1, _, st = tracking(jnp.asarray(x0), jnp.asarray(x_ref),
                               jnp.asarray(u_ref), st, al_iters=2)
    x0_next = np.asarray(env.dynamics(jnp.asarray(x0), us1[:, 0]))
    x_warm = st.x.at[:, -1:].set(jnp.asarray(x_ref[:, -1:]))
    u_warm = st.u.at[:, -1:].set(jnp.asarray(u_ref[:, -1:]))
    st_warm = ALState(lam=jnp.zeros_like(st.lam),
                      rho=jnp.minimum(st.rho, rho_init_max),
                      x=x_warm, u=u_warm,
                      has_init=jnp.ones((bsz,), bool))
    xs2, us2, status2, _ = tracking(jnp.asarray(x0_next),
                                    jnp.asarray(x_ref), jnp.asarray(u_ref),
                                    st_warm, al_iters=8, streaming=True)
    assert bool(status2.all()), "rho-cap exit must trigger at al_iters=8"

    # ---- reference: cold solve, warm_start_initialize, stream
    dt = torch.float64
    dx, dx_jac = _torch_bridge(env)
    mpc = AL_mpc.MPC(
        env.nx, env.nu, T,
        u_lower=torch.tensor(np.asarray(env.action_space.low), dtype=dt),
        u_upper=torch.tensor(np.asarray(env.action_space.high), dtype=dt),
        al_iter=2, exit_unconverged=False, eps=1e-2, n_batch=bsz,
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
        mpc.forward(torch.tensor(x0, dtype=dt), cost, dx, dx_jac, None,
                    u_init=torch.tensor(u_ref, dtype=dt),
                    x_init=torch.tensor(x_ref, dtype=dt))
        # the reference stores the f32-rounded solution as the warm
        # start (`al_solve` returns x.float(), forward clones it); feed
        # it our (f64) solution for a bit-identical starting state, with
        # the last knot replaced as Tracking_MPC.warm_start_initialize
        # does (`policies.py:1305-1310`)
        x_init_t = torch.tensor(np.asarray(st.x), dtype=dt)
        u_init_t = torch.tensor(np.asarray(st.u), dtype=dt)
        x_init_t[:, -1:] = torch.tensor(x_ref[:, -1:], dtype=dt)
        u_init_t[:, -1:] = torch.tensor(u_ref[:, -1:], dtype=dt)
        mpc.al_iter = 8
        mpc.warm_start_initialize(x_init_t, u_init_t,
                                  _t.SimpleNamespace(rho_init_max=rho_init_max))
        x_t, u_t, status_t = mpc.forward(
            torch.tensor(x0_next, dtype=dt), cost, dx, dx_jac, None)
    assert status_t is True
    np.testing.assert_allclose(np.asarray(us2), u_t.double().numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(xs2), x_t.double().numpy(),
                               atol=1e-3)
