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


def test_ip_sqp_control_sequence_match(ref_qpth):
    """IP/SQP-path parity (`/root/reference/qpth/qp_wrapper.py:210-293`):
    drive the reference's interior-point MPC (DenseQPFunction with
    nonlinear residuals inside the IPM) read-only as an oracle on the
    pendulum and compare against our IPMPC SQP loop run to convergence.
    Both solve the same box-constrained NLP; at convergence the control
    sequences must agree within the BASELINE tolerance."""
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import qpth.qp_wrapper as ip_mpc
    from qpth import qp  # noqa: F401  (DenseQPFunction path)

    from deqmpc_tpu.envs import PendulumEnv
    from deqmpc_tpu.solvers.ip_mpc import IPMPC
    from deqmpc_tpu.solvers.types import QuadCost as OurQuadCost

    import jax
    import jax.numpy as jnp

    env = PendulumEnv()
    bsz, T = 4, 5
    rng = np.random.default_rng(3)
    th = rng.uniform(-1.5, 1.5, (bsz, 1))
    thdot = rng.uniform(-1.0, 1.0, (bsz, 1))
    x0 = np.concatenate([th, thdot], axis=-1)
    x_ref = np.broadcast_to(
        np.asarray(env.targ_pos, np.float64), (bsz, T, env.nx)).copy()
    u_ref = np.zeros((bsz, T, env.nu))
    Qd = np.concatenate([np.asarray(env.Qlqr), np.asarray(env.Rlqr)])
    xu_ref = np.concatenate([x_ref, u_ref], axis=-1)

    # shared initialization: u = 0, x = rollout(x0, 0) (the reference's
    # default when x_init is None, `qp_wrapper.py:272`)
    dyn = jax.jit(env.dynamics)
    xs = [jnp.asarray(x0)]
    for t in range(T - 1):
        xs.append(dyn(xs[-1], jnp.zeros((bsz, env.nu))))
    x_init = np.asarray(jnp.stack(xs, axis=1))

    # ---- ours: SQP around the batched PDIPM, run to convergence
    def our_dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], axis=-1)

    mpc = IPMPC(env.nx, env.nu, T,
                u_lower=np.asarray(env.action_space.low),
                u_upper=np.asarray(env.action_space.high),
                dyn=env.dynamics, dyn_jac=our_dyn_jac,
                qp_iter=10, ipm_iters=25, eps=1e-6, dtype=jnp.float64)
    cost = OurQuadCost(
        Q=jnp.asarray(np.broadcast_to(Qd, (bsz, T, env.nx + env.nu))),
        q=jnp.asarray(-Qd * xu_ref),
        f=jnp.zeros((bsz, T)),
    )
    xs_ours, us_ours = mpc.solve(
        jnp.asarray(x0), cost,
        x_init=jnp.asarray(x_init),
        u_init=jnp.asarray(u_ref))
    xs_ours, us_ours = np.asarray(xs_ours), np.asarray(us_ours)

    # ---- reference: qp_wrapper.MPC, solve_nonlin to convergence
    dt = torch.float64
    dx, dx_jac = _torch_bridge(env)
    ref = ip_mpc.MPC(
        env.nx, env.nu, T,
        u_lower=torch.tensor(np.asarray(env.action_space.low), dtype=dt),
        u_upper=torch.tensor(np.asarray(env.action_space.high), dtype=dt),
        qp_iter=10, eps=1e-6, n_batch=bsz, backprop=False, verbose=-1,
        exit_unconverged=False, detach_unconverged=False,
        grad_method=ip_mpc.GradMethods.ANALYTIC, solver_type="dense",
        single_qp_solve=False,
        # .contiguous(): torch.tensor preserves the numpy transpose's
        # strides here, and the reference's linearize_dynamics uses
        # .view on u (`qp_wrapper.py:472`) which requires contiguity —
        # the reference's own Tracking_MPC `u_init.transpose(0,1)`
        # (`policies.py:1267`) would hit the same RuntimeError.
        u_init=torch.tensor(
            np.ascontiguousarray(u_ref.transpose(1, 0, 2)), dtype=dt),
    )
    C = torch.diag(torch.tensor(Qd, dtype=dt)).repeat(T, bsz, 1, 1)
    c = torch.tensor(-Qd * xu_ref, dtype=dt).transpose(0, 1)
    with torch.no_grad():
        x_t, u_t = ref.forward(
            torch.tensor(x0, dtype=dt),
            ip_mpc.QuadCost(C, c), dx, dx_jac)
    xs_ref = x_t.detach().numpy().transpose(1, 0, 2)
    us_ref = u_t.detach().numpy().transpose(1, 0, 2)

    assert np.isfinite(us_ref).all() and np.isfinite(us_ours).all()
    np.testing.assert_allclose(us_ours, us_ref, atol=1e-3)
    np.testing.assert_allclose(xs_ours, xs_ref, atol=1e-3)


def test_lastqp_final_solve_match(ref_qpth):
    """diff-mpc (lastqp) semantics parity (`policies.py:195-197`): the
    single-shot variants skip the per-iteration solves and run one
    final al_iters=10 tracking solve from the network's proposal. Feed
    both implementations the SAME synthetic proposal (an interpolated
    swing-up guess, standing in for the DEQ output) and compare the
    final solve."""
    import jax.numpy as jnp
    import torch

    AL_mpc, al_utils = ref_qpth
    from deqmpc_tpu.envs import PendulumEnv
    from deqmpc_tpu.policies.tracking_mpc import TrackingMPC

    env = PendulumEnv()
    bsz, T = 4, 5
    rng = np.random.default_rng(4)
    x0 = np.concatenate([rng.uniform(-2.0, 2.0, (bsz, 1)),
                         rng.uniform(-1.0, 1.0, (bsz, 1))], axis=-1)
    # synthetic network proposal: linear interpolation x0 -> goal plus
    # noise, a plausible stand-in for a mid-training DEQ output
    alpha = np.linspace(0, 1, T)[None, :, None]
    x_prop = (1 - alpha) * x0[:, None] + alpha * np.asarray(env.targ_pos)
    x_prop += rng.normal(scale=0.05, size=x_prop.shape)
    u_prop = rng.normal(scale=0.1, size=(bsz, T, env.nu))

    xs_ours, us_ours = _solve_ours(env, x0, x_prop, u_prop, al_iters=10)
    xs_ref, us_ref = _solve_reference(ref_qpth, env, x0, x_prop, u_prop,
                                      al_iters=10)

    assert np.isfinite(us_ref).all() and np.isfinite(us_ours).all()
    np.testing.assert_allclose(us_ours, us_ref, atol=1e-3)
    np.testing.assert_allclose(xs_ours, xs_ref, atol=1e-3)
