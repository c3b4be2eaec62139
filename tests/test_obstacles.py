"""Obstacle-MPC: top-k nearest selection + sphere constraints steer the
solution away from obstacles (`qpth/AL_mpc_custom.py` counterpart)."""
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.solvers import ALMPC, ObstacleSet, QuadCost
from deqmpc_tpu.solvers.al_core import lin_dyn_fns, obstacle_residuals
from deqmpc_tpu.solvers.types import LinDx


def _triple_integrator_3d(bsz, T, dt=0.2):
    """3-D single-integrator: x (pos 3), u (vel 3)."""
    nx, nu = 3, 3
    F = jnp.tile(
        jnp.concatenate([jnp.eye(nx), dt * jnp.eye(nu)], axis=1)[None, None],
        (bsz, T - 1, 1, 1),
    )
    f = jnp.zeros((bsz, T - 1, nx))
    return lin_dyn_fns(LinDx(F=F, f=f)), nx, nu


def test_obstacle_constraint_pushes_trajectory_away():
    bsz, T = 2, 8
    (dyn, dyn_jac), nx, nu = _triple_integrator_3d(bsz, T)
    # start at (-1,0,0), goal (1,0,0); obstacle at the origin
    x0 = jnp.tile(jnp.asarray([-1.0, 0.0, 0.0]), (bsz, 1))
    goal = jnp.asarray([1.0, 0.0, 0.0])
    n = nx + nu
    Q = jnp.tile(jnp.asarray([1.0] * nx + [0.1] * nu), (bsz, T, 1))
    q = -Q * jnp.tile(jnp.concatenate([goal, jnp.zeros(nu)]), (bsz, T, 1))
    cost = QuadCost(Q=Q, q=q, f=jnp.zeros((bsz, T)))

    radius = 0.3
    centers = jnp.zeros((40, 3)).at[1:].set(
        jnp.asarray(np.random.default_rng(0).uniform(5, 10, (39, 3))))
    obstacles = ObstacleSet(centers=centers, radius=radius)

    def solve(with_obs):
        mpc = ALMPC(nx, nu, T, u_lower=-5 * np.ones(nu), u_upper=5 * np.ones(nu),
                    dyn=dyn, dyn_jac=dyn_jac, dtype=jnp.float64,
                    obstacles=obstacles if with_obs else None, n_obs_sel=4)
        st = mpc.init_state(bsz)
        if with_obs:
            x_ref = jnp.broadcast_to(goal, (bsz, T, nx))
            mpc.select_obstacles(x_ref)
        x, u, _, _ = mpc.solve(x0, cost, st, al_iter=8)
        return x

    x_free = solve(False)
    x_obs = solve(True)
    min_dist_free = float(jnp.min(jnp.linalg.norm(x_free[..., :3], axis=-1)))
    min_dist_obs = float(jnp.min(jnp.linalg.norm(x_obs[..., :3], axis=-1)))
    # without constraint the straight line passes through the obstacle
    assert min_dist_free < radius
    # with constraint the trajectory clears (up to AL tolerance)
    assert min_dist_obs > radius - 0.02
    # obstacle residuals report feasibility
    sel = ObstacleSet(
        centers=jnp.broadcast_to(centers[:4], (bsz, T, 4, 3)), radius=radius)
    _, res_c = obstacle_residuals(x_obs, sel)
    assert float(res_c.max()) < 5e-2
