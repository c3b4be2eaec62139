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


def test_obstacle_net_input_policy_forward():
    """Policy with `obstacle_net_input`: per-knot nearest-sphere
    features reach the network (output depends on the field) while
    `obstacle_constraints=False` keeps the same parameter tree for the
    constraint-row ablation (scripts/eval_obstacles.py arm b)."""
    import dataclasses

    from deqmpc_tpu.envs import make_env
    from deqmpc_tpu.policies import DEQMPCPolicy, PolicyConfig

    env = make_env("FlyingCartpole_obstacles")
    obstacles = ObstacleSet(centers=jnp.asarray(env.obstacle_positions),
                            radius=float(env.obstacle_radius))
    cfg = PolicyConfig(
        nx=env.nx, nu=env.nu, nq=7, T=4, dt=env.dt, bsz=2, hdim=16,
        deq_iter=2, solver_dtype=jnp.float32, rho_max=1e5,
        obstacle_net_input=True,
    )
    pol = DEQMPCPolicy(cfg, env, obstacles=obstacles)
    params = pol.init(jax.random.PRNGKey(0))
    x0 = env.reset(jax.random.PRNGKey(1), 2).astype(jnp.float32)
    po, _ = pol.forward(params, x0, qp_solve=True)
    nom_x, _, nom_u = po["trajs"][-1]
    assert bool(jnp.isfinite(nom_x).all()) and bool(jnp.isfinite(nom_u).all())

    # the network must actually see the field: shifting every center
    # changes the proposal (a blind net would be invariant)
    shifted = ObstacleSet(centers=obstacles.centers + 0.5,
                          radius=obstacles.radius)
    pol_shift = DEQMPCPolicy(cfg, env, obstacles=shifted)
    po_s, _ = pol_shift.forward(params, x0, qp_solve=False)
    po_b, _ = pol.forward(params, x0, qp_solve=False)
    assert float(jnp.abs(po_s["trajs"][-1][0] - po_b["trajs"][-1][0]).max()) > 1e-6

    # ablation arm: same params, solver constraint rows off
    cfg_unc = dataclasses.replace(cfg, obstacle_constraints=False)
    pol_unc = DEQMPCPolicy(cfg_unc, env, obstacles=obstacles)
    po_u, _ = pol_unc.forward(params, x0, qp_solve=True)
    assert bool(jnp.isfinite(po_u["trajs"][-1][1]).all())
