"""Solver->network re-entrancy (`recompute_Qq`).

The reference's AL solver can call back into the network mid-solve to
re-derive the tracking cost at the current iterate
(`qpth/AL_mpc.py:301,318,549-556`; closure chain
`deqmpc/policies.py:165,261-270,1273,1312-1315`). Default-off there
(`AL_mpc.py:173`) and here.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.envs import PendulumEnv
from deqmpc_tpu.policies import DEQMPCPolicy, PolicyConfig
from deqmpc_tpu.solvers import ALMPC, QuadCost


def _setup(bsz=4, T=5):
    env = PendulumEnv()
    nx, nu = 2, 1
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (bsz, nx)))
    x_ref = jnp.tile(jnp.asarray([np.pi, 0.0]), (bsz, T, 1))
    Qd = jnp.tile(jnp.asarray(np.concatenate([env.Qlqr, env.Rlqr])),
                  (bsz, T, 1))
    q0 = -Qd * jnp.concatenate([x_ref, jnp.zeros((bsz, T, nu))], -1)
    cost0 = QuadCost(Q=Qd, q=q0, f=jnp.zeros((bsz, T)))

    def dyn_jac(x, u):
        xn, (Jx, Ju) = env.dynamics_derivatives(x, u)
        return xn, jnp.concatenate([Jx, Ju], -1)

    mpc = ALMPC(nx, nu, T, u_lower=env.action_space.low,
                u_upper=env.action_space.high,
                dyn=env.dynamics, dyn_jac=dyn_jac, dtype=jnp.float64)
    return env, mpc, x0, cost0, Qd


def test_recompute_qq_matches_eager_two_step():
    """One solve with compute_Qq == two chained solves where the cost is
    refreshed by hand between them (the VERDICT-mandated eager
    reference)."""
    env, mpc, x0, cost0, Qd = _setup()

    # a stand-in "network": pull the reference toward a blend of the
    # iterate and the goal (any fixed traced function works)
    def net(xu):
        goal = jnp.concatenate(
            [jnp.tile(jnp.asarray([np.pi, 0.0]), xu.shape[:2] + (1,)),
             jnp.zeros(xu.shape[:2] + (1,))], -1)
        return 0.7 * goal + 0.3 * xu

    def compute_Qq(xu):
        return Qd, -Qd * net(xu)

    st = mpc.init_state(x0.shape[0])
    xA, uA, _, _ = mpc.solve(x0, cost0, st, al_iter=2,
                             compute_Qq=compute_Qq)

    # eager two-step: solve 1 AL iter on cost0, refresh by hand, solve
    # the 2nd AL iter on the refreshed cost with the carried state
    st = mpc.init_state(x0.shape[0])
    x1, u1, _, st1 = mpc.solve(x0, cost0, st, al_iter=1)
    xu1 = jnp.concatenate([x1, u1], -1)
    Q1, q1 = compute_Qq(xu1)
    cost1 = QuadCost(Q=Q1, q=q1, f=jnp.zeros_like(cost0.f))
    xB, uB, _, _ = mpc.solve(x0, cost1, st1, al_iter=1)

    np.testing.assert_allclose(np.asarray(xA), np.asarray(xB),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(uA), np.asarray(uB),
                               rtol=0, atol=1e-10)


def test_recompute_qq_identity_is_noop():
    """A compute_Qq that returns the original cost must not change the
    solution."""
    env, mpc, x0, cost0, Qd = _setup()
    st = mpc.init_state(x0.shape[0])
    xA, uA, _, _ = mpc.solve(x0, cost0, st, al_iter=3)
    st = mpc.init_state(x0.shape[0])
    xB, uB, _, _ = mpc.solve(x0, cost0, st, al_iter=3,
                             compute_Qq=lambda xu: (cost0.Q, cost0.q))
    np.testing.assert_allclose(np.asarray(xA), np.asarray(xB), atol=1e-12)
    np.testing.assert_allclose(np.asarray(uA), np.asarray(uB), atol=1e-12)


def test_policy_recompute_qq_end_to_end():
    """--recompute_Qq must be trainable: the full policy forward with
    the network<->solver loop jits, returns finite trajectories and a
    finite loss gradient."""
    from deqmpc_tpu.policies import compute_loss_deqmpc

    env = PendulumEnv()
    cfg = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=env.dt, bsz=4, hdim=16,
                       layer_type="mlp", deq_iter=2, fp_max_steps=4,
                       solver_dtype=jnp.float64, recompute_Qq=True)
    policy = DEQMPCPolicy(cfg, env)
    params = policy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 2)), jnp.float32)
    x_gt = jnp.asarray(rng.normal(size=(4, 4, 2)), jnp.float32)
    u_gt = jnp.asarray(rng.normal(size=(4, 4, 1)), jnp.float32)
    mask = jnp.ones((4, 4), jnp.float32)

    @jax.jit
    def loss_of(params):
        po, _ = policy.forward(params, obs)
        d = compute_loss_deqmpc(policy, x_gt, u_gt, mask, po,
                                x_init=po["init_states"])
        return d["loss"]

    loss, grads = jax.value_and_grad(loss_of)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0

    # the re-entrant cost must actually change the solve vs. the same
    # policy with the knob off
    cfg_off = PolicyConfig(nx=2, nu=1, nq=1, T=4, dt=env.dt, bsz=4,
                           hdim=16, layer_type="mlp", deq_iter=2,
                           fp_max_steps=4, solver_dtype=jnp.float64)
    policy_off = DEQMPCPolicy(cfg_off, env)
    po_on, _ = policy.forward(params, obs)
    po_off, _ = policy_off.forward(params, obs)
    u_on = np.asarray(po_on["trajs"][-1][2])
    u_off = np.asarray(po_off["trajs"][-1][2])
    assert np.abs(u_on - u_off).max() > 1e-8
