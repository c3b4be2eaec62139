import sys, json
import numpy as np, jax, jax.numpy as jnp
from deqmpc_tpu.envs import make_env
from deqmpc_tpu.training.train import build_argparser, apply_model_type_presets, build_policy
from deqmpc_tpu.training.train import load_checkpoint

args = build_argparser().parse_args(
    "--env FlyingCartpole --model_type deq-mpc-nn --T 5 --deq_iter 6 --hdim 256 --bsz 128 --nq 7".split())
args = apply_model_type_presets(args)
env = make_env("FlyingCartpole")
policy = build_policy(args, env)
params = policy.init(jax.random.PRNGKey(0))
params, _, step, _ = load_checkpoint("model/flying_deqmpc_nn", params, None)
print("ckpt step", step)

n = 64
x = env.reset(jax.random.PRNGKey(0), n)
@jax.jit
def first_step(params, x):
    policy_out, carry = policy.forward(params, x.astype(jnp.float32),
                                       qp_solve=args.qp_solve, lastqp_solve=args.lastqp_solve)
    _, opt_states, actions = policy_out["trajs"][-1]
    return actions[:, 0], actions
env_step = jax.jit(env.step)
traj = [np.asarray(x)]
us = []
for t in range(60):
    u0, acts = first_step(params, x)
    x, r = env_step(x, u0)
    traj.append(np.asarray(x)); us.append(np.asarray(u0))
traj = np.stack(traj, 1)
us = np.stack(us, 1)
b = 0
np.set_printoptions(precision=3, suppress=True)
print("pos[0] over t:", traj[b, ::10, :3])
print("theta[0] over t:", traj[b, ::10, 6])
print("u[0,:5]:", us[b, :5])
print("u range:", us.min(), us.max(), "u_hover?", getattr(env,'u_hover',None))
print("final |pos| mean:", np.linalg.norm(traj[:, -1, :3], axis=-1).mean())
print("final theta mean:", traj[:, -1, 6].mean(), "+-", traj[:, -1, 6].std())
print("nan lanes:", (~np.isfinite(traj[:, -1]).all(-1)).sum())
