import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from types import SimpleNamespace
from deqmpc_tpu.envs import make_env
from deqmpc_tpu.policies import DEQMPCPolicy, PolicyConfig
from deqmpc_tpu.training.eval import eval_policy

env = make_env("cartpole1link")
cfg = PolicyConfig(T=5, deq_iter=2, hdim=32, nq=2, max_steps=3,
                   inner_deq_iters=2)
policy = DEQMPCPolicy(cfg, env)
params = policy.init(jax.random.PRNGKey(0))
args = SimpleNamespace(env="cartpole1link", qp_solve=True,
                       lastqp_solve=False, streaming=False)
stats = eval_policy(args, env, policy, params, n_episodes=4, ep_len=3)
print("eval stats:", stats, flush=True)
assert np.isfinite(stats["final_dist_mean"])
print("OK", flush=True)
