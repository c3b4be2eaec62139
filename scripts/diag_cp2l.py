import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
from deqmpc_tpu.envs import make_env
from deqmpc_tpu.data.expert_gen import generate_mpc_expert
env = make_env("cartpole2link")
rng = np.random.default_rng(0)
n = 8
x0 = np.zeros((n, 6), np.float32)
x0[:, 0] = rng.uniform(-1.0, 1.0, n)
x0[:, 1:3] = rng.uniform(-0.7, 0.7, (n, 2))
x0[:, 3:] = rng.uniform(-1.0, 1.0, (n, 3))
eps = generate_mpc_expert(env, ep_len=150, horizon=60, al_iters=10,
                          noise_std=0.3, env_name="cartpole2link", x0=x0, seed=0)
print("episodes kept (finite):", len(eps))
if eps:
    finals = np.stack([np.asarray(ep[-1][0]) for ep in eps])
    err = finals - np.asarray(env.targ_pos)
    err[:, 1:3] = np.mod(err[:, 1:3] + np.pi, 2*np.pi) - np.pi
    print("final err norms:", np.round(np.linalg.norm(err, axis=1), 3))
