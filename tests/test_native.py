"""Native C++ kernels vs the jnp reference implementations.

The de-facto correctness oracle pattern of the reference (FD-vs-
analytic + cross-implementation checks, SURVEY.md §4) applied both
ways: the C++ dual-number Jacobians must match the jnp jacfwd ones.
"""
import numpy as np
import pytest

jnp_envs = pytest.importorskip("deqmpc_tpu.envs")
from deqmpc_tpu.envs import CartpoleEnv, PendulumEnv  # noqa: E402

try:
    from deqmpc_tpu.envs.native_bridge import NativeDynamics, build_native

    build_native()
    HAVE_NATIVE = True
except Exception as e:  # toolchain missing
    HAVE_NATIVE = False
    REASON = str(e)

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native build failed")


CASES = [
    ("pendulum1l", PendulumEnv(dt=0.05)),
    ("cartpole1l", CartpoleEnv(nx=4, dt=0.05)),
    ("cartpole2l", CartpoleEnv(nx=6, dt=0.03)),
]


@pytest.mark.parametrize("package,env", CASES, ids=[c[0] for c in CASES])
def test_native_matches_jnp_dynamics(package, env):
    nat = NativeDynamics(package, dt=env.dt)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, env.nx)) * 0.5
    u = rng.normal(size=(16, env.nu)) * 0.5
    x_native = nat.dynamics(x, u)
    import jax.numpy as jnp

    x_jnp = np.asarray(env.dynamics(jnp.asarray(x), jnp.asarray(u)))
    np.testing.assert_allclose(x_native, x_jnp, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("package,env", CASES, ids=[c[0] for c in CASES])
def test_native_jacobians_match_jnp(package, env):
    nat = NativeDynamics(package, dt=env.dt)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, env.nx)) * 0.4
    u = rng.normal(size=(8, env.nu)) * 0.4
    import jax.numpy as jnp

    _, (Jx_n, Ju_n) = nat.dynamics_derivatives(x, u)
    _, (Jx_j, Ju_j) = env.dynamics_derivatives(jnp.asarray(x), jnp.asarray(u))
    np.testing.assert_allclose(Jx_n, np.asarray(Jx_j), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(Ju_n, np.asarray(Ju_j), rtol=1e-8, atol=1e-9)
