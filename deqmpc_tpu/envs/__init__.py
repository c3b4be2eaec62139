"""Environments: pure-jnp dynamics + autodiff derivatives.

Layer map counterpart of the reference's L2/L1 (env classes + native
dynamics kernels, SURVEY.md section 2.3). All dynamics are pure
functions; CasADi/C/CUDA native kernels are replaced by jnp+jacfwd
(see `native/` for the C++ host-side counterpart used for CPU
benchmarking and cross-checking).
"""
from .base import Env
from .cartpole import Cartpole2linkEnv, CartpoleEnv
from .flying_cartpole import FlyingCartpole
from .pendulum import IntegratorEnv, PendulumEnv
from .quadrotor import RexQuadrotor

__all__ = [
    "Env",
    "CartpoleEnv",
    "Cartpole2linkEnv",
    "FlyingCartpole",
    "IntegratorEnv",
    "PendulumEnv",
    "RexQuadrotor",
]


def make_env(name: str, **kwargs):
    """Factory matching the reference CLI env choices (`train.py:37`)."""
    name = name.lower()
    if name == "pendulum":
        return PendulumEnv(stabilization=False)
    if name == "pendulum_stabilize":
        return PendulumEnv(stabilization=True)
    if name == "integrator":
        return IntegratorEnv()
    if name in ("cartpole1link", "cartpole-v0"):
        return CartpoleEnv(nx=4, dt=0.05)
    if name == "cartpole2link":
        return CartpoleEnv(nx=6, dt=0.03)
    if name == "rexquadrotor":
        return RexQuadrotor(**kwargs)
    if name == "flyingcartpole":
        return FlyingCartpole(**kwargs)
    if name == "flyingcartpole_obstacles":
        return FlyingCartpole(obstacles=True, **kwargs)
    if name == "flyingcartpole_obstacles_dense":
        # discriminating obstacle field: at the default density (40
        # spheres r=0.25 in the 10 m box) a straight crossing hits an
        # obstacle with p~4%, so constrained-vs-blind comparisons are
        # statistically flat at any reasonable episode count. 160
        # spheres at r=0.4 raise the blind line-hit rate to ~40%,
        # which n=256 episodes resolves cleanly.
        kwargs.setdefault("n_obstacles", 160)
        kwargs.setdefault("obstacle_radius", 0.4)
        return FlyingCartpole(obstacles=True, **kwargs)
    raise ValueError(f"unknown env: {name}")
