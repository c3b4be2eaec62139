"""Micro-benchmark + correctness harness for the native kernels.

Counterpart of the reference's per-package `test_dynamics.py`
(`my_envs/pendulum1l/test_dynamics.py:12-49`): warm-up then timed loop
over `dynamics` and `derivatives` with -b/-r flags, plus the
FD-vs-analytic check the reference left commented out (:51-61) —
enabled here.

Usage: python native/test_dynamics.py --env cartpole2l -b 1000 -r 100
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from deqmpc_tpu.envs.native_bridge import NativeDynamics  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="cartpole2l",
                   choices=["pendulum1l", "cartpole1l", "cartpole2l"])
    p.add_argument("-b", "--batch", type=int, default=1000)
    p.add_argument("-r", "--runs", type=int, default=100)
    p.add_argument("--dt", type=float, default=0.03)
    args = p.parse_args()

    nat = NativeDynamics(args.env, dt=args.dt)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.batch, nat.nx)) * 0.5
    u = rng.normal(size=(args.batch, nat.nu)) * 0.5

    # correctness: FD vs analytic (the reference's commented-out check)
    _, (Jx, Ju) = nat.dynamics_derivatives(x[:8], u[:8])
    eps = 1e-6
    Jx_fd = np.zeros_like(Jx)
    for j in range(nat.nx):
        dx = np.zeros(nat.nx)
        dx[j] = eps
        Jx_fd[..., j] = (nat.dynamics(x[:8] + dx, u[:8])
                         - nat.dynamics(x[:8] - dx, u[:8])) / (2 * eps)
    err = np.abs(Jx - Jx_fd).max()
    print(f"FD-vs-analytic max err: {err:.2e}")
    assert err < 1e-6, "analytic Jacobian mismatch"

    # warm-up
    for _ in range(3):
        nat.dynamics(x, u)
        nat.dynamics_derivatives(x, u)

    t0 = time.perf_counter()
    for _ in range(args.runs):
        nat.dynamics(x, u)
    t_dyn = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.runs):
        nat.dynamics_derivatives(x, u)
    t_der = time.perf_counter() - t0
    n = args.batch * args.runs
    print(f"dynamics:    {t_dyn:.3f}s for {n} evals "
          f"({n / t_dyn / 1e6:.2f} M evals/s)")
    print(f"derivatives: {t_der:.3f}s for {n} evals "
          f"({n / t_der / 1e6:.2f} M evals/s)")


if __name__ == "__main__":
    main()
