"""ctypes bridge to the native C++ dynamics kernels.

Counterpart of the reference's torch<->pybind bridge
(`/root/reference/deqmpc/my_envs/dynamics.py:27-108`): exposes
`dynamics(q, qdot, tau, h) -> (q', qdot')` and
`derivatives(...) -> 6 Jacobian blocks` per env package. The TPU
compute path never calls this — it exists as the host-side CPU
oracle / benchmark target (and builds with plain `make`, no torch
extension machinery).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libdeqmpc_dynamics.so")
_lib: Optional[ctypes.CDLL] = None

_D = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def build_native(force: bool = False) -> str:
    """Compile the shared library with make (idempotent)."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _LIB_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        build_native()
        _lib = ctypes.CDLL(_LIB_PATH)
        for env in ("pendulum1l", "cartpole1l", "cartpole2l"):
            dyn = getattr(_lib, f"{env}_dynamics")
            dyn.restype = None
            dyn.argtypes = [ctypes.c_long] + [_D] * 6
            der = getattr(_lib, f"{env}_derivatives")
            der.restype = None
            der.argtypes = [ctypes.c_long] + [_D] * 10
    return _lib


class NativeDynamics:
    """Per-env native package facade (reference `CartpoleDynamics`
    selecting the package by nx, `my_envs/cartpole.py:30-38`)."""

    _NQ = {"pendulum1l": 1, "cartpole1l": 2, "cartpole2l": 3}

    def __init__(self, package: str, dt: float):
        assert package in self._NQ, package
        self.package = package
        self.nq = self._NQ[package]
        self.nx = 2 * self.nq
        self.nu = 1
        self.dt = dt
        self._lib = _load()
        self._dyn = getattr(self._lib, f"{package}_dynamics")
        self._der = getattr(self._lib, f"{package}_derivatives")

    def _split(self, state, action):
        state = np.ascontiguousarray(state, np.float64)
        bsz = state.shape[0]
        q = np.ascontiguousarray(state[:, : self.nq])
        qd = np.ascontiguousarray(state[:, self.nq :])
        tau = np.zeros((bsz, self.nq), np.float64)
        tau[:, 0] = np.asarray(action, np.float64).reshape(bsz, -1)[:, 0]
        h = np.full(bsz, self.dt, np.float64)
        return bsz, q, qd, tau, h

    def dynamics(self, state: np.ndarray, action: np.ndarray) -> np.ndarray:
        bsz, q, qd, tau, h = self._split(state, action)
        q_out = np.empty_like(q)
        qd_out = np.empty_like(qd)
        self._dyn(bsz, q, qd, tau, h, q_out, qd_out)
        return np.concatenate([q_out, qd_out], axis=-1)

    def dynamics_derivatives(self, state, action) -> Tuple[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
        """Returns (x', (Jx, Ju)) with Jx (bsz, nx, nx), Ju (bsz, nx, nu)
        assembled from the 6 blocks like the reference bridge
        (`my_envs/dynamics.py:97-108`)."""
        bsz, q, qd, tau, h = self._split(state, action)
        nq = self.nq
        blocks = [np.empty((bsz, nq, nq), np.float64) for _ in range(6)]
        self._der(bsz, q, qd, tau, h, *blocks)
        dq_dq, dq_dqd, dq_dtau, dqd_dq, dqd_dqd, dqd_dtau = blocks
        top = np.concatenate([dq_dq, dq_dqd], axis=-1)
        bot = np.concatenate([dqd_dq, dqd_dqd], axis=-1)
        Jx = np.concatenate([top, bot], axis=-2)
        Ju = np.concatenate([dq_dtau[:, :, :1], dqd_dtau[:, :, :1]], axis=-2)
        return self.dynamics(state, action), (Jx, Ju)
