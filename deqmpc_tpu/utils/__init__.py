"""Shared utilities: rotations, spaces, state (un)normalization, args.

Reconstructs the surface of the reference's missing ``deqmpc/utils.py``
(interface fixed by call sites at `/root/reference/deqmpc/train.py:15`,
`/root/reference/deqmpc/my_envs/cartpole.py:21`): ``Spaces``,
``merge_args``, ``unnormalize_states_*``, ``angle_normalize_2pi``.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .rotations import angle_normalize, angle_normalize_2pi  # noqa: F401


@dataclasses.dataclass
class Spaces:
    """Minimal gym-style box space (reference `Spaces`/`Spaces_np`)."""

    low: np.ndarray
    high: np.ndarray
    shape: tuple

    def __init__(self, low=None, high=None, shape=None):
        if shape is None and low is not None:
            shape = np.shape(low)
        self.shape = tuple(shape) if shape is not None else ()
        self.low = np.broadcast_to(np.asarray(low, dtype=np.float32), self.shape) if low is not None else None
        self.high = np.broadcast_to(np.asarray(high, dtype=np.float32), self.shape) if high is not None else None


# np alias kept for API parity with the reference's `Spaces_np`
Spaces_np = Spaces


def merge_args(args, saved_args):
    """Overlay saved run args onto the live args namespace (reference
    `train.py:160` semantics: saved args win except for eval overrides
    the caller already applied to `saved_args`)."""
    merged = dict(vars(args))
    merged.update({k: v for k, v in vars(saved_args).items()})
    ns = type(args)()
    for k, v in merged.items():
        setattr(ns, k, v)
    return ns


# --- state (un)normalization -------------------------------------------------
# Expert trajectories are stored with joint angles wrapped to [-pi, pi).
# "Unnormalizing" maps them to the [0, 2pi) convention the swing-up
# targets use (upright = pi), matching the reference's angle handling
# (`flying_cartpole2d.py:8-9`, `my_envs/cartpole.py:90-92`). Only angle
# coordinates are touched.


def _shift_angles(x, idxs):
    # stay in numpy for host-side (data-pipeline) inputs: a jnp round
    # trip here costs ~30 ms/call through the TPU tunnel per train step
    if isinstance(x, np.ndarray):
        out = x.copy()
        out[..., np.asarray(idxs)] = np.mod(out[..., np.asarray(idxs)],
                                            2.0 * np.pi)
        return out
    x = jnp.asarray(x)
    shifted = jnp.mod(x[..., idxs], 2.0 * jnp.pi)
    return x.at[..., idxs].set(shifted)


def unnormalize_states_pendulum(x):
    """Pendulum state (theta, thetadot): wrap theta into [0, 2pi)."""
    return _shift_angles(x, np.array([0]))


def unnormalize_states_cartpole_nlink(x):
    """Cartpole n-link state (px, q1..qn-1, vels): wrap joint angles."""
    nq = x.shape[-1] // 2
    return _shift_angles(x, np.arange(1, nq))


def unnormalize_states_flyingcartpole(x):
    """FlyingCartpole state: wrap the pendulum angle (index 6)."""
    return _shift_angles(x, np.array([6]))


# --- window angle unwrapping ---------------------------------------------
# Supervision windows that cross the 0/2pi wrap carry a ~2pi jump in the
# stored angle (5% of pendulum swing-up windows): an l1 target the
# network cannot match and the dynamics-constrained MPC cannot
# reproduce. Unwrap along the time axis, anchored at knot 0 (== the
# current observation), so targets are continuous; the dynamics are
# 2pi-periodic so slightly out-of-range references are fine.

_ANGLE_IDXS = {
    "pendulum": lambda nx: np.array([0]),
    "cartpole": lambda nx: np.arange(1, nx // 2),
    "flyingcartpole": lambda nx: np.array([6]),
}


def angle_idxs_for_env(env_name: str, nx: int):
    if env_name.startswith("pendulum"):
        return _ANGLE_IDXS["pendulum"](nx)
    if "cartpole" in env_name and "Flying" not in env_name:
        return _ANGLE_IDXS["cartpole"](nx)
    if "FlyingCartpole" in env_name:
        return _ANGLE_IDXS["flyingcartpole"](nx)
    return None


def unwrap_angle_windows(x: np.ndarray, idxs) -> np.ndarray:
    """np.unwrap the angle dims of a (..., T, nx) window along T."""
    if idxs is None or len(idxs) == 0:
        return x
    out = np.array(x, copy=True)
    out[..., idxs] = np.unwrap(out[..., idxs], axis=-2)
    return out
