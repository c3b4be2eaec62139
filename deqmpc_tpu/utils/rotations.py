"""Quaternion / Modified-Rodrigues-Parameter (MRP) attitude math, pure jnp.

Re-derives the behavior of the reference's missing ``rexquad_utils``
module, whose interface is fixed by its call sites
(``/root/reference/deqmpc/rex_quadrotor.py:3``,
``/root/reference/deqmpc/flying_cartpole2d.py:3``): ``rk4``, ``deg2rad``,
``w2pdotkinematics_mrp``, ``quat2mrp``, ``euler_to_quaternion``,
``mrp2quat``, ``quatrot``, ``mrp2rot``.

Conventions:
  * quaternion is scalar-first ``(w, x, y, z)``, unit norm;
  * MRP ``p = q_vec / (1 + q_w)`` (stereographic projection of the unit
    quaternion from the antipode), singular at 360 deg;
  * all functions broadcast over arbitrary leading batch dims and are
    jit/vmap/jacfwd-safe (no data-dependent Python control flow).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "deg2rad",
    "quat_multiply",
    "quat_conj",
    "quat2mrp",
    "mrp2quat",
    "mrp2rot",
    "quatrot",
    "w2pdotkinematics_mrp",
    "euler_to_quaternion",
    "angle_normalize_2pi",
    "angle_normalize",
    "rk4",
]


def deg2rad(d):
    return d * jnp.pi / 180.0


def angle_normalize_2pi(x):
    """Wrap angles into [0, 2*pi) (reference `flying_cartpole2d.py:8-9`)."""
    return jnp.mod(x, 2.0 * jnp.pi)


def angle_normalize(x):
    """Wrap angles into [-pi, pi)."""
    return jnp.mod(x + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def quat_multiply(q1, q2):
    """Hamilton product, scalar-first, broadcasting over leading dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat2mrp(q):
    """Unit quaternion (scalar-first) -> MRP: p = q_vec / (1 + q_w)."""
    return q[..., 1:] / (1.0 + q[..., :1])


def mrp2quat(p):
    """MRP -> unit quaternion (scalar-first).

    q_w = (1 - |p|^2) / (1 + |p|^2),  q_vec = 2 p / (1 + |p|^2).
    """
    n2 = jnp.sum(p * p, axis=-1, keepdims=True)
    denom = 1.0 + n2
    w = (1.0 - n2) / denom
    v = 2.0 * p / denom
    return jnp.concatenate([w, v], axis=-1)


def mrp2rot(p):
    """MRP -> rotation matrix (3x3, broadcasting over leading dims).

    R = I + (8 [p]_x^2 + 4 (1 - |p|^2) [p]_x) / (1 + |p|^2)^2
    """
    n2 = jnp.sum(p * p, axis=-1)[..., None, None]
    px = _skew(p)
    pxpx = px @ px
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), pxpx.shape)
    return eye + (8.0 * pxpx + 4.0 * (1.0 - n2) * px) / (1.0 + n2) ** 2


def _skew(v):
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def quatrot(q, v):
    """Rotate vector v by unit quaternion q: q * (0,v) * q^-1 (vector part)."""
    qv = q[..., 1:]
    qw = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def w2pdotkinematics_mrp(p, w):
    """MRP kinematics: pdot = 0.25 * B(p) w.

    B(p) = (1 - |p|^2) I + 2 [p]_x + 2 p p^T
    (standard MRP kinematic matrix; see e.g. Schaub & Junkins).
    """
    n2 = jnp.sum(p * p, axis=-1, keepdims=True)
    pw = jnp.sum(p * w, axis=-1, keepdims=True)
    return 0.25 * ((1.0 - n2) * w + 2.0 * jnp.cross(p, w) + 2.0 * pw * p)


def euler_to_quaternion(e):
    """ZYX (roll-pitch-yaw as (..., 3) = [roll, pitch, yaw]) -> quaternion."""
    roll, pitch, yaw = e[..., 0], e[..., 1], e[..., 2]
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def rk4(f, x, u, dt):
    """Classic RK4 step for xdot = f(x, u) (matches reference
    `rex_quadrotor.py:98-107` structure)."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
