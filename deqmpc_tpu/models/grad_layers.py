"""Custom-gradient utility layers for DEQ training.

Counterpart of the reference's `deqmpc/deq_layer_utils.py` custom
autograd pieces that were previously deferred:

- `grad_norm`          — GradNormLayer (:9-33): identity forward whose
                         backward rescales per-channel gradients so
                         every last-dim channel carries the same mean
                         magnitude.
- `jac_loss_estimate`  — Hutchinson tr(J^T J) Jacobian regularizer
                         (:65-84), via `jax.vjp` instead of
                         `autograd.grad`.
- `update_scales`      — EMA of per-dim median errors into the
                         DEQLayerDelta `scales` parameters (:55-63).

All are pure functions: `grad_norm` is a `custom_vjp` (no module
state — the reference recomputes the per-channel means from the
incoming cotangent each backward, so its stored moving average is
write-only and carries no state across calls); `update_scales` returns
the new scales array rather than mutating a module.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_vjp
def grad_norm(x: Array) -> Array:
    """Identity forward; backward equalizes per-channel grad magnitude.

    Matches `GradNormLayerFunction.backward`
    (`deq_layer_utils.py:24-33`): flatten the cotangent to
    (-1, C), compute per-channel abs-means, and rescale each channel by
    (global mean / channel mean).
    """
    return x


def _gn_fwd(x):
    return x, None


def _gn_bwd(_, g):
    gf = g.reshape(-1, g.shape[-1])
    ch = jnp.mean(jnp.abs(gf), axis=0)          # per-channel abs-mean
    scale = jnp.mean(ch) / (ch + 1e-12)
    return ((gf * scale[None]).reshape(g.shape),)


grad_norm.defvjp(_gn_fwd, _gn_bwd)


def jac_loss_estimate(f: Callable[[Array], Array], z0: Array,
                      rng: Array, vecs: int = 2) -> Array:
    """Hutchinson estimate of tr(J^T J) / numel(z0) for J = df/dz at z0
    (`deq_layer_utils.py:65-84`).

    The reference contracts random Gaussian vectors against the saved
    autograd graph (`v^T J` via `autograd.grad(f0, z0, v)`); here we
    re-evaluate f under `jax.vjp`, which is the same estimator:
    E[  ||v^T J||^2 ] = tr(J^T J).
    """
    _, pullback = jax.vjp(f, z0)
    keys = jax.random.split(rng, vecs)

    def one(k):
        v = jax.random.normal(k, z0.shape, z0.dtype)
        (vJ,) = pullback(v)
        return jnp.sum(vJ * vJ)

    total = jnp.sum(jax.vmap(one)(keys))
    return total / vecs / z0.size


def update_scales(scales: Array, trajs: Sequence[Array], gt_out: Array,
                  init_states: Array, gamma: float = 0.98) -> Array:
    """EMA update of DEQLayerDelta per-iteration output scales
    (`deq_layer_utils.py:55-63`).

    scales      : (deq_iter, T-1, nx) — `params["scales"]` of DEQLayerDelta.
    trajs       : per-iteration predicted x_ref, each (bsz, T, nx)
                  (reference `trajs[i][1]`).
    gt_out      : expert trajectory (bsz, T, nx).
    init_states : the tiled initial-state trajectory (bsz, T, nx).

    Scale 0 tracks |gt - init| medians; scale i+1 tracks the
    iteration-i prediction error medians. Returns the new scales array.
    """
    err0 = jnp.median(jnp.abs(gt_out[:, 1:] - init_states[:, 1:]), axis=0)
    new = [scales[0] * gamma + (1 - gamma) * err0]
    n = scales.shape[0]
    for i, traj in enumerate(list(trajs)[:-1]):
        if i >= n - 1:
            break
        err = jnp.median(jnp.abs(traj[:, 1:] - gt_out[:, 1:]), axis=0)
        new.append(scales[i + 1] * gamma + (1 - gamma) * err)
    if len(new) < n:
        new.append(scales[len(new):])
        return jnp.concatenate(
            [jnp.stack(new[:-1]), new[-1]], axis=0
        )
    return jnp.stack(new)
