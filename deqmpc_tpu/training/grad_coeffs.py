"""Gradient-ratio loss coefficients.

Reconstructs the reference's `compute_gradratios_deqmpc`
(`policies.py:694-725`) and the coefficient plumbing of the missing
`fwd_funcs.py` (enabled by `--grad_coeff`, `train.py:71`): per-DEQ-
iteration losses produce very different gradient magnitudes at the
network output head; the coefficients rescale each iteration's loss so
its output-layer gradient matches the first iteration with signal,
smoothed with an EMA.

JAX formulation: one jacrev over the stacked per-iteration losses
w.r.t. the output-head kernel gives all per-iteration gradients in a
single backward pass (the reference loops autograd.grad with
retain_graph).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

Array = jax.Array


def _out_head_path(params, key="out"):
    """Locate the output-head subtree (the probe surface, reference
    `policies.py:712` `model.out_layer[0].weight`). Searches nested
    dicts depth-first so variants that nest the head (e.g. inside a
    flax params wrapper) still resolve; returns a key path tuple."""
    if isinstance(params, dict):
        if key in params:
            return (key,)
        for k, v in params.items():
            sub = _out_head_path(v, key)
            if sub is not None:
                return (k,) + sub
    return None


def _get_at(params, path):
    for k in path:
        params = params[k]
    return params


def _set_at(params, path, value):
    """Copy-on-write replacement of the subtree at `path`."""
    if not path:
        return value
    p = dict(params)
    p[path[0]] = _set_at(params[path[0]], path[1:], value)
    return p


def compute_grad_ratio_coeffs(policy, params, batch, qp_solve: bool = True,
                              eps: float = 1e-8):
    """Returns (ratios (deq_iter,), losses_opt, losses_nn).

    ratios[j] = |g_ref| / |g_j| with g_j the gradient of iteration j's
    (opt + deq_reg*nn) loss w.r.t. the output head, g_ref the first
    iteration with nonzero gradient; ratios > 1e6 are reset to 1
    (`policies.py:719-723`)."""
    from ..policies.losses import compute_decomposed_losses

    head = _out_head_path(params)
    if head is None:
        raise KeyError("no output head in params")
    obs = batch["obs"]
    if not getattr(policy, "takes_history", False) and obs.ndim == 3:
        obs = obs[:, -1]
    fwd_extra = ((batch["obs_action"],)
                 if getattr(policy, "takes_action_history", False) else ())

    def losses_of(p_head):
        p = _set_at(params, head, p_head)
        policy_out, _ = policy.forward(p, obs, *fwd_extra, qp_solve=qp_solve)
        lo, ln = compute_decomposed_losses(
            policy, batch["state"], batch["action"], batch["mask"], policy_out
        )
        return lo + policy.deq_reg * ln, (lo, ln)

    jac_fn = jax.jacrev(losses_of, has_aux=True)
    jac, (lo, ln) = jac_fn(_get_at(params, head))
    # jac: pytree with leading deq_iter axis per leaf; norm per iteration
    leaves = jax.tree_util.tree_leaves(jac)
    sq = sum(jnp.sum(l.reshape(l.shape[0], -1) ** 2, axis=1) for l in leaves)
    grads = jnp.sqrt(sq)  # (deq_iter,)
    has_signal = grads > eps
    # first iteration with signal (default 0)
    first = jnp.argmax(has_signal)
    g_ref = grads[first]
    ratios = jnp.where(has_signal, g_ref / jnp.maximum(grads, eps), 1.0)
    ratios = jnp.where(ratios > 1e6, 1.0, ratios)
    return ratios, lo, ln


def update_coeffs_ema(coeffs: Array, ratios: Array, gamma: float = 0.9) -> Array:
    """EMA smoothing of the per-iteration coefficients (all streams
    share the ratio, matching the scalar-ratio reference)."""
    return gamma * coeffs + (1 - gamma) * ratios[:, None]
