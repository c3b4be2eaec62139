"""Per-iteration imitation losses for DEQ-MPC training.

Counterpart of the reference loss suite
(`/root/reference/deqmpc/policies.py:511-916`): every DEQ-MPC
iteration's (optimizer-trajectory, network-trajectory) pair is
supervised against the expert, with
loss = sum_j loss_opt_j + deq_reg * loss_nn_j  (+ q-scaling penalty).
Residual-based iteration/example weights are computed (and returned
for logging) but not applied, matching the reference
(`policies.py:602-612` — the multiplications are commented out there).

All functions are jit-safe: per-iteration diagnostics are returned as
stacked arrays, not Python floats.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def loss_type_conditioned(pred: Array, targ: Array, mask: Array,
                          loss_type: str) -> Tuple[Array, Array]:
    """Returns (per-sample loss (bsz,), per-sample residual (bsz,)).
    (`policies.py:870-882`; residual is always the masked L1.)"""
    diff = (pred - targ) * mask[:, :, None]
    res = jnp.abs(diff).sum(axis=-1).mean(axis=1)
    if loss_type == "l2":
        val = jnp.square(jnp.linalg.norm(diff, axis=-1)).mean(axis=1)
    elif loss_type == "l1":
        val = jnp.abs(diff).sum(axis=-1).mean(axis=1)
    elif loss_type == "hinge":
        l1 = jnp.abs(diff)
        l2 = jnp.square(diff)
        val = jnp.minimum(l1, l2).sum(axis=-1).mean(axis=1)
    else:
        raise ValueError(loss_type)
    return val, res


def compute_cost_coeff(nq: int, T: int, out_type: int, loss_type: str,
                       gt_states, gt_actions, gt_mask,
                       nominal_states, nominal_actions,
                       coeff_pos, coeff_vel, coeff_act):
    """Per-sample supervision cost decomposed into position / velocity /
    action streams with per-iteration coefficients
    (`policies.py:838-854`)."""
    loss = 0.0
    res = 0.0
    if out_type in (0, 2):
        lk, rk = loss_type_conditioned(
            nominal_actions[:, : T - 1], gt_actions[:, : T - 1],
            gt_mask[:, : T - 1], loss_type,
        )
        loss = loss + lk * coeff_act
        res = res + rk
    if out_type in (1, 2):
        li, ri = loss_type_conditioned(
            nominal_states[..., :nq], gt_states[..., :nq], gt_mask, loss_type
        )
        lj, rj = loss_type_conditioned(
            nominal_states[..., nq:], gt_states[..., nq:], gt_mask, loss_type
        )
        loss = loss + li * coeff_pos + lj * coeff_vel
        res = res + ri + rj
    if out_type == 3:
        li, ri = loss_type_conditioned(
            nominal_states[..., :nq], gt_states[..., :nq], gt_mask, loss_type
        )
        loss = loss + li * coeff_pos
        res = res + ri
    return loss, res


def compute_loss_deqmpc(policy, gt_states, gt_actions, gt_mask, policy_out,
                        coeffs: Optional[Array] = None,
                        x_init: Optional[Array] = None) -> Dict[str, Array]:
    """Main DEQ-MPC loss (`policies.py:559-622`). policy provides
    nq/T/out_type/loss_type/deq_reg. policy_out["trajs"] is a list of
    (net_states, opt_states, actions) per DEQ iteration."""
    trajs = policy_out["trajs"]
    n_iter = len(trajs)
    nq, T = policy.nq, policy.T
    if coeffs is None:
        cs = jnp.ones((n_iter, 3))
    else:
        cs = jnp.ones((n_iter, 3)).at[:, : coeffs.shape[1]].set(coeffs)

    losses = []
    loss_opts = []
    loss_nns = []
    residuals = []
    if x_init is not None:
        _, res_init = compute_cost_coeff(
            nq, T, policy.out_type, policy.loss_type, gt_states, gt_actions,
            gt_mask, x_init, trajs[0][2] * 0, cs[0, 0], cs[0, 1], cs[0, 2],
        )
        residuals.append(res_init)
    q_pen = policy_out.get("q_scaling")
    q_losses = []
    for j, (net_states, opt_states, actions) in enumerate(trajs):
        loss_opt_j, res = compute_cost_coeff(
            nq, T, policy.out_type, policy.loss_type, gt_states, gt_actions,
            gt_mask, opt_states, actions, cs[j, 0], cs[j, 1], cs[j, 2],
        )
        loss_nn_j, _ = compute_cost_coeff(
            nq, T, policy.out_type, policy.loss_type, gt_states, gt_actions,
            gt_mask, net_states, actions, cs[j, 0], cs[j, 1], cs[j, 2],
        )
        total_j = loss_opt_j + policy.deq_reg * loss_nn_j
        if q_pen is not None:
            # 0.02 * |q_scaling - 1| penalty (`policies.py:762-764`;
            # note the net emits q_scaling with +1 applied downstream,
            # so the pull-to-identity is |q| here)
            lq = 0.02 * jnp.abs(q_pen[j]).sum(axis=1)
            total_j = total_j + lq
            q_losses.append(jnp.mean(lq))
        losses.append(total_j)
        loss_opts.append(jnp.mean(loss_opt_j))
        loss_nns.append(jnp.mean(loss_nn_j))
        residuals.append(res)

    losses = jnp.stack(losses, axis=1)          # (bsz, n_iter)
    residuals = jnp.stack(residuals, axis=1)    # (bsz, n_iter[+1])
    # iteration/example weights: computed for logging, NOT applied
    # (`policies.py:602-612` — the multiplications are commented out there)
    ex_weights = residuals.mean(axis=1, keepdims=True)
    ex_weights = ex_weights / (ex_weights.mean() + 1e-12)
    iter_weights = _iter_weights(residuals, gt_mask)
    loss = losses.mean(axis=0).sum()
    loss_end, _ = compute_cost_coeff(
        nq, T, policy.out_type, policy.loss_type, gt_states, gt_actions,
        gt_mask, trajs[-1][1], trajs[-1][2], cs[-1, 0], cs[-1, 1], cs[-1, 2],
    )
    out = {
        "loss": loss,
        "loss_end": jnp.mean(loss_end),
        "losses_iter_opt": jnp.stack(loss_opts),
        "losses_iter_nn": jnp.stack(loss_nns),
        "losses_iter": losses.mean(axis=0),
        "residuals": residuals[:, -1],
        "ex_weights": ex_weights,
        "iter_weights": iter_weights,
    }
    if q_losses:
        out["losses_iter_q"] = jnp.stack(q_losses)
    return out


def _iter_weights(residuals: Array, gt_mask: Array) -> Array:
    """Residual-ratio iteration weights (`policies.py:605-608`):
    ``5**log(res_0 / (10*res_j))`` normalized per sample, forced uniform
    for one-step windows. Diagnostic only — like the reference, never
    multiplied into the loss."""
    w = 5.0 ** jnp.log(residuals[:, :1] / (10.0 * residuals[:, :-1] + 1e-12))
    one_step = (gt_mask.sum(axis=1) == 1)[:, None]
    w = jnp.where(one_step, 1.0, w)
    return w / (w.sum(axis=1, keepdims=True) + 1e-12)


def compute_loss_deqmpc_hist(policy, gt_states, gt_actions, gt_obs, gt_mask,
                             policy_out, coeffs: Optional[Array] = None,
                             x_init: Optional[Array] = None) -> Dict[str, Array]:
    """History/EstPred variant loss (`policies.py:624-691`): the base
    DEQ-MPC loss plus per-iteration state-estimate losses against the
    observation-history ground truth ``gt_obs`` (bsz, H, nx). The x_est
    losses are *logged* per iteration (``losses_x_ests``) but, exactly
    as in the reference (`policies.py:665` — commented out of the sum),
    not added to the training total."""
    out = compute_loss_deqmpc(policy, gt_states, gt_actions, gt_mask,
                              policy_out, coeffs=coeffs, x_init=x_init)
    x_ests = policy_out.get("nominal_x_ests")
    if x_ests is None:
        return out
    nq = policy.nq
    H = gt_obs.shape[1]
    ones = jnp.ones(gt_mask.shape[:1] + (H,), gt_mask.dtype)
    # zero action placeholder: out_type=1 losses touch states only and
    # the reference passes `nominal_actions` purely positionally here
    u0 = jnp.zeros(gt_obs.shape[:2] + (policy.nu,), gt_obs.dtype)
    hist_losses, hist_nn_losses = [], []
    for j, (x_est_pre, x_est_post) in enumerate(x_ests):
        lh, _ = compute_cost_coeff(
            nq, H, policy.out_type, policy.loss_type, gt_obs, u0, ones,
            x_est_pre, u0, 1.0, 1.0, 1.0,
        )
        lhn, _ = compute_cost_coeff(
            nq, H, policy.out_type, policy.loss_type, gt_obs, u0, ones,
            x_est_post, u0, 1.0, 1.0, 1.0,
        )
        hist_losses.append(jnp.mean(lh))
        hist_nn_losses.append(jnp.mean(lhn))
    out["losses_x_ests"] = jnp.stack(hist_losses)
    out["losses_x_ests_post"] = jnp.stack(hist_nn_losses)
    return out


def compute_decomposed_losses(policy, gt_states, gt_actions, gt_mask,
                              policy_out) -> Tuple[Array, Array]:
    """Stacked per-iteration (opt, nn) losses for grad-ratio
    coefficients (`policies.py:694-725`). Returns (loss_opt (n_iter,),
    loss_nn (n_iter,)) as scalars per iteration."""
    nq, T = policy.nq, policy.T
    opts, nns = [], []
    for net_states, opt_states, actions in policy_out["trajs"]:
        lo, _ = compute_cost_coeff(
            nq, T, policy.out_type, policy.loss_type, gt_states, gt_actions,
            gt_mask, opt_states, actions, 1.0, 1.0, 1.0,
        )
        ln, _ = compute_cost_coeff(
            nq, T, policy.out_type, policy.loss_type, gt_states, gt_actions,
            gt_mask, net_states, actions, 1.0, 1.0, 1.0,
        )
        opts.append(jnp.mean(lo))
        nns.append(jnp.mean(ln))
    return jnp.stack(opts), jnp.stack(nns)
