"""Loss-suite semantics (reference `policies.py:511-916`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from deqmpc_tpu.policies.losses import (compute_cost_coeff,
                                        compute_loss_deqmpc,
                                        loss_type_conditioned)


class _P:  # minimal policy facade
    nq, T, out_type, loss_type, deq_reg = 1, 4, 1, "l1", 0.1


def _mk(seed=0, bsz=3, T=4, nx=2, nu=1, n_iter=2):
    rng = np.random.default_rng(seed)
    gt_s = jnp.asarray(rng.normal(size=(bsz, T, nx)))
    gt_a = jnp.asarray(rng.normal(size=(bsz, T, nu)))
    mask = jnp.ones((bsz, T))
    trajs = [
        (jnp.asarray(rng.normal(size=(bsz, T, nx))),
         jnp.asarray(rng.normal(size=(bsz, T, nx))),
         jnp.asarray(rng.normal(size=(bsz, T, nu))))
        for _ in range(n_iter)
    ]
    return gt_s, gt_a, mask, trajs


def test_loss_types():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(3, 4, 2)))
    targ = jnp.asarray(rng.normal(size=(3, 4, 2)))
    mask = jnp.ones((3, 4))
    l1, _ = loss_type_conditioned(pred, targ, mask, "l1")
    l2, _ = loss_type_conditioned(pred, targ, mask, "l2")
    h, _ = loss_type_conditioned(pred, targ, mask, "hinge")
    assert l1.shape == (3,)
    # hinge <= l1 elementwise-summed
    assert bool(jnp.all(h <= l1 + 1e-9))
    # exact zero when prediction == target
    z, _ = loss_type_conditioned(targ, targ, mask, "l1")
    np.testing.assert_allclose(z, 0.0, atol=1e-12)


def test_mask_zeroes_padded_steps():
    gt_s, gt_a, mask, trajs = _mk()
    mask0 = mask.at[:, 2:].set(0.0)
    # make predictions wrong ONLY on masked steps -> loss unchanged
    net, opt, act = trajs[0]
    opt_bad = opt.at[:, 2:].add(100.0)
    l_ref, _ = compute_cost_coeff(1, 4, 1, "l1", gt_s, gt_a, mask0,
                                  opt, act, 1.0, 1.0, 1.0)
    l_bad, _ = compute_cost_coeff(1, 4, 1, "l1", gt_s, gt_a, mask0,
                                  opt_bad, act, 1.0, 1.0, 1.0)
    np.testing.assert_allclose(l_ref, l_bad, rtol=1e-12)


def test_deq_reg_weighting():
    gt_s, gt_a, mask, trajs = _mk()
    p = _P()
    out = compute_loss_deqmpc(p, gt_s, gt_a, mask, {"trajs": trajs})
    # loss = sum_j mean_b(opt_j + reg*nn_j); recompute manually
    total = 0.0
    for net, opt, act in trajs:
        lo, _ = compute_cost_coeff(1, 4, 1, "l1", gt_s, gt_a, mask, opt, act,
                                   1.0, 1.0, 1.0)
        ln, _ = compute_cost_coeff(1, 4, 1, "l1", gt_s, gt_a, mask, net, act,
                                   1.0, 1.0, 1.0)
        total = total + jnp.mean(lo + 0.1 * ln)
    np.testing.assert_allclose(float(out["loss"]), float(total), rtol=1e-6)
    assert out["losses_iter_opt"].shape == (2,)


def test_q_scaling_penalty():
    gt_s, gt_a, mask, trajs = _mk()
    p = _P()
    qs = [jnp.full((3, 4), 0.5), jnp.full((3, 4), 0.0)]
    out_q = compute_loss_deqmpc(p, gt_s, gt_a, mask,
                                {"trajs": trajs, "q_scaling": qs})
    out = compute_loss_deqmpc(p, gt_s, gt_a, mask, {"trajs": trajs})
    # penalty = 0.02 * sum_t |q| added for iter 0 only
    np.testing.assert_allclose(
        float(out_q["loss"] - out["loss"]), 0.02 * 0.5 * 4, rtol=1e-5
    )


def test_out_type_streams():
    gt_s, gt_a, mask, trajs = _mk()
    net, opt, act = trajs[0]
    # action-only supervision ignores states entirely
    l_act, _ = compute_cost_coeff(1, 4, 0, "l1", gt_s, gt_a, mask,
                                  opt + 100.0, act, 1.0, 1.0, 1.0)
    l_act2, _ = compute_cost_coeff(1, 4, 0, "l1", gt_s, gt_a, mask,
                                   opt, act, 1.0, 1.0, 1.0)
    np.testing.assert_allclose(l_act, l_act2)
    # config-only (out_type 3) ignores velocities
    l3a, _ = compute_cost_coeff(1, 4, 3, "l1", gt_s, gt_a, mask,
                                opt, act, 1.0, 1.0, 1.0)
    l3b, _ = compute_cost_coeff(1, 4, 3, "l1", gt_s, gt_a, mask,
                                opt.at[..., 1:].add(50.0), act, 1.0, 1.0, 1.0)
    np.testing.assert_allclose(l3a, l3b)
