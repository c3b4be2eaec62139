"""Committed-checkpoint format guard.

Loads a committed release checkpoint (`checkpoints/pendulum_deqmpc`)
into the CURRENT model code and asserts (a) the saved param tree
covers the live param tree leaf-for-leaf with matching shapes — the
check that would catch any trunk/param rename breaking old
checkpoints (e.g. a Conv-trunk swap) — and (b) a forward pass through
the full policy produces finite optimized trajectories.

The reference has no such guard (its `--load --ckpt` path,
`/root/reference/deqmpc/train.py:254-256`, fails only at run time).
"""
import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from deqmpc_tpu.envs import make_env
from deqmpc_tpu.training.train import (apply_model_type_presets,
                                       build_argparser, build_policy,
                                       load_checkpoint)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints", "pendulum_deqmpc")


def _flat_leaves(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat_leaves(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.shape(tree)
    return out


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no committed ckpt")
def test_committed_pendulum_checkpoint_loads_and_runs():
    with open(CKPT, "rb") as f:
        blob = pickle.load(f)
    saved_args = blob.get("args") or {}

    # rebuild the run config: argparser defaults overlaid with the
    # flags recorded in the checkpoint (newer flags keep defaults)
    args = build_argparser().parse_args([])
    for k, v in saved_args.items():
        setattr(args, k, v)
    if not saved_args:  # params-only blob: the documented config row
        args.env, args.model_type = "pendulum", "deq-mpc-deq"
        args.T, args.deq_iter, args.hdim = 5, 6, 256
        args = apply_model_type_presets(args)

    env = make_env(args.env)
    if args.nq <= 0:
        args.nq = env.nq if env.nq <= env.nx // 2 else env.nx // 2
    policy = build_policy(args, env)
    params = policy.init(jax.random.PRNGKey(0))

    # (a) structural guard: every live param leaf must exist in the
    # checkpoint with the same shape — a lenient load silently keeps
    # init values for missing leaves, which is exactly the failure
    # mode this test exists to catch
    saved_sd = serialization.msgpack_restore(blob["params"])
    live = _flat_leaves(serialization.to_state_dict(params))
    saved = _flat_leaves(saved_sd)
    missing = {k: s for k, s in live.items() if k not in saved}
    assert not missing, f"checkpoint lacks current-model params: {missing}"
    mismatched = {k: (saved[k], s) for k, s in live.items()
                  if saved[k] != s}
    assert not mismatched, f"param shape drift vs checkpoint: {mismatched}"

    # (b) behavioral guard: finite optimized trajectories end-to-end,
    # from starts just off upright where the trained policy must plan
    # to stay (a T=5 plan from hanging legitimately swings away first,
    # so a from-reset distance check would be meaningless)
    params, _, _, _ = load_checkpoint(CKPT, params)
    x0 = jnp.asarray([[np.pi + 0.15, 0.3], [np.pi - 0.15, -0.3]],
                     jnp.float32)
    po, _ = policy.forward(params, x0, qp_solve=True, lastqp_solve=False)
    nom_x, _, nom_u = po["trajs"][-1]
    assert bool(jnp.isfinite(nom_x).all()) and bool(jnp.isfinite(nom_u).all())
    dT = jnp.abs(jnp.mod(nom_x[:, -1, 0] - jnp.pi + jnp.pi, 2 * jnp.pi)
                 - jnp.pi)
    assert float(jnp.max(dT)) < 0.5, f"trained policy left upright: {dT}"
