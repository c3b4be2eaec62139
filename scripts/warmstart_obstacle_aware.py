"""Warm-start an obstacle-AWARE flying policy from the blind one.

The obstacle input stream (deq_layer.py:_obstacle_feats) appends 16
per-knot features to the ConvInput concat, so Conv_0's kernel gains 16
input rows and the blind checkpoint no longer loads. Zero-padding
exactly those rows makes the aware policy bit-identical to the blind
one at init — training then only has to learn the obstacle response,
not flying. All other leaves are shape-identical and copied.

Usage:
    python scripts/warmstart_obstacle_aware.py \
        --src checkpoints/flying_deqmpc_nn \
        --dst model/flying_obstacles_aware_warm
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="checkpoints/flying_deqmpc_nn")
    ap.add_argument("--dst", default="model/flying_obstacles_aware_warm")
    ap.add_argument("--env", default="FlyingCartpole_obstacles_dense")
    args = ap.parse_args()

    from deqmpc_tpu.envs import make_env
    from deqmpc_tpu.solvers import ObstacleSet
    from deqmpc_tpu.training.train import (apply_model_type_presets,
                                           build_argparser, build_policy,
                                           load_checkpoint, save_checkpoint)

    env = make_env(args.env)
    obstacles = ObstacleSet(centers=jnp.asarray(env.obstacle_positions),
                            radius=float(env.obstacle_radius))
    base = ("--model_type deq-mpc-nn --T 5 --deq_iter 6 --hdim 256 "
            "--bsz 128 --nq 7").split()
    targs = build_argparser().parse_args(["--env", args.env, *base])
    targs = apply_model_type_presets(targs)
    targs.obstacle_net_input = True
    pol_aware = build_policy(targs, env, obstacles=obstacles)
    aware = pol_aware.init(jax.random.PRNGKey(0))

    bargs = build_argparser().parse_args(["--env", "FlyingCartpole", *base])
    bargs = apply_model_type_presets(bargs)
    pol_blind = build_policy(bargs, make_env("FlyingCartpole"))
    blind_tmpl = pol_blind.init(jax.random.PRNGKey(0))
    blind, _, step, _ = load_checkpoint(args.src, blind_tmpl, None)

    af, atree = jax.tree_util.tree_flatten_with_path(aware)
    bf, _ = jax.tree_util.tree_flatten_with_path(blind)
    bmap = {jax.tree_util.keystr(p): v for p, v in bf}
    out, padded, copied = [], [], 0
    for p, v in af:
        key = jax.tree_util.keystr(p)
        if key not in bmap:
            out.append(v)
            continue
        b = bmap[key]
        if b.shape == v.shape:
            out.append(b)
            copied += 1
        elif (b.ndim == v.ndim == 3 and b.shape[0] == v.shape[0]
              and b.shape[2] == v.shape[2] and v.shape[1] > b.shape[1]):
            pad = jnp.zeros((b.shape[0], v.shape[1] - b.shape[1],
                             b.shape[2]), b.dtype)
            out.append(jnp.concatenate([b, pad], axis=1))
            padded.append((key, b.shape, v.shape))
        else:
            raise SystemExit(f"unhandled shape change at {key}: "
                             f"{b.shape} -> {v.shape}")
    merged = jax.tree_util.tree_unflatten(atree, out)
    print(f"copied {copied} leaves; zero-padded {padded}")

    # sanity: aware forward with zeroed obstacle rows == blind forward
    obs = jnp.asarray(np.random.default_rng(0).uniform(
        -0.2, 0.2, (4, env.nx)), jnp.float32)
    pa, _ = pol_aware.forward(merged, obs, qp_solve=False)
    pb, _ = pol_blind.forward(blind, obs, qp_solve=False)
    d = float(jnp.max(jnp.abs(pa["trajs"][-1][0] - pb["trajs"][-1][0])))
    print(f"max |aware(init) - blind| network proposal: {d:.2e}")
    assert d < 1e-5, "warm start is not behavior-preserving"

    save_checkpoint(args.dst, merged, None, step, targs)
    print(f"wrote {args.dst} (from {args.src} step {step})")


if __name__ == "__main__":
    main()
