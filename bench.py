"""Headline benchmark: solver throughput + full DEQ-MPC step costs.

Four measurements on one chip (f32):
- `rexquad_al_solve_throughput` (headline `value`): batched AL
  trajectory solves/s, RexQuadrotor T=5 al_iter=2 at bsz 1024
  (BASELINE.md config #4 — the hardest per-sample KKT blocks, 16x16).
  `vs_baseline` is relative to the BASELINE.json north-star target of
  10,000 solves/s on a v5e chip (the reference publishes no numbers).
- `deqmpc_fwd_ms` / `deqmpc_fwd_throughput`: the full DEQ-MPC policy
  forward (deq_iter=6 x {network -> AL solve}, hdim=256) — the
  quantity a user of the reference's `policy.forward` pays
  (`deqmpc/policies.py:107-203`).
- `train_step_ms`: one jitted train step (forward + per-iteration loss
  + implicit backward + Adam) on the rexquad config at bsz 128,
  matching the reference's measurement intent (`train.py:355-376`).
- `streaming_warm_ms` / `realtime_margin`: per-tick latency of the
  warm-started receding-horizon forward at control batch 1 vs the
  env control period (BASELINE config #5, `qpth/AL_mpc.py:342-423`).

Prints ONE JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, n_warmup=2, n_rep=20):
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep, out


def _time_stats(fn, *args, n_warmup=2, n_rep=20, n_blocks=7):
    """Median +/- spread over n_blocks independently timed blocks of
    n_rep calls each. Single-block timings through the TPU tunnel carry
    ~0.6 ms RPC jitter per dispatch, which round-4 showed can invert a
    0.3 ms comparison (lin vs nonlinear tick); the block median with a
    p10-p90 band makes regressions distinguishable from noise."""
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    per_call = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = fn(*args)
        jax.block_until_ready(out)
        per_call.append((time.perf_counter() - t0) / n_rep)
    per_call = np.asarray(per_call)
    stats = {
        "med": float(np.median(per_call)),
        "p10": float(np.percentile(per_call, 10)),
        "p90": float(np.percentile(per_call, 90)),
    }
    return stats, out


def main():
    from deqmpc_tpu.envs import RexQuadrotor
    from deqmpc_tpu.policies import (DEQMPCPolicy, PolicyConfig,
                                     compute_loss_deqmpc)
    from deqmpc_tpu.policies.tracking_mpc import TrackingMPC

    env = RexQuadrotor()
    T = 5
    rng = np.random.default_rng(0)

    # --- 1. bare solver throughput (headline) ----------------------------
    bsz = 1024
    tracking = TrackingMPC(env, T, al_iter=2, dtype=jnp.float32, rho_max=1e5)
    x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (bsz, env.nx)), jnp.float32)
    x_ref = jnp.broadcast_to(
        jnp.asarray(env.targ_pos, jnp.float32), (bsz, T, env.nx)
    )
    u_ref = jnp.full((bsz, T, env.nu), env.u_hover, jnp.float32)

    @jax.jit
    def solve(x0):
        st = tracking.init_state(bsz)
        xs, us, status, _ = tracking(x0, x_ref, u_ref, st, al_iters=2)
        return xs, us

    dt_solve, (xs, us) = _time(solve, x0)
    assert bool(jnp.all(jnp.isfinite(us))), "non-finite solver output"
    solves_per_s = bsz / dt_solve

    # roofline context: XLA's own FLOP count for the solve program vs
    # the chip's peak (VERDICT r2: "no MFU estimate anywhere"). The
    # solve is dominated by batched small-matrix algebra, so a low MFU
    # is expected — the number contextualizes solves/s as a fraction of
    # speed-of-light rather than proving MXU saturation.
    try:
        cost = solve.lower(x0).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        solve_gflop = float(cost.get("flops", float("nan"))) / 1e9
    except Exception:
        solve_gflop = float("nan")
    achieved_gflops = solve_gflop / dt_solve
    kind = jax.devices()[0].device_kind.lower()
    # published f32 (non-MXU-bf16) peaks; MXU runs f32 at half bf16 rate
    peaks_tf32 = {"v5e": 98.0, "v5 lite": 98.0, "v4": 137.0,
                  "v5p": 229.0, "v6e": 459.0, "v6 lite": 459.0}
    peak = next((v for k, v in peaks_tf32.items() if k in kind), None)
    mfu = (achieved_gflops / 1e3 / peak) if peak else None

    # --- 2/3. full DEQ-MPC forward + train step (config #4) --------------
    import optax

    fb = 128
    cfg = PolicyConfig(
        nx=env.nx, nu=env.nu, nq=env.nx // 2, T=T, dt=env.dt, bsz=fb,
        hdim=256, layer_type="gcn", deq_iter=6, solver_dtype=jnp.float32,
        rho_max=1e5,
    )
    policy = DEQMPCPolicy(cfg, env)
    params = policy.init(jax.random.PRNGKey(0))
    obs = jnp.asarray(rng.uniform(-0.3, 0.3, (fb, env.nx)), jnp.float32)
    batch = {
        "state": jnp.asarray(rng.normal(size=(fb, T, env.nx)) * 0.3,
                             jnp.float32),
        "action": jnp.full((fb, T, env.nu), env.u_hover, jnp.float32),
        "mask": jnp.ones((fb, T), jnp.float32),
    }

    @jax.jit
    def fwd(params, obs):
        po, _ = policy.forward(params, obs, qp_solve=True)
        return po["trajs"][-1][1]

    fwd_st, out = _time_stats(fwd, params, obs, n_rep=10, n_blocks=5)
    dt_fwd = fwd_st["med"]
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite forward"

    # phase split (VERDICT r2 #6): network-only forward isolates the
    # DEQ-cell share; solver share = full - network; backward+opt =
    # train_step - full forward (includes the loss, which is cheap)
    @jax.jit
    def net_fwd(params, obs):
        po, _ = policy.forward(params, obs, qp_solve=False)
        return po["trajs"][-1][0]

    dt_net, _ = _time(net_fwd, params, obs, n_rep=10)

    optimizer = optax.chain(optax.clip_by_global_norm(2.0), optax.adam(1e-3))
    opt_state = optimizer.init(params)

    def loss_fn(p):
        po, _ = policy.forward(p, obs, qp_solve=True)
        d = compute_loss_deqmpc(policy, batch["state"], batch["action"],
                                batch["mask"], po,
                                x_init=po["init_states"])
        return d["loss"]

    @jax.jit
    def train_step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    train_st, (_, _, loss) = _time_stats(train_step, params, opt_state,
                                         n_rep=10, n_blocks=5)
    dt_train = train_st["med"]
    assert np.isfinite(float(loss)), "non-finite train loss"

    # --- 4. streaming warm-start per-tick latency at batch 1 -------------
    scfg = PolicyConfig(
        nx=env.nx, nu=env.nu, nq=env.nx // 2, T=T, dt=env.dt, bsz=1,
        hdim=256, layer_type="gcn", deq_iter=3, solver_dtype=jnp.float32,
        rho_max=1e5,
    )
    spolicy = DEQMPCPolicy(scfg, env)
    sparams = spolicy.init(jax.random.PRNGKey(0))
    sobs = obs[:1]

    @jax.jit
    def cold(params, x):
        po, carry = spolicy.forward(params, x, qp_solve=True)
        return po["trajs"][-1][2][:, 0], carry

    @jax.jit
    def warm(params, x, carry):
        po, carry = spolicy.forward_warm_start(params, x, carry,
                                               qp_solve=True)
        return po["trajs"][-1][2][:, 0], carry

    _, (u0, carry) = _time(cold, sparams, sobs, n_rep=5)
    warm_st, _ = _time_stats(warm, sparams, sobs, carry, n_rep=50)
    dt_warm = warm_st["med"]
    assert bool(jnp.all(jnp.isfinite(u0))), "non-finite control"

    # linearize-once streaming tick (`AL_mpc.py:370-391`): frozen
    # dynamics Jacobians per tick — the O(1)-Jacobian real-time path
    import dataclasses

    lpolicy = DEQMPCPolicy(dataclasses.replace(scfg, linearize_once=True),
                           env)

    @jax.jit
    def warm_lin(params, x, carry):
        po, carry = lpolicy.forward_warm_start(params, x, carry,
                                               qp_solve=True)
        return po["trajs"][-1][2][:, 0], carry

    lin_st, (u_lin, _) = _time_stats(warm_lin, sparams, sobs, carry,
                                     n_rep=50)
    dt_warm_lin = lin_st["med"]
    assert bool(jnp.all(jnp.isfinite(u_lin))), "non-finite lin control"

    target = 10_000.0

    def _finite(v, nd):
        # cost_analysis() failures propagate NaN into the derived
        # roofline numbers; json.dumps would then emit non-RFC `NaN`
        # and break the one-line-JSON contract for strict parsers
        if v is None or not np.isfinite(v):
            return None
        return round(float(v), nd)

    print(json.dumps({
        "metric": "rexquad_al_solve_throughput",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / target, 3),
        "deqmpc_fwd_ms": round(dt_fwd * 1e3, 2),
        "deqmpc_fwd_throughput": round(fb / dt_fwd, 1),
        "train_step_ms": round(dt_train * 1e3, 2),
        "train_step_ms_p10": round(train_st["p10"] * 1e3, 2),
        "train_step_ms_p90": round(train_st["p90"] * 1e3, 2),
        "phase_network_fwd_ms": round(dt_net * 1e3, 2),
        "phase_solver_fwd_ms": round((dt_fwd - dt_net) * 1e3, 2),
        "phase_backward_opt_ms": round((dt_train - dt_fwd) * 1e3, 2),
        "solve_gflop_per_batch": _finite(solve_gflop, 3),
        "solve_achieved_gflops": _finite(achieved_gflops, 1),
        "device_kind": kind,
        "solve_mfu_f32": _finite(mfu, 5),
        "streaming_warm_ms": round(dt_warm * 1e3, 3),
        "streaming_warm_ms_p10": round(warm_st["p10"] * 1e3, 3),
        "streaming_warm_ms_p90": round(warm_st["p90"] * 1e3, 3),
        "streaming_warm_lin_ms": round(dt_warm_lin * 1e3, 3),
        "streaming_warm_lin_ms_p10": round(lin_st["p10"] * 1e3, 3),
        "streaming_warm_lin_ms_p90": round(lin_st["p90"] * 1e3, 3),
        "control_period_ms": round(env.dt * 1e3, 2),
        "realtime_margin": round(env.dt / dt_warm, 2),
    }))


if __name__ == "__main__":
    main()
