"""Expert-trajectory generation: the AL solver as the MPC teacher.

The reference trains from expert pickles produced by SAC/CGAC/MPC
teachers that are not in the public release (`datagen.py:15-29`,
SURVEY.md §0). We regenerate them with a receding-horizon MPC expert
built from this framework's own AL solver (the controllable path,
SURVEY.md §7 stage 3): long-horizon tracking of the env's target,
warm-started step to step, applying the first control.

Usage:
    python -m deqmpc_tpu.data.expert_gen --env pendulum --episodes 256
"""
from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from ..envs import make_env
from ..policies.tracking_mpc import TrackingMPC
from .datagen import DATA_DIR, expert_data_path


def generate_mpc_expert(env, n_episodes: int = 256, ep_len: int = 200,
                        horizon: int = 30, seed: int = 0,
                        al_iters: int = 8, rho_init_max: float = 1e4,
                        noise_std: float = 0.0, env_name: str = None,
                        x0=None, dtype=jnp.float32):
    """Closed-loop batched MPC rollouts. Returns a list of episodes,
    each a list of (state, action) tuples (reference pickle format).

    al_iters must be enough to drive rho high (rho0=1, x10/iter): with
    few AL iterations the initial-state constraint is still soft and
    the "solution" starts from a fantasy x0 nearer the target, so the
    applied first action is garbage (measured: dyn_res 0.5 at
    al_iters=2 vs 1e-3 at 8 on RexQuadrotor).

    noise_std > 0 records the CLEAN expert action but steps the env
    with a noise-perturbed one (DART-style), so the dataset covers a
    tube around the expert manifold like the reference's stochastic
    SAC/CGAC teachers did.

    Angle-wrapped envs (cartpole wraps into [0, 2pi) with the target
    AT the wrap boundary, `my_envs/cartpole.py:90-92,177`): the
    teacher plans on a continuous (unwrapped) shadow state, with the
    reference angle snapped per step to the nearest 2pi-multiple of
    the target, and records the env-convention wrapped state. Without
    this, a pole at theta=6.27 looks a full revolution away from
    theta=0 and the "expert" swings it all the way around.
    """
    bsz = n_episodes if x0 is None else len(x0)
    tracking = TrackingMPC(env, horizon, al_iter=al_iters, dtype=dtype,
                           max_newton_steps=8, rho_max=1e8)
    targ = jnp.asarray(env.targ_pos, jnp.float32)
    idxs = utils.angle_idxs_for_env(env_name or env.spec_id, env.nx)
    idxs = None if idxs is None or len(idxs) == 0 else jnp.asarray(idxs)
    x_ref_tile = jnp.broadcast_to(targ, (bsz, horizon, env.nx))

    def snap_ref(x):
        """Target trajectory with angle dims moved to the nearest
        2pi-multiple of the target angle, per sample."""
        if idxs is None:
            return x_ref_tile
        th, tg = x[:, idxs], targ[idxs]
        snapped = tg + 2 * jnp.pi * jnp.round((th - tg) / (2 * jnp.pi))
        return x_ref_tile.at[:, :, idxs].set(snapped[:, None, :])

    # reference action: the env's trim action (hover thrust for
    # RexQuadrotor, zero for envs that offset internally)
    u_ref_tile = jnp.full((bsz, horizon, env.nu), env.u_trim, jnp.float32)

    u_lo = jnp.asarray(env.action_space.low)
    u_hi = jnp.asarray(env.action_space.high)

    @jax.jit
    def rollout(x0, sol_state0, key):
        def body(carry, k):
            x, sol_state = carry  # x: continuous (unwrapped) state
            # freeze diverged lanes: a lane that has left any physical
            # envelope (nominal states are |x| < ~10 on every env)
            # keeps the solver pinned at its iteration caps — slowing
            # every chunk ~4x — and, integrating toward inf, has
            # faulted the TPU worker mid-scan (cartpole DAgger
            # shards). The episode is dead data regardless (the dead
            # mask is threaded out of the scan and drops the lane), so
            # hold its state and solve from the origin in its lane.
            dead = jnp.any(jnp.abs(x) > 50.0, axis=-1) | \
                jnp.any(~jnp.isfinite(x), axis=-1)
            x_solve = jnp.where(dead[:, None], 0.0, x)
            xs, us, status, sol_state = tracking(
                x_solve.astype(jnp.float32), snap_ref(x_solve), u_ref_tile,
                sol_state, al_iters=al_iters,
            )
            u0 = jnp.clip(us[:, 0], u_lo, u_hi)
            u_apply = u0
            if noise_std > 0:
                u_apply = jnp.clip(
                    u0 + noise_std * jax.random.normal(k, u0.shape), u_lo, u_hi
                )
            x_next = env.dynamics(x, u_apply)  # no wrap on the shadow state
            x_next = jnp.where(dead[:, None], x, x_next)
            sol_state = tracking.warm_start_state(sol_state, rho_init_max)
            return (x_next, sol_state), (env.state_clip(x), u0, dead)

        carry, (xs, us, deads) = jax.lax.scan(body, (x0, sol_state0), key)
        return carry, xs, us, deads

    rng = jax.random.PRNGKey(seed)
    rng, kr = jax.random.split(rng)
    if x0 is None:
        x0 = env.reset(rng, bsz)
    else:
        x0 = jnp.asarray(x0, jnp.result_type(float))
        bsz = x0.shape[0]
    # chunk the scan: ONE device call covering the whole episode can
    # exceed the TPU tunnel's per-execution deadline when many lanes
    # run the solver to its iteration caps (observed: 16 diverging
    # lanes x 200 steps x H=60 -> "TPU worker crashed"; the same
    # program in 50-step chunks completes)
    chunk = 50
    carry = (x0, tracking.init_state(bsz))
    xs_parts, us_parts, dead_parts = [], [], []
    for lo in range(0, ep_len, chunk):
        n = min(chunk, ep_len - lo)
        kr, sub = jax.random.split(kr)
        carry, xs_c, us_c, dead_c = rollout(carry[0], carry[1],
                                            jax.random.split(sub, n))
        xs_parts.append(xs_c)
        us_parts.append(us_c)
        dead_parts.append(dead_c)
    xs = jnp.concatenate(xs_parts, axis=0)
    us = jnp.concatenate(us_parts, axis=0)
    states = np.moveaxis(np.asarray(xs), 0, 1)   # (bsz, ep_len, nx)
    actions = np.moveaxis(np.asarray(us), 0, 1)
    ever_dead = np.asarray(jnp.concatenate(dead_parts, axis=0)).any(axis=0)
    # drop lanes that went non-finite AND lanes the in-scan freeze held
    # at a diverged state (held-state/origin-action pairs are garbage;
    # the recorded states alone can't reveal them — state_clip wraps
    # angles and clips pendulum speed, masking the divergence)
    ok = (np.isfinite(states).all(axis=(1, 2))
          & np.isfinite(actions).all(axis=(1, 2))
          & ~ever_dead)
    episodes = []
    for b in np.nonzero(ok)[0]:
        episodes.append(
            [(states[b, t], actions[b, t]) for t in range(ep_len)]
        )
    return episodes


def generate_cartpole2l_capture_expert(env, n_episodes: int = 256,
                                       ep_len: int = 300, horizon: int = 60,
                                       seed: int = 0, al_iters: int = 10,
                                       noise_std: float = 0.3,
                                       tol: float = 0.25, x0=None):
    """Cartpole2link expert in the capture/stabilize regime: starts with
    joint angles within +-0.7 of upright, cart within +-1, moderate
    velocities; failed lanes filtered at `tol`.

    The receding-horizon quadratic-cost MPC teacher cannot discover the
    full 2-link swing-up from hanging (measured: median final error
    6.96 at horizon 80) — that needs a global planner (the reference's
    own cross-check used Julia ALTRO, `test_trajopt_altro.jl`, and its
    data pipeline is not public, `datagen.py:16-29`). The capture
    regime is where the teacher is competent (measured: 96% of lanes
    within 0.25, median 0.03) and is the regime a T-step tracking
    policy operates in."""
    if x0 is None:
        rng = np.random.default_rng(seed)
        x0 = np.zeros((n_episodes, 6), np.float32)
        x0[:, 0] = rng.uniform(-1.0, 1.0, n_episodes)
        x0[:, 1:3] = rng.uniform(-0.7, 0.7, (n_episodes, 2))
        x0[:, 3:] = rng.uniform(-1.0, 1.0, (n_episodes, 3))
    eps = generate_mpc_expert(env, ep_len=ep_len, horizon=horizon,
                              al_iters=al_iters, noise_std=noise_std,
                              env_name="cartpole2link", x0=x0, seed=seed)
    kept = []
    for ep in eps:
        err = np.asarray(ep[-1][0]) - np.asarray(env.targ_pos)
        err[1:3] = np.mod(err[1:3] + np.pi, 2 * np.pi) - np.pi
        if np.linalg.norm(err) < tol:
            kept.append(ep)
    return kept


def generate_pendulum_energy_expert(env, n_episodes: int = 256,
                                    ep_len: int = 200, seed: int = 0,
                                    k_e: float = 1.0, k_p: float = 30.0,
                                    k_d: float = 6.0,
                                    noise_std: float = 0.05, x0=None):
    """Energy-shaping swing-up + PD capture for the torque-limited
    pendulum (theta = 0 down, target pi up). The short-horizon MPC
    expert gets stuck in the hanging local minimum (the reference used
    a SAC teacher for pendulum, `datagen.py:16`); the classic
    energy-pump law u = k_e * (E* - E) * sign(thetadot) with a PD
    capture near the top is the analytic teacher. Small exploration
    noise diversifies the dataset."""
    m, l, g = env.m, env.l, env.g
    E_des = 2 * m * g * l  # potential at upright: m g l (1 - cos(pi))
    u_max = float(env.max_torque)

    def expert_u(x, key):
        theta, thetadot = x[..., 0], x[..., 1]
        E = 0.5 * m * l**2 * thetadot**2 + m * g * l * (1 - jnp.cos(theta))
        # angle error to the nearest upright representation
        err = jnp.mod(theta - jnp.pi + jnp.pi, 2 * jnp.pi) - jnp.pi
        # PD capture only where +-u_max can dominate gravity
        # (linearized upright growth rate g/l): |err| < ~0.15
        near_top = jnp.logical_and(jnp.abs(err) < 0.15, jnp.abs(thetadot) < 2.5)
        u_pump = k_e * (E_des - E) * jnp.sign(
            jnp.where(jnp.abs(thetadot) < 1e-3, 1.0, thetadot)
        )
        u_pd = -k_p * err - k_d * thetadot
        u = jnp.where(near_top, u_pd, u_pump)
        u = u + noise_std * jax.random.normal(key, u.shape)
        return jnp.clip(u, -u_max, u_max)[..., None]

    rng = jax.random.PRNGKey(seed)
    rng, r0, r1, r2 = jax.random.split(rng, 4)
    if x0 is None:
        x0 = env.reset(r0, n_episodes)
        # catch-phase coverage: the PD-stabilizable basin at the top is
        # tiny (u_max=2 vs mgl=10 -> |err| < ~0.2), and the swing-up
        # transient passes through it for only a few steps per episode.
        # Start a third of the episodes near the top so the policy sees
        # dense catch/recover behavior.
        n_catch = n_episodes // 3
        if n_catch > 0:
            th0 = jnp.pi + jax.random.uniform(r1, (n_catch,), minval=-0.9, maxval=0.9)
            thd0 = jax.random.uniform(r2, (n_catch,), minval=-2.5, maxval=2.5)
            x0 = x0.at[:n_catch].set(jnp.stack([th0, thd0], axis=-1))
    else:
        x0 = jnp.asarray(x0, jnp.result_type(float))

    @jax.jit
    def rollout(x0, key):
        def body(x, k):
            u = expert_u(x, k)
            x_next, _ = env.step(x, u)
            return x_next, (x, u)

        keys = jax.random.split(key, ep_len)
        _, (xs, us) = jax.lax.scan(body, x0, keys)
        return xs, us

    xs, us = rollout(x0, rng)
    states = np.moveaxis(np.asarray(xs), 0, 1)   # (bsz, ep_len, nx)
    actions = np.moveaxis(np.asarray(us), 0, 1)
    episodes = [
        [(states[b, t], actions[b, t]) for t in range(ep_len)]
        for b in range(states.shape[0])
    ]
    return episodes


def generate_flying_cartpole_expert(env, n_episodes: int = 256,
                                    ep_len: int = 240, seed: int = 0,
                                    noise_std: float = 0.005, x0=None,
                                    capture_kp: float = 16.0,
                                    capture_kd: float = 2.0,
                                    pos_kp: float = 0.7,
                                    pos_kv: float = 2.0,
                                    lean_max: float = 0.30,
                                    lead: float = 0.22,
                                    success_filter: bool = True,
                                    ang_tol: float = 0.25,
                                    pos_tol: float = 0.25):
    """Cascade analytic teacher for the flying cartpole: pole
    energy-shaping -> desired world acceleration -> geometric attitude
    control -> motor mixing.

    The one-shot AL trajectory optimization cannot discover the
    swing-up from a cold rollout init (lambda blows up at rho=1e8 with
    dyn_res ~0.3 even in f64 — the Gauss-Newton model is too weak for
    this strongly nonlinear system), and the reference's data script
    for this env is not public (`datagen.py:26-28`, SURVEY.md 0).
    The cascade exploits the same structure the pendulum teacher does
    (`generate_pendulum_energy_expert`): pump pole energy via world-x
    acceleration (theta_dd = (g sin + x_dd cos)/L,
    `flying_cartpole2d.py:128-133`), PD-capture near upright, PD the
    quad back to the origin, track the acceleration with a geometric
    attitude controller and invert the motor mixing.
    """
    from ..utils.rotations import mrp2quat, mrp2rot, quatrot

    m, L, g = env.mass, env.L, 9.81
    kf, km = env.kf, env.km
    act_scale, u_hover = env.act_scale, env.u_hover
    J = jnp.asarray(env.J, jnp.float32)
    arms = env.motor_dist * env.ss                       # (4, 3)
    # mixing: per-motor thrust f -> [T, tau_x, tau_y, tau_z]
    mix = np.zeros((4, 4))
    mix[0] = 1.0                                          # total thrust
    mix[1] = arms[:, 1]                                   # tau_x =  a_y f
    mix[2] = -arms[:, 0]                                  # tau_y = -a_x f
    mix[3] = (km / kf) * np.array([1.0, -1.0, 1.0, -1.0])  # yaw drag
    mix_inv = jnp.asarray(np.linalg.inv(mix), jnp.float32)
    E_star = 2 * g / L
    u_lo = jnp.asarray(env.action_space.low)
    u_hi = jnp.asarray(env.action_space.high)

    a_h_max = g * np.tan(np.deg2rad(28.0))  # tilt-limited lateral accel

    def expert_u(x, mode, key):
        """mode: per-lane bool, True once the capture controller has
        engaged (hysteresis: engage in a tight window, release only if
        the pole clearly escapes — prevents chattering at the window
        boundary, which re-kicks the pole every time)."""
        r, p, th = x[..., :3], x[..., 3:6], x[..., 6]
        v, w, thd = x[..., 7:10], x[..., 10:13], x[..., 13]
        q = mrp2quat(p)
        vel_w = quatrot(q, v)                             # world velocity
        R = mrp2rot(p)                                    # body->world

        # --- pole loop: desired world-x acceleration ---
        e_th = jnp.mod(th - jnp.pi + jnp.pi, 2 * jnp.pi) - jnp.pi
        E = 0.5 * thd**2 + (g / L) * (1 - jnp.cos(th))
        engage = jnp.logical_and(jnp.abs(e_th) < 0.3, jnp.abs(thd) < 1.6)
        release = jnp.logical_or(jnp.abs(e_th) > 0.75, jnp.abs(thd) > 3.5)
        near = jnp.logical_and(jnp.logical_or(mode, engage),
                               jnp.logical_not(release))
        # bang-bang energy pump (dE/dt = thd * x_dd * cos(th) / L): a
        # magnitude ~ energy deficit, sign following thd*cos(th), with
        # a kick when starting at rest. Target slightly ABOVE E* so the
        # pole actually reaches the top (with sqrt(2*eps) residual
        # speed) instead of stalling asymptotically below it.
        pump_dir = thd * jnp.cos(th)
        pump_dir = jnp.where(jnp.abs(pump_dir) < 1e-3, 1.0, jnp.sign(pump_dir))
        ax_pump = jnp.clip(1.5 * jnp.abs(1.005 * E_star - E), 0.3, 3.0) * pump_dir
        ax_pump = ax_pump + jnp.clip(-0.45 * r[..., 0] - 1.1 * vel_w[..., 0], -1.8, 1.8)
        # capture: pole-dominant linear law (k_e must exceed g for the
        # upright linearization e_dd = (g e - a)/L; authority cap keeps
        # the basin tilt-feasible). Position feedback acts through a
        # desired pole LEAN, not an additive accel: sustained accel a
        # requires e = a/g at pole equilibrium (theta_dd = 0), so
        # commanding e_des = a_pos_des/g and feeding g*e_des forward
        # decelerates the quad while the pole stays balanced.
        # gate position feedback by pole stability: chasing x while the
        # pole still wobbles ejects it from the capture basin (measured:
        # strong gains cut teacher survival 18/32 -> 11/32 ungated)
        stab = jnp.exp(-((e_th / 0.25) ** 2) - (thd / 1.2) ** 2)
        e_des = stab * jnp.clip(
            (-pos_kp * r[..., 0] - pos_kv * vel_w[..., 0]) / g,
            -lean_max, lean_max)
        # lead compensation: the attitude loop takes ~2 control steps
        # (0.1 s) to realize a demanded tilt, a long delay against the
        # pole's 0.23 s time constant — act on the PREDICTED error
        e_lead = e_th + lead * thd
        ax_capture = jnp.clip(
            capture_kp * (e_lead - e_des) + capture_kd * thd + g * e_des,
            -a_h_max, a_h_max)
        a_x = jnp.where(near, ax_capture, ax_pump)

        # --- position loop (y, z) ---
        a_y = jnp.clip(-1.5 * r[..., 1] - 2.2 * vel_w[..., 1], -2.0, 2.0)
        a_z = jnp.clip(-1.5 * r[..., 2] - 2.2 * vel_w[..., 2], -2.0, 2.0)
        # tilt limiter: keep the demanded lateral acceleration inside
        # what a ~25deg tilt can deliver; beyond it the thrust budget
        # (+-30% of hover) collapses vertically and the cascade breaks
        a_lat = jnp.sqrt(a_x**2 + a_y**2) + 1e-9
        scale = jnp.minimum(1.0, a_h_max / a_lat)
        a_des = jnp.stack([a_x * scale, a_y * scale, a_z], axis=-1)

        # --- thrust vector -> desired attitude (yaw = 0) ---
        f_w = m * (a_des + jnp.array([0.0, 0.0, g]))      # required world force
        T_des = jnp.linalg.norm(f_w, axis=-1)
        z_b = f_w / jnp.maximum(T_des[..., None], 1e-6)
        x_c = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), z_b.shape)
        y_b = jnp.cross(z_b, x_c)
        y_b = y_b / jnp.maximum(jnp.linalg.norm(y_b, axis=-1, keepdims=True), 1e-6)
        x_b = jnp.cross(y_b, z_b)
        R_des = jnp.stack([x_b, y_b, z_b], axis=-1)       # columns

        # --- geometric attitude PD ---
        M = jnp.swapaxes(R_des, -1, -2) @ R - jnp.swapaxes(R, -1, -2) @ R_des
        e_R = 0.5 * jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)
        Jw = w @ J.T
        tau = (-100.0 * e_R - 20.0 * w) @ J.T + jnp.cross(w, Jw)

        # --- motor mixing; thrust along CURRENT body z: project the
        # desired force onto it (standard geometric control) ---
        T_body = jnp.maximum(jnp.sum(f_w * R[..., :, 2], axis=-1), 0.1)
        wrench = jnp.concatenate([T_body[..., None], tau], axis=-1)
        f_motor = wrench @ mix_inv.T                      # per-motor thrust
        u = f_motor / (kf * act_scale) - u_hover
        u = u + noise_std * jax.random.normal(key, u.shape)
        return jnp.clip(u, u_lo, u_hi), near

    rng = jax.random.PRNGKey(seed)
    rng, r0, r1, r2 = jax.random.split(rng, 4)
    if x0 is None:
        x0 = env.reset(r0, n_episodes)
        # catch-phase coverage (as in the pendulum teacher): a third of
        # the episodes start with the pole near upright at moderate
        # position offsets — dense capture/stabilize data, the regime a
        # T=5 receding-horizon policy actually operates in
        n_catch = n_episodes // 3
        if n_catch > 0:
            xc = jnp.zeros((n_catch, 14))
            xc = xc.at[:, :3].set(jax.random.uniform(r1, (n_catch, 3),
                                                     minval=-3.0, maxval=3.0))
            th0 = jnp.pi + jax.random.uniform(r2, (n_catch,), minval=-0.5, maxval=0.5)
            xc = xc.at[:, 6].set(th0)
            x0 = x0.at[:n_catch].set(xc)
    else:
        x0 = jnp.asarray(x0, jnp.result_type(float))

    @jax.jit
    def rollout(x0, key):
        def body(carry, k):
            x, mode = carry
            u, mode = expert_u(x, mode, k)
            x_next = env.dynamics(x, u)                   # unwrapped shadow state
            return (x_next, mode), (env.state_clip(x), u)

        keys = jax.random.split(key, ep_len)
        mode0 = jnp.zeros(x0.shape[0], bool)
        (_, _), (xs, us) = jax.lax.scan(body, (x0, mode0), keys)
        return xs, us

    xs, us = rollout(x0, rng)
    states = np.moveaxis(np.asarray(xs), 0, 1)
    actions = np.moveaxis(np.asarray(us), 0, 1)
    ok = (np.isfinite(states).all(axis=(1, 2))
          & np.isfinite(actions).all(axis=(1, 2)))
    # keep only episodes the teacher itself solved — a failed swing-up
    # is corrupt supervision, not coverage
    ang_f = np.abs(np.mod(states[:, -1, 6] - np.pi + np.pi, 2 * np.pi) - np.pi)
    pos_f = np.linalg.norm(states[:, -1, :3], axis=-1)
    if success_filter:
        # the dataset-quality gate (tests/test_expert_teachers.py)
        # requires >=95% of kept episodes within 0.25 — enforce it at
        # the source: oversample raw episodes, keep only solved ones
        ok &= (ang_f < ang_tol) & (pos_f < pos_tol)
    if getattr(env, "obstacles", False):
        # obstacle variant: the cascade teacher is obstacle-blind, so
        # keep only episodes whose whole path is collision-free —
        # avoidance at deployment comes from the solver's sphere
        # constraints (`AL_mpc_custom.py`), but the imitation targets
        # must not thread through obstacles
        collided = np.asarray(env.check_collisions(jnp.asarray(states)))
        ok &= ~collided.any(axis=1)
    return [
        [(states[b, t], actions[b, t]) for t in range(ep_len)]
        for b in np.nonzero(ok)[0]
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="pendulum")
    p.add_argument("--episodes", type=int, default=256)
    # ep_len/horizon/al_iters/noise_std default to None so each
    # teacher's tuned defaults apply; a flag only overrides when given.
    # (Bug fixed here: the old CLI defaults (horizon 30, al_iters 2)
    # silently overrode the cartpole2link capture teacher's tuned
    # horizon 60 / al_iters 10 and produced 0 successful episodes.)
    p.add_argument("--ep_len", type=int, default=None)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--teacher", type=str, default="mpc")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend so data generation can run "
                        "while the single TPU chip is busy training")
    p.add_argument("--al_iters", type=int, default=None)
    p.add_argument("--noise_std", type=float, default=None,
                   help="exploration noise of the analytic teacher; wide "
                        "coverage around the expert tube is what makes "
                        "behavior cloning robust in closed loop (the "
                        "reference's SAC/CGAC teachers are stochastic)")
    p.add_argument("--x0_npz", type=str, default=None,
                   help="npz with array 'x0': explicit start states "
                        "(DAgger corrective shards run as fresh "
                        "subprocesses — one giant in-process teacher "
                        "program crashes the TPU worker)")
    p.add_argument("--append", action="store_true",
                   help="append to the dataset pickle instead of "
                        "overwriting it")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    x0 = None
    if args.x0_npz:
        x0 = np.load(args.x0_npz)["x0"]

    env = make_env(args.env)
    if args.env.startswith("pendulum") and not args.env.endswith("stabilize"):
        episodes = generate_pendulum_energy_expert(
            env, n_episodes=args.episodes, seed=args.seed,
            ep_len=args.ep_len if args.ep_len is not None else 200,
            noise_std=args.noise_std if args.noise_std is not None else 0.2,
            **({"x0": x0} if x0 is not None else {}),
        )
    elif "FlyingCartpole" in args.env:
        episodes = generate_flying_cartpole_expert(
            env, n_episodes=args.episodes, seed=args.seed,
            ep_len=args.ep_len if args.ep_len is not None else 200,
            **({"x0": x0} if x0 is not None else {}),
        )
    elif args.env == "cartpole2link":
        # tuned defaults of the capture teacher (ep_len 300, horizon 60,
        # al_iters 10, noise 0.3) apply unless explicitly overridden
        episodes = generate_cartpole2l_capture_expert(
            env, n_episodes=args.episodes, seed=args.seed,
            **({"x0": x0} if x0 is not None else {}),
            **{k: getattr(args, k) for k in
               ("ep_len", "horizon", "al_iters", "noise_std")
               if getattr(args, k) is not None},
        )
    else:
        episodes = generate_mpc_expert(
            env, n_episodes=args.episodes, seed=args.seed, env_name=args.env,
            ep_len=args.ep_len if args.ep_len is not None else 200,
            horizon=args.horizon if args.horizon is not None else 30,
            al_iters=args.al_iters if args.al_iters is not None else 2,
            noise_std=args.noise_std if args.noise_std is not None else 0.2,
            x0=x0,
        )
    os.makedirs(DATA_DIR, exist_ok=True)
    path = expert_data_path(env.spec_id, args.teacher)
    if args.append and os.path.exists(path):
        with open(path, "rb") as f:
            episodes = pickle.load(f) + episodes
    # write-then-rename: shard subprocesses crash (TPU worker faults)
    # and a crash mid pickle.dump must not truncate the accumulated
    # dataset in place
    tmp_path = path + ".tmp"
    with open(tmp_path, "wb") as f:
        pickle.dump(episodes, f)
    os.replace(tmp_path, path)
    # quick quality report: mean final distance to target (wrap-aware
    # on angle dims — a converged pole at 6.283 is at the target, not
    # 2pi away)
    finals = np.stack([ep[-1][0] for ep in episodes])
    err = finals - np.asarray(env.targ_pos)
    idxs = utils.angle_idxs_for_env(args.env, env.nx)
    if idxs is not None and len(idxs) > 0:
        err[:, idxs] = np.mod(err[:, idxs] + np.pi, 2 * np.pi) - np.pi
    d = np.linalg.norm(err, axis=-1)
    print(f"wrote {len(episodes)} episodes to {path}")
    print(f"final |x - targ|: mean {d.mean():.3f} median {np.median(d):.3f}")


if __name__ == "__main__":
    main()
