"""DEQ layers: fixed-point trajectory-proposal networks.

Counterpart of the reference's `deqmpc/deq_layer.py` (base DEQLayer
:32-264) and `deq_layer_utils.py` fixed-point wrappers (:120-190),
re-designed functionally for JAX: flax modules are leaf blocks, the
fixed-point solve runs through `.apply` closures so the Anderson loop
is plain `lax.fori_loop` (no lifted transforms), and the whole layer
jits inside the policy's training step.

Gradient semantics ("phantom gradient", `deq_layer_utils.py:173-190`):
the Anderson/Broyden solve runs under stop_gradient, then the cell is
re-applied 3 times with gradients engaged — NOT implicit
differentiation. `grad_type='bptt'` (unrolled) and 'last_step_grad'
are also supported via fp_type='multi'/'single', and
`grad_type='implicit'` gives the true implicit-VJP backward of the
legacy `DEQPolicy` (`deq_layer.py:1334-1355`): the cotangent solves
the transpose fixed point w = J'w + g with the same accelerated
solver, then pulls back through one cell application.

Decode convention (`deq_layer.py:81-90`): the network emits
(T-1) x nx deltas; positions integrate from the *current* state
(x_ref_pos = x0_pos + dq*dt), velocities are direct predictions, and
the current observation is prepended as knot 0.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..solvers.fp import anderson, broyden
from .blocks import (ConvCell, ConvInput, ConvOutput, MLPCell, MLPInput,
                     MLPOutput)

Array = jax.Array


def make_implicit_fp(cell_apply, solver, **solver_kwargs):
    """Fixed-point solve with true implicit-VJP backward (the legacy
    `DEQPolicy.deq_fixed_point`, `deq_layer.py:1334-1355`).

    Forward: z* = solver(f(.)), f(z) = cell_apply(params, inj, z).
    Backward: w solves the transpose fixed point w = (df/dz)'w + g via
    the SAME accelerated solver (reference registers a backward hook
    running its solver on the JVP closure); parameter/input cotangents
    are one VJP of f at z* contracted with w. No gradient flows to z0.

    Returns fp(params, inj, z0) -> (z_star, best_err, best_step).
    """

    @jax.custom_vjp
    def fp(cell_params, inj, z0):
        z_star, info = solver(
            lambda zz: lax.stop_gradient(cell_apply(cell_params, inj, zz)),
            lax.stop_gradient(z0), **solver_kwargs)
        return z_star, info.best_err, info.best_step

    def fp_fwd(cell_params, inj, z0):
        out = fp(cell_params, inj, z0)
        return out, (cell_params, inj, out[0])

    def fp_bwd(saved, cots):
        cell_params, inj, z_star = saved
        g = cots[0]  # no cotangents for the stats outputs
        _, vjp_z = jax.vjp(lambda zz: cell_apply(cell_params, inj, zz), z_star)
        w, _ = solver(lambda ww: vjp_z(ww)[0] + g, g, **solver_kwargs)
        _, vjp_pi = jax.vjp(
            lambda p, i: cell_apply(p, i, z_star), cell_params, inj)
        gp, gi = vjp_pi(w)
        return gp, gi, jnp.zeros_like(z_star)

    fp.defvjp(fp_fwd, fp_bwd)
    return fp


@dataclasses.dataclass(frozen=True)
class DEQLayerConfig:
    nx: int
    nu: int
    nq: int
    T: int
    dt: float
    hdim: int = 128
    layer_type: str = "gcn"          # 'mlp' | 'gcn'
    deq_iter: int = 6
    fp_type: str = "anderson"         # 'anderson'|'broyden'|'single'|'multi'
    inner_deq_iters: int = 4          # for fp_type='multi'
    fp_m: int = 5                     # Anderson memory
    fp_max_steps: int = 10            # (`train.py:93` --max_steps)
    fp_tol: float = 1e-2
    grad_type: str = "fp_grad"        # 'fp_grad'|'last_step_grad'|'bptt'
    kernel_width: int = 3
    deq_expand: int = 4
    num_groups: int = 4
    # matmul compute dtype for the trunk (params/norms stay f32):
    # bf16 runs the MXU at full rate — the TPU-native default for the
    # network phase. The solver keeps its own f32/f64 discipline.
    compute_dtype: Any = None  # None = f32; jnp.bfloat16 for MXU rate
    # obstacle-aware input stream: when a static sphere field (N,3) is
    # set, per-knot top-k nearest-obstacle features (clipped offsets +
    # clearance) are appended to the network input. The reference's
    # network is obstacle-blind (`AL_mpc_custom.py` constrains only the
    # solver); the round-4 closed-loop experiment showed a blind
    # reference re-points through spheres faster than a T=5 tracker can
    # avoid them — this stream is the fix.
    obstacle_centers: Any = None   # (N, 3) array or None
    obstacle_radius: float = 0.0
    obstacle_n_sel: int = 4
    obstacle_range: float = 5.0    # sensing clip on offsets/clearance


class DEQLayer:
    """Base DEQ layer: state-prediction output (deq_out_type=1)."""

    def __init__(self, cfg: DEQLayerConfig):
        self.cfg = cfg
        c = cfg
        self.out_dim = c.nx * (c.T - 1)
        if c.layer_type == "mlp":
            self.input_mod = MLPInput(hdim=c.hdim)
            self.cell_mod = MLPCell(hdim=c.hdim, expand=c.deq_expand,
                                    dtype=c.compute_dtype)
            self.out_mod = MLPOutput(out_dim=self.out_dim)
        elif c.layer_type == "gcn":
            self.input_mod = ConvInput(
                hdim=c.hdim, horizon=c.T - 1, kernel_width=c.kernel_width,
                num_groups=c.num_groups, dtype=c.compute_dtype,
            )
            self.cell_mod = ConvCell(
                hdim=c.hdim, expand=c.deq_expand, kernel_width=c.kernel_width,
                num_groups=c.num_groups, dtype=c.compute_dtype,
            )
            self.out_mod = ConvOutput(
                out_dim=c.nx, hdim=c.hdim, kernel_width=c.kernel_width,
                num_groups=c.num_groups, dtype=c.compute_dtype,
            )
        else:
            raise NotImplementedError(c.layer_type)

    # -- params ---------------------------------------------------------------
    def init(self, rng: Array, bsz: int = 2) -> Dict[str, Any]:
        c = self.cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        obs = jnp.zeros((bsz, self._obs_dim()))
        x_prev = jnp.zeros((bsz, c.T, c.nx))
        inj = self._init_input(r1, obs, x_prev)
        z = self.init_z(bsz)
        params_cell = self.cell_mod.init(r2, inj["inj"], z)
        z_out = self.cell_mod.apply(params_cell, inj["inj"], z)
        params_out = self.out_mod.init(r3, z_out)
        # per-iteration embedding parameters (reference
        # `deq_layer.py:214,224`): present in the base layer's state
        # for parity, but — exactly as in the reference, which feeds
        # `self.embedding_params[0][None]*0` into the input layer
        # (`deq_layer.py:78`) — NOT active in the base forward path.
        # The Delta/Feedback/Q variants consume theirs.
        emb_shape = ((c.deq_iter, c.hdim) if c.layer_type == "mlp"
                     else (c.deq_iter, c.T - 1, c.hdim))
        return {"input": inj["params"], "cell": params_cell,
                "out": params_out, "iter_emb": jnp.zeros(emb_shape)}

    def _obs_dim(self):
        return self.cfg.nx

    def _obstacle_feats(self, x_knots: Array) -> Array:
        """Per-knot features of the n_sel nearest spheres: clipped
        center offsets (3k) + clearance dist-radius (k), (B, T-1, 4k).
        Same top-k selection the solver's constraint rows use
        (`AL_mpc_custom.py:100-135`), applied to the carried iterate."""
        c = self.cfg
        centers = jnp.asarray(c.obstacle_centers, x_knots.dtype)  # (N, 3)
        pos = x_knots[..., :3]                                    # (B,T-1,3)
        d2 = jnp.sum((pos[..., None, :] - centers) ** 2, axis=-1)
        _, idx = lax.top_k(-d2, c.obstacle_n_sel)
        sel = jnp.take(centers, idx, axis=0)                      # (B,T-1,k,3)
        off = sel - pos[..., None, :]
        clear = jnp.linalg.norm(off, axis=-1) - c.obstacle_radius
        off = jnp.clip(off, -c.obstacle_range, c.obstacle_range)
        clear = jnp.clip(clear, -c.obstacle_range, c.obstacle_range)
        b, h = pos.shape[0], pos.shape[1]
        return jnp.concatenate([off.reshape(b, h, -1), clear], axis=-1)

    def _mlp_flat_input(self, x_prev, extra=()):
        flat = x_prev.reshape(x_prev.shape[0], -1)
        if extra:
            flat = jnp.concatenate(
                [flat, *[e.reshape(e.shape[0], -1) for e in extra]], axis=-1)
        return flat

    def _init_input(self, rng, obs, x_prev):
        c = self.cfg
        extra = ()
        if c.obstacle_centers is not None:
            extra = (self._obstacle_feats(x_prev[:, 1:]),)
        if c.layer_type == "mlp":
            flat = self._mlp_flat_input(x_prev, extra)
            p = self.input_mod.init(rng, flat)
            inj = self.input_mod.apply(p, flat)
        else:
            p = self.input_mod.init(rng, x_prev[:, 1:], obs, extra)
            inj = self.input_mod.apply(p, x_prev[:, 1:], obs, extra)
        return {"params": p, "inj": inj}

    def init_z(self, bsz: int) -> Array:
        c = self.cfg
        if c.layer_type == "mlp":
            return jnp.zeros((bsz, c.hdim))
        return jnp.zeros((bsz, c.T - 1, c.hdim))

    # -- forward --------------------------------------------------------------
    def _input(self, params, obs, x_prev, extra=()):
        c = self.cfg
        if c.obstacle_centers is not None:
            extra = (*extra, self._obstacle_feats(x_prev[:, 1:]))
        if c.layer_type == "mlp":
            return self.input_mod.apply(
                params["input"], self._mlp_flat_input(x_prev, extra))
        return self.input_mod.apply(params["input"], x_prev[:, 1:], obs, extra)

    def _fixed_point(self, params, inj, z):
        """Run the fixed-point solve + gradient re-engagement. Returns
        (z_out, stats)."""
        c = self.cfg

        def f(zz):
            return self.cell_mod.apply(params["cell"], inj, zz)

        stats = {"fwd_err": None, "fwd_steps": None}
        if c.fp_type == "single":
            return f(z), stats
        if c.fp_type == "multi":
            for i in range(c.inner_deq_iters):
                if c.grad_type == "last_step_grad" and i < c.inner_deq_iters - 1:
                    z = lax.stop_gradient(f(z))
                else:
                    z = f(z)
            return z, stats
        solver = anderson if c.fp_type == "anderson" else broyden
        if c.grad_type == "implicit":
            kw = (dict(m=c.fp_m, max_steps=c.fp_max_steps, tol=c.fp_tol)
                  if c.fp_type == "anderson"
                  else dict(max_steps=c.fp_max_steps, tol=c.fp_tol))
            fp = make_implicit_fp(
                lambda p, i, zz: self.cell_mod.apply(p, i, zz), solver, **kw)
            z_star, best_err, best_step = fp(params["cell"], inj, z)
            stats = {
                "fwd_err": jnp.mean(best_err),
                "fwd_steps": jnp.mean(best_step.astype(jnp.float32)),
            }
            return z_star, stats
        if c.fp_type == "anderson":
            z_star, info = solver(
                lambda zz: lax.stop_gradient(f(zz)), lax.stop_gradient(z),
                m=c.fp_m, max_steps=c.fp_max_steps, tol=c.fp_tol,
            )
        else:
            z_star, info = solver(
                lambda zz: lax.stop_gradient(f(zz)), lax.stop_gradient(z),
                max_steps=c.fp_max_steps, tol=c.fp_tol,
            )
        stats = {
            "fwd_err": jnp.mean(info.best_err),
            "fwd_steps": jnp.mean(info.best_step.astype(jnp.float32)),
        }
        # phantom gradient: 3 re-engaged applications
        z = lax.stop_gradient(z_star)
        for _ in range(2):
            z = f(z)
        return f(z), stats

    def _decode(self, obs, x_prev, dx_ref):
        """(T-1) x nx deltas -> x_ref (bsz, T, nx) with obs prepended."""
        c = self.cfg
        bsz = obs.shape[0]
        dx_ref = dx_ref.reshape(bsz, c.T - 1, c.nx)
        vel_ref = dx_ref[..., c.nq :]
        dpos = dx_ref[..., : c.nq] * c.dt
        pos = dpos + x_prev[..., :1, : c.nq]
        x_tail = jnp.concatenate([pos, vel_ref], axis=-1)
        x_ref = jnp.concatenate([obs[:, None, :], x_tail], axis=-2)
        u_ref = jnp.zeros((bsz, c.T, c.nu), x_ref.dtype)
        return x_ref, u_ref

    def __call__(self, params, in_obs_dict: Dict[str, Array],
                 in_aux_dict: Dict[str, Array]) -> Tuple[Dict, Dict]:
        c = self.cfg
        obs = in_obs_dict["o"]
        x_prev, z = in_aux_dict["x"], in_aux_dict["z"]
        it = in_aux_dict.get("iter", 0)
        inj = self._input(params, obs, x_prev)
        z_out, stats = self._fixed_point(params, inj, z)
        dx_ref = self.out_mod.apply(params["out"], z_out)
        x_ref, u_ref = self._decode(obs, x_prev, dx_ref)
        out_mpc = {"x_t": obs, "x_ref": x_ref, "u_ref": u_ref}
        out_aux = {
            "x": x_ref, "u": u_ref, "z": z_out, "iter": it,
            "deq_fwd_err": stats["fwd_err"], "deq_fwd_steps": stats["fwd_steps"],
        }
        return out_mpc, out_aux


class FFDNetwork(DEQLayer):
    """Feed-forward (non-DEQ) proposal network, deq_type='nn'
    (`policies.py:923-1114`): same trunks, single un-accelerated cell
    application, no hidden-state recurrence."""

    def __init__(self, cfg: DEQLayerConfig):
        super().__init__(dataclasses.replace(cfg, fp_type="single"))
