"""DEQ layer variants (reference `deqmpc/deq_layer.py:266-1287`).

- DEQLayerMem       (:266-418): memory stream in the input encoder +
  GatedResidual memory update (bypassed in the reference — parity kept).
- DEQLayerDelta     (:422-507): learned per-iteration output scales
  with straight-through multiply, per-iteration z embeddings, deltas
  relative to the previous *prediction*.
- DEQLayerHistoryState (:509-759): observation-history input, joint
  estimation/prediction two-branch cell (est over H knots feeding the
  pred branch), outputs current-state estimate + T-step prediction.
- DEQLayerHistoryStateEstPred (:761-1032): adds an explicit x_est
  stream and a separate estimation output head (pairs with the MHE
  solver variant).
- DEQLayerHistory   (:1034-1086): joint state+action output (mlp).
- DEQLayerFeedback  (:1088-1174): takes both optimizer- and
  network-trajectory feedback streams.
- DEQLayerQ         (:1176-1287): additionally emits per-knot-point
  Q-cost scalings (ReLU, knot 0 pinned to 1).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .blocks import ConvOutput, MLPInput, MLPOutput, get_act
from .deq_layer import DEQLayer, DEQLayerConfig

Array = jax.Array


# --------------------------------------------------------------------------
# straight-through scale multiply (`deq_layer_utils.py:35-53`):
# forward out = x*s; backward dx = g (identity!), ds = g*x.
# --------------------------------------------------------------------------
@jax.custom_vjp
def scale_multiply_st(x, s):
    return x * s


def _sm_fwd(x, s):
    return x * s, (x,)


def _sm_bwd(res, g):
    (x,) = res
    return g, g * x


scale_multiply_st.defvjp(_sm_fwd, _sm_bwd)


# --------------------------------------------------------------------------
# extra flax blocks used by the variants
# --------------------------------------------------------------------------
class StreamConvInput(nn.Module):
    """Generic gcn input encoder over `n_streams` feature streams of a
    length-`horizon` sequence: concat -> conv(width*h) -> act ->
    conv(h) -> GroupNorm. Covers the reference's per-variant
    input_encoder/obs_encoder variations."""

    hdim: int
    horizon: int
    n_streams: int
    mid_mult: int = 4
    kernel_width: int = 3
    num_groups: int = 4
    act: str = "relu"
    time_emb: bool = True

    @nn.compact
    def __call__(self, streams: Sequence[Array]) -> Array:
        act = get_act(self.act)
        parts = list(streams)
        if self.time_emb:
            t = self.param("time_emb", nn.initializers.normal(1.0),
                           (self.horizon, self.hdim))
            parts.append(jnp.broadcast_to(
                t[None], (parts[0].shape[0], self.horizon, self.hdim)))
        inp = jnp.concatenate(parts, axis=-1)
        inp = nn.Conv(self.hdim * self.mid_mult, (self.kernel_width,),
                      padding="SAME")(inp)
        inp = act(inp)
        inp = nn.Conv(self.hdim, (self.kernel_width,), padding="SAME")(inp)
        return nn.GroupNorm(num_groups=self.num_groups)(inp)


class NodeEncoder(nn.Module):
    hdim: int
    act: str = "relu"

    @nn.compact
    def __call__(self, x):
        return get_act(self.act)(nn.LayerNorm()(nn.Dense(self.hdim)(x)))


class EstPredCell(nn.Module):
    """Two-branch est/pred residual conv cell
    (`deq_layer.py:673-705`): the estimation branch runs over the H
    history knots; its final embedding is linearly mapped and injected
    into every knot of the prediction branch."""

    hdim: int
    expand: int = 4
    kernel_width: int = 3
    num_groups: int = 4
    act: str = "mish"

    @nn.compact
    def __call__(self, x_inj: Tuple[Array, Array], z: Tuple[Array, Array]):
        act = get_act(self.act)
        x_est, x_pred = x_inj
        z_est, z_pred = z
        gn = lambda: nn.GroupNorm(num_groups=self.num_groups)
        conv = lambda c: nn.Conv(c, (self.kernel_width,), padding="SAME")

        y = gn()(act(conv(self.hdim * self.expand)(z_est)))
        out_est = gn()(act(z_est + gn()(x_est + conv(self.hdim)(y))))
        z_est_out = nn.Dense(self.hdim)(out_est[:, -1])  # (B, h)
        z_est_out = z_est_out[:, None, :]

        y = gn()(act(conv(self.hdim * self.expand)(z_pred)))
        out_pred = gn()(act(z_pred + gn()(x_pred + z_est_out + conv(self.hdim)(y))))
        return out_est, out_pred


# --------------------------------------------------------------------------
# variants
# --------------------------------------------------------------------------
class DEQLayerMem(DEQLayer):
    """Adds a memory stream (GRU-style gated residual update)
    (`deq_layer.py:266-418`)."""

    def __init__(self, cfg: DEQLayerConfig, mem_bypass: bool = True):
        super().__init__(cfg)
        from .blocks import GatedResidual

        c = cfg
        if c.layer_type == "gcn":
            self.input_mod = StreamConvInput(
                hdim=c.hdim, horizon=c.T - 1, n_streams=4, mid_mult=4,
                kernel_width=c.kernel_width, num_groups=c.num_groups,
            )
        self.mem_mod1 = GatedResidual(dim=cfg.hdim, bypass=mem_bypass)
        self.mem_mod2 = GatedResidual(dim=cfg.hdim, bypass=mem_bypass)

    def init(self, rng, bsz: int = 2):
        c = self.cfg
        params = super().init(rng, bsz)
        if not self.mem_mod1.bypass:
            mem = self.init_mem(bsz)
            z = self.init_z(bsz)
            r1, r2 = jax.random.split(jax.random.fold_in(rng, 7))
            params["mem1"] = self.mem_mod1.init(r1, mem, z)
            params["mem2"] = self.mem_mod2.init(r2, mem, z)
        return params

    def init_mem(self, bsz: int):
        return self.init_z(bsz)

    def __call__(self, params, in_obs_dict, in_aux_dict, mem_update: bool = True):
        c = self.cfg
        obs = in_obs_dict["o"]
        x_prev, z = in_aux_dict["x"], in_aux_dict["z"]
        mem = in_aux_dict["mem"]
        old_mem = in_aux_dict.get("old_mem", mem)
        it = in_aux_dict.get("iter", 0)
        use_mem = mem if mem_update else old_mem
        # memory enters as an extra input stream (gcn only, as in the
        # reference `deq_layer.py:311-328`)
        inj = self._input(params, obs, x_prev,
                          extra=(use_mem,) if c.layer_type == "gcn" else ())
        z_out, stats = self._fixed_point(params, inj, z)
        dx_ref = self.out_mod.apply(params["out"], z_out)
        x_ref, u_ref = self._decode(obs, x_prev, dx_ref)
        if mem_update:
            new_old_mem = mem
            if self.mem_mod1.bypass:
                new_mem = z_out  # reference GatedResidual returns z
            else:
                m = self.mem_mod1.apply(params["mem1"], mem, z_out)
                new_mem = self.mem_mod2.apply(params["mem2"], m, z_out)
        else:
            new_old_mem = old_mem
            new_mem = mem
        out_mpc = {"x_t": obs, "x_ref": x_ref, "u_ref": u_ref}
        out_aux = {"x": x_ref, "u": u_ref, "z": z_out, "iter": it,
                   "mem": new_mem, "old_mem": new_old_mem,
                   "deq_fwd_err": stats["fwd_err"],
                   "deq_fwd_steps": stats["fwd_steps"]}
        return out_mpc, out_aux

    def _init_input(self, rng, obs, x_prev):
        c = self.cfg
        if c.layer_type == "mlp":
            return super()._init_input(rng, obs, x_prev)
        mem = self.init_mem(obs.shape[0])
        # gcn: input encoder over [node, x0, mem] + time emb
        self.input_mod = StreamConvInput(
            hdim=c.hdim, horizon=c.T - 1, n_streams=4, mid_mult=4,
            kernel_width=c.kernel_width, num_groups=c.num_groups,
        )
        node = NodeEncoder(c.hdim)
        x0e = NodeEncoder(c.hdim)
        rs = jax.random.split(rng, 3)
        p_node = node.init(rs[0], x_prev[:, 1:])
        p_x0 = x0e.init(rs[1], obs)
        ne = node.apply(p_node, x_prev[:, 1:])
        x0 = jnp.broadcast_to(x0e.apply(p_x0, obs)[:, None],
                              (obs.shape[0], c.T - 1, c.hdim))
        p_enc = self.input_mod.init(rs[2], [ne, x0, mem])
        inj = self.input_mod.apply(p_enc, [ne, x0, mem])
        return {"params": {"node": p_node, "x0": p_x0, "enc": p_enc}, "inj": inj}

    def _gcn_input(self, params, obs, x_prev, extra):
        c = self.cfg
        ne = NodeEncoder(c.hdim).apply(params["input"]["node"], x_prev[:, 1:])
        x0 = jnp.broadcast_to(
            NodeEncoder(c.hdim).apply(params["input"]["x0"], obs)[:, None],
            (obs.shape[0], c.T - 1, c.hdim))
        return self.input_mod.apply(params["input"]["enc"], [ne, x0, *extra])

    def _input(self, params, obs, x_prev, extra=()):
        if self.cfg.layer_type == "mlp":
            return self.input_mod.apply(
                params["input"], x_prev.reshape(x_prev.shape[0], -1))
        return self._gcn_input(params, obs, x_prev, extra)


class DEQLayerDelta(DEQLayer):
    """Learned per-iteration output scales + iteration embeddings;
    deltas relative to the previous prediction (`deq_layer.py:422-507`).
    mlp trunk only (matching the reference's implemented path)."""

    def __init__(self, cfg: DEQLayerConfig):
        cfg = dataclasses.replace(cfg, layer_type="mlp", fp_type="single")
        super().__init__(cfg)

    def init(self, rng, bsz: int = 2):
        c = self.cfg
        params = super().init(rng, bsz)
        params["scales"] = jnp.ones((c.deq_iter, c.T - 1, c.nx))
        params["iter_emb"] = jnp.zeros((c.deq_iter, c.hdim))
        return params

    def __call__(self, params, in_obs_dict, in_aux_dict):
        c = self.cfg
        obs = in_obs_dict["o"]
        x_prev, z = in_aux_dict["x"], in_aux_dict["z"]
        it = jnp.minimum(jnp.asarray(in_aux_dict.get("iter", 0), jnp.int32),
                         c.deq_iter - 1)
        inj = self._input(params, obs, x_prev)
        z_out, stats = self._fixed_point(
            params, inj, z + params["iter_emb"][it][None]
        )
        out = self.out_mod.apply(params["out"], z_out)
        bsz = obs.shape[0]
        scale = params["scales"][it]  # (T-1, nx)
        scale = scale.at[:, : c.nq].divide(c.dt)
        out = scale_multiply_st(out, jnp.broadcast_to(
            scale.reshape(-1)[None], out.shape))
        dx_ref = out.reshape(bsz, c.T - 1, c.nx)
        vel_ref = dx_ref[..., c.nq:] + x_prev[:, 1:, c.nq:]
        pos = dx_ref[..., : c.nq] * c.dt + x_prev[:, 1:, : c.nq]
        x_tail = jnp.concatenate([pos, vel_ref], axis=-1)
        x_ref = jnp.concatenate([obs[:, None, :], x_tail], axis=-2)
        u_ref = jnp.zeros((bsz, c.T, c.nu), x_ref.dtype)
        out_mpc = {"x_t": obs, "x_ref": x_ref, "u_ref": u_ref,
                   "s": jnp.mean(jnp.abs(scale))}
        out_aux = {"x": x_ref, "u": u_ref, "z": z_out, "iter": it,
                   "deq_fwd_err": stats["fwd_err"],
                   "deq_fwd_steps": stats["fwd_steps"]}
        return out_mpc, out_aux


class DEQLayerHistoryState(DEQLayer):
    """Observation-history input, est/pred two-branch gcn cell
    (`deq_layer.py:509-759`). z is a (z_est (B,H,h), z_pred (B,T,h))
    tuple; output decodes the full T-step prediction with knot-wise
    deltas; x_t is the *estimated* current state x_ref[:, 0]."""

    def __init__(self, cfg: DEQLayerConfig, H: int):
        self.H = H
        c = dataclasses.replace(cfg, layer_type="gcn")
        # bypass base module construction: custom modules below
        self.cfg = c
        self.obs_enc = StreamConvInput(
            hdim=c.hdim, horizon=H, n_streams=2, mid_mult=2,
            kernel_width=c.kernel_width, num_groups=c.num_groups, act="mish")
        self.pred_enc = StreamConvInput(
            hdim=c.hdim, horizon=c.T, n_streams=3, mid_mult=3,
            kernel_width=c.kernel_width, num_groups=c.num_groups, act="mish",
            time_emb=True)
        self.node = NodeEncoder(c.hdim, act="mish")
        self.cell_mod = EstPredCell(
            hdim=c.hdim, expand=c.deq_expand, kernel_width=c.kernel_width,
            num_groups=c.num_groups)
        self.out_mod = ConvOutput(out_dim=c.nx, hdim=c.hdim,
                                  kernel_width=c.kernel_width,
                                  num_groups=c.num_groups)

    def init_z(self, bsz: int):
        c = self.cfg
        return (jnp.zeros((bsz, self.H, c.hdim)), jnp.zeros((bsz, c.T, c.hdim)))

    def init(self, rng, bsz: int = 2):
        c = self.cfg
        rs = jax.random.split(rng, 5)
        obs = jnp.zeros((bsz, self.H, c.nx))
        x_prev = jnp.zeros((bsz, c.T, c.nx))
        p_node = self.node.init(rs[0], obs)
        obs_emb = self.node.apply(p_node, obs)
        p_obs = self.obs_enc.init(rs[1], [obs_emb])
        obs_inp = self.obs_enc.apply(p_obs, [obs_emb])
        x_emb = self.node.apply(p_node, x_prev)
        x0 = jnp.broadcast_to(obs_inp[:, -1:], (bsz, c.T, c.hdim))
        p_pred = self.pred_enc.init(rs[2], [x_emb, x0])
        inj = (obs_inp, self.pred_enc.apply(p_pred, [x_emb, x0]))
        z = self.init_z(bsz)
        p_cell = self.cell_mod.init(rs[3], inj, z)
        z_out = self.cell_mod.apply(p_cell, inj, z)
        p_out = self.out_mod.init(rs[4], z_out[1])
        return {"node": p_node, "obs_enc": p_obs, "pred_enc": p_pred,
                "cell": p_cell, "out": p_out}

    def _encode(self, params, obs_hist, x_prev):
        c = self.cfg
        bsz = obs_hist.shape[0]
        obs_hist = obs_hist.reshape(bsz, self.H, c.nx)
        obs_emb = self.node.apply(params["node"], obs_hist)
        obs_inp = self.obs_enc.apply(params["obs_enc"], [obs_emb])
        x_emb = self.node.apply(params["node"], x_prev)
        x0 = jnp.broadcast_to(obs_inp[:, -1:], (bsz, c.T, c.hdim))
        pred_inp = self.pred_enc.apply(params["pred_enc"], [x_emb, x0])
        return obs_inp, pred_inp

    def _fp_tuple(self, params, inj, z):
        c = self.cfg

        def f(zz):
            return self.cell_mod.apply(params["cell"], inj, zz)

        if c.fp_type in ("single", "multi"):
            n = 1 if c.fp_type == "single" else c.inner_deq_iters
            for _ in range(n):
                z = f(z)
            return z, {"fwd_err": None, "fwd_steps": None}
        # flatten the tuple state for the accelerated solvers
        from ..solvers.fp import anderson

        shapes = (z[0].shape, z[1].shape)
        n0 = 1
        for d in shapes[0][1:]:
            n0 *= int(d)

        def f_flat(zf):
            za = zf[:, :n0].reshape(shapes[0])
            zb = zf[:, n0:].reshape(shapes[1])
            oa, ob = f((za, zb))
            return jnp.concatenate(
                [oa.reshape(oa.shape[0], -1), ob.reshape(ob.shape[0], -1)], axis=1)

        zf0 = jnp.concatenate(
            [z[0].reshape(z[0].shape[0], -1), z[1].reshape(z[1].shape[0], -1)],
            axis=1)
        z_star, info = anderson(
            lambda zz: lax.stop_gradient(f_flat(zz)), lax.stop_gradient(zf0),
            m=c.fp_m, max_steps=c.fp_max_steps, tol=c.fp_tol)
        z_star = lax.stop_gradient(z_star)
        zt = (z_star[:, :n0].reshape(shapes[0]), z_star[:, n0:].reshape(shapes[1]))
        for _ in range(2):
            zt = f(zt)
        zt = f(zt)
        return zt, {"fwd_err": jnp.mean(info.best_err),
                    "fwd_steps": jnp.mean(info.best_step.astype(jnp.float32))}

    def __call__(self, params, in_obs_dict, in_aux_dict):
        c = self.cfg
        obs_hist = in_obs_dict["o"]  # (B, H, nx) or (B, H*nx)
        x_prev, z = in_aux_dict["x"], in_aux_dict["z"]
        it = in_aux_dict.get("iter", 0)
        inj = self._encode(params, obs_hist, x_prev)
        z_out, stats = self._fp_tuple(params, inj, z)
        dx_ref = self.out_mod.apply(params["out"], z_out[1])  # (B, T, nx)
        vel_ref = dx_ref[..., c.nq:]
        pos = dx_ref[..., : c.nq] * c.dt + x_prev[..., : c.nq]
        x_ref = jnp.concatenate([pos, vel_ref], axis=-1)
        u_ref = jnp.zeros((x_ref.shape[0], c.T, c.nu), x_ref.dtype)
        out_mpc = {"x_t": x_ref[:, 0], "x_ref": x_ref, "u_ref": u_ref}
        out_aux = {"x": x_ref, "u": u_ref, "z": z_out, "iter": it,
                   "deq_fwd_err": stats["fwd_err"],
                   "deq_fwd_steps": stats["fwd_steps"]}
        return out_mpc, out_aux


class DEQLayerHistoryStateEstPred(DEQLayerHistoryState):
    """Adds an explicit x_est input stream and a separate estimation
    output head (`deq_layer.py:761-1032`)."""

    def __init__(self, cfg: DEQLayerConfig, H: int):
        super().__init__(cfg, H)
        c = self.cfg
        self.obs_enc = StreamConvInput(
            hdim=c.hdim, horizon=H, n_streams=3, mid_mult=3,
            kernel_width=c.kernel_width, num_groups=c.num_groups, act="mish")
        self.z0_enc = NodeEncoder(c.hdim, act="mish")
        self.out_est = ConvOutput(out_dim=c.nx, hdim=c.hdim,
                                  kernel_width=c.kernel_width,
                                  num_groups=c.num_groups)

    def init(self, rng, bsz: int = 2):
        c = self.cfg
        rs = jax.random.split(rng, 7)
        obs = jnp.zeros((bsz, self.H, c.nx))
        x_prev = jnp.zeros((bsz, c.T, c.nx))
        x_est = jnp.zeros((bsz, self.H, c.nx))
        z = self.init_z(bsz)
        p_node = self.node.init(rs[0], obs)
        obs_emb = self.node.apply(p_node, obs)
        est_emb = self.node.apply(p_node, x_est)
        p_obs = self.obs_enc.init(rs[1], [obs_emb, est_emb])
        obs_inp = self.obs_enc.apply(p_obs, [obs_emb, est_emb])
        p_z0 = self.z0_enc.init(rs[2], z[0][:, -1])
        x0 = jnp.broadcast_to(
            self.z0_enc.apply(p_z0, z[0][:, -1])[:, None], (bsz, c.T, c.hdim))
        x_emb = self.node.apply(p_node, x_prev)
        p_pred = self.pred_enc.init(rs[3], [x_emb, x0])
        inj = (obs_inp, self.pred_enc.apply(p_pred, [x_emb, x0]))
        p_cell = self.cell_mod.init(rs[4], inj, z)
        z_out = self.cell_mod.apply(p_cell, inj, z)
        p_out = self.out_mod.init(rs[5], z_out[1])
        p_out_est = self.out_est.init(rs[6], z_out[0])
        return {"node": p_node, "obs_enc": p_obs, "z0_enc": p_z0,
                "pred_enc": p_pred, "cell": p_cell, "out": p_out,
                "out_est": p_out_est}

    def _encode(self, params, obs_hist, x_prev, x_est, z):
        c = self.cfg
        bsz = obs_hist.shape[0]
        obs_hist = obs_hist.reshape(bsz, self.H, c.nx)
        x_est = x_est.reshape(bsz, self.H, c.nx)
        obs_emb = self.node.apply(params["node"], obs_hist)
        est_emb = self.node.apply(params["node"], x_est)
        obs_inp = self.obs_enc.apply(params["obs_enc"], [obs_emb, est_emb])
        x0 = jnp.broadcast_to(
            self.z0_enc.apply(params["z0_enc"], z[0][:, -1])[:, None],
            (bsz, c.T, c.hdim))
        x_emb = self.node.apply(params["node"], x_prev)
        pred_inp = self.pred_enc.apply(params["pred_enc"], [x_emb, x0])
        return obs_inp, pred_inp

    def __call__(self, params, in_obs_dict, in_aux_dict):
        c = self.cfg
        obs_hist = in_obs_dict["o"]
        x_prev, z = in_aux_dict["x"], in_aux_dict["z"]
        x_est = in_aux_dict["x_est"]
        it = in_aux_dict.get("iter", 0)
        bsz = obs_hist.shape[0]
        obs_r = obs_hist.reshape(bsz, self.H, c.nx)
        inj = self._encode(params, obs_hist, x_prev, x_est, z)
        z_out, stats = self._fp_tuple(params, inj, z)
        d_est = self.out_est.apply(params["out_est"], z_out[0])  # (B,H,nx)
        x_est_new = jnp.concatenate(
            [d_est[..., : c.nq] * c.dt + obs_r[..., : c.nq],
             d_est[..., c.nq:] + obs_r[..., c.nq:]], axis=-1)
        d_pred = self.out_mod.apply(params["out"], z_out[1])  # (B,T,nx)
        x_ref = jnp.concatenate(
            [d_pred[..., : c.nq] * c.dt + x_prev[..., : c.nq],
             d_pred[..., c.nq:]], axis=-1)
        u_ref = jnp.zeros((bsz, c.T, c.nu), x_ref.dtype)
        out_mpc = {"x_t": x_ref[:, 0], "x_ref": x_ref, "u_ref": u_ref,
                   "x_est": x_est_new}
        out_aux = {"x": x_ref, "u": u_ref, "z": z_out, "x_est": x_est_new,
                   "iter": it, "deq_fwd_err": stats["fwd_err"],
                   "deq_fwd_steps": stats["fwd_steps"]}
        return out_mpc, out_aux


class DEQLayerHistory(DEQLayer):
    """Joint state+action output with history input, mlp trunk
    (`deq_layer.py:1034-1086`)."""

    def __init__(self, cfg: DEQLayerConfig, H: int):
        self.H = H
        c = dataclasses.replace(cfg, layer_type="mlp")
        super().__init__(c)
        self.in_dim = c.nx * H + c.nx * c.T + c.nu * (c.T - 1)
        self.out_dim = c.nx * c.T + c.nu * (c.T - 1)
        self.input_mod = MLPInput(hdim=c.hdim)
        self.out_mod = MLPOutput(out_dim=self.out_dim)

    def init_z(self, bsz):
        return jnp.zeros((bsz, self.cfg.hdim))

    def init(self, rng, bsz: int = 2):
        c = self.cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        flat = jnp.zeros((bsz, self.in_dim))
        p_in = self.input_mod.init(r1, flat)
        inj = self.input_mod.apply(p_in, flat)
        z = self.init_z(bsz)
        p_cell = self.cell_mod.init(r2, inj, z)
        z_out = self.cell_mod.apply(p_cell, inj, z)
        p_out = self.out_mod.init(r3, z_out)
        return {"input": p_in, "cell": p_cell, "out": p_out}

    def __call__(self, params, in_obs_dict, in_aux_dict):
        c = self.cfg
        obs_hist = in_obs_dict["o"]
        x_prev, u_prev, z = in_aux_dict["x"], in_aux_dict["u"], in_aux_dict["z"]
        it = in_aux_dict.get("iter", 0)
        bsz = obs_hist.shape[0]
        flat = jnp.concatenate(
            [obs_hist.reshape(bsz, -1), x_prev.reshape(bsz, -1),
             u_prev[:, : c.T - 1].reshape(bsz, -1)], axis=-1)
        inj = self.input_mod.apply(params["input"], flat)
        z_out, stats = self._fixed_point(params, inj, z)
        out = self.out_mod.apply(params["out"], z_out)
        d_x = out[..., : c.nx * c.T].reshape(bsz, c.T, c.nx)
        u_ref = out[..., c.nx * c.T:].reshape(bsz, c.T - 1, c.nu)
        u_ref = jnp.concatenate([u_ref, jnp.zeros_like(u_ref[:, -1:])], axis=1)
        x_ref = jnp.concatenate(
            [d_x[..., : c.nq] * c.dt + x_prev[..., : c.nq], d_x[..., c.nq:]],
            axis=-1)
        out_mpc = {"x_t": x_ref[:, 0], "x_ref": x_ref, "u_ref": u_ref}
        out_aux = {"x": x_ref, "u": u_ref, "z": z_out, "iter": it,
                   "deq_fwd_err": stats["fwd_err"],
                   "deq_fwd_steps": stats["fwd_steps"]}
        return out_mpc, out_aux


class DEQLayerFeedback(DEQLayer):
    """Takes optimizer-trajectory AND network-trajectory feedback
    (`deq_layer.py:1088-1174`)."""

    def __init__(self, cfg: DEQLayerConfig):
        super().__init__(cfg)
        c = cfg
        if c.layer_type == "gcn":
            self.input_mod = StreamConvInput(
                hdim=c.hdim, horizon=c.T - 1, n_streams=4, mid_mult=4,
                kernel_width=c.kernel_width, num_groups=c.num_groups,
                act="mish")
            self.node = NodeEncoder(c.hdim, act="mish")
            self.x0e = NodeEncoder(c.hdim, act="mish")

    def init(self, rng, bsz: int = 2):
        c = self.cfg
        if c.layer_type == "mlp":
            # mlp input sees [xn, x] (2*T*nx wide, `deq_layer.py:1124`)
            rs = jax.random.split(rng, 3)
            flat = jnp.zeros((bsz, 2 * c.T * c.nx))
            p_in = self.input_mod.init(rs[0], flat)
            inj = self.input_mod.apply(p_in, flat)
            z = self.init_z(bsz)
            p_cell = self.cell_mod.init(rs[1], inj, z)
            z_out = self.cell_mod.apply(p_cell, inj, z)
            p_out = self.out_mod.init(rs[2], z_out)
            return {"input": p_in, "cell": p_cell, "out": p_out,
                    "iter_emb": jnp.zeros((c.deq_iter, c.hdim))}
        rs = jax.random.split(rng, 5)
        obs = jnp.zeros((bsz, c.nx))
        x_prev = jnp.zeros((bsz, c.T, c.nx))
        p_node = self.node.init(rs[0], x_prev[:, 1:])
        p_x0 = self.x0e.init(rs[1], obs)
        ne = self.node.apply(p_node, x_prev[:, 1:])
        x0 = jnp.broadcast_to(self.x0e.apply(p_x0, obs)[:, None],
                              (bsz, c.T - 1, c.hdim))
        p_enc = self.input_mod.init(rs[2], [ne, ne, x0])
        inj = self.input_mod.apply(p_enc, [ne, ne, x0])
        z = self.init_z(bsz)
        p_cell = self.cell_mod.init(rs[3], inj, z)
        z_out = self.cell_mod.apply(p_cell, inj, z)
        p_out = self.out_mod.init(rs[4], z_out)
        return {"node": p_node, "x0": p_x0, "enc": p_enc, "cell": p_cell,
                "out": p_out,
                "iter_emb": jnp.zeros((c.deq_iter, c.T - 1, c.hdim))}

    def __call__(self, params, in_obs_dict, in_aux_dict):
        c = self.cfg
        obs = in_obs_dict["o"]
        x = in_aux_dict["x"]
        xn = in_aux_dict.get("xn", x)
        z = in_aux_dict["z"]
        it = jnp.minimum(jnp.asarray(in_aux_dict.get("iter", 0), jnp.int32),
                         c.deq_iter - 1)
        bsz = obs.shape[0]
        if c.layer_type == "mlp":
            flat = jnp.concatenate(
                [xn.reshape(bsz, -1), x.reshape(bsz, -1)], axis=-1)
            inj = self.input_mod.apply(params["input"], flat)
        else:
            ne_x = self.node.apply(params["node"], x[:, 1:])
            ne_xn = self.node.apply(params["node"], xn[:, 1:])
            x0 = jnp.broadcast_to(
                self.x0e.apply(params["x0"], obs)[:, None],
                (bsz, c.T - 1, c.hdim))
            inj = self.input_mod.apply(params["enc"], [ne_x, ne_xn, x0])
        z_out, stats = self._fixed_point(
            params, inj, z + params["iter_emb"][it][None])
        dx_ref = self.out_mod.apply(params["out"], z_out)
        x_ref, u_ref = self._decode(obs, x, dx_ref)
        out_mpc = {"x_t": obs, "x_ref": x_ref, "u_ref": u_ref}
        out_aux = {"xn": x_ref, "x": x_ref, "u": u_ref, "z": z_out,
                   "iter": it, "deq_fwd_err": stats["fwd_err"],
                   "deq_fwd_steps": stats["fwd_steps"]}
        return out_mpc, out_aux


class DEQLayerQ(DEQLayer):
    """Emits per-knot-point Q scalings alongside the state prediction
    (`deq_layer.py:1176-1287`)."""

    def __init__(self, cfg: DEQLayerConfig):
        super().__init__(cfg)
        c = cfg
        if c.layer_type == "gcn":
            self.node = NodeEncoder(c.hdim, act="mish")
            self.x0e = NodeEncoder(c.hdim, act="mish")
            self.input_mod = StreamConvInput(
                hdim=c.hdim, horizon=c.T - 1, n_streams=3, mid_mult=4,
                kernel_width=c.kernel_width, num_groups=c.num_groups,
                act="mish")
            self.out_mod = ConvOutput(out_dim=c.nx + 1, hdim=c.hdim,
                                      kernel_width=c.kernel_width,
                                      num_groups=c.num_groups)
        else:
            self.input_mod = MLPInput(hdim=c.hdim)
            self.out_mod = MLPOutput(out_dim=c.nx * (c.T - 1) + c.T)

    def init(self, rng, bsz: int = 2):
        c = self.cfg
        rs = jax.random.split(rng, 5)
        obs = jnp.zeros((bsz, c.nx))
        x_prev = jnp.zeros((bsz, c.T, c.nx))
        q = jnp.ones((bsz, c.T, 1))
        z = self.init_z(bsz)
        if c.layer_type == "mlp":
            flat = jnp.concatenate(
                [x_prev.reshape(bsz, -1), q.reshape(bsz, -1)], axis=-1)
            p_in = self.input_mod.init(rs[0], flat)
            inj = self.input_mod.apply(p_in, flat)
            p_cell = self.cell_mod.init(rs[1], inj, z)
            z_out = self.cell_mod.apply(p_cell, inj, z)
            p_out = self.out_mod.init(rs[2], z_out)
            return {"input": p_in, "cell": p_cell, "out": p_out,
                    "iter_emb": jnp.zeros((c.deq_iter, c.hdim))}
        xq = jnp.concatenate([x_prev, jnp.broadcast_to(q, (bsz, c.T, 1))], -1)
        p_node = self.node.init(rs[0], xq[:, 1:])
        p_x0 = self.x0e.init(rs[1], obs)
        ne = self.node.apply(p_node, xq[:, 1:])
        x0 = jnp.broadcast_to(self.x0e.apply(p_x0, obs)[:, None],
                              (bsz, c.T - 1, c.hdim))
        p_enc = self.input_mod.init(rs[2], [ne, x0])
        inj = self.input_mod.apply(p_enc, [ne, x0])
        p_cell = self.cell_mod.init(rs[3], inj, z)
        z_out = self.cell_mod.apply(p_cell, inj, z)
        p_out = self.out_mod.init(rs[4], z_out)
        return {"node": p_node, "x0": p_x0, "enc": p_enc, "cell": p_cell,
                "out": p_out,
                "iter_emb": jnp.zeros((c.deq_iter, c.T - 1, c.hdim))}

    def __call__(self, params, in_obs_dict, in_aux_dict):
        c = self.cfg
        obs = in_obs_dict["o"]
        x_prev, z, q = in_aux_dict["x"], in_aux_dict["z"], in_aux_dict["q"]
        it = jnp.minimum(jnp.asarray(in_aux_dict.get("iter", 0), jnp.int32),
                         c.deq_iter - 1)
        bsz = obs.shape[0]
        q3 = q.reshape(bsz, c.T, 1)
        if c.layer_type == "mlp":
            flat = jnp.concatenate(
                [x_prev.reshape(bsz, -1), q3.reshape(bsz, -1)], axis=-1)
            inj = self.input_mod.apply(params["input"], flat)
        else:
            xq = jnp.concatenate([x_prev, q3], axis=-1)
            ne = self.node.apply(params["node"], xq[:, 1:])
            x0 = jnp.broadcast_to(
                self.x0e.apply(params["x0"], obs)[:, None],
                (bsz, c.T - 1, c.hdim))
            inj = self.input_mod.apply(params["enc"], [ne, x0])
        z_out, stats = self._fixed_point(
            params, inj, z + params["iter_emb"][it][None])
        out = self.out_mod.apply(params["out"], z_out)
        if c.layer_type == "mlp":
            dx_ref = out[..., : c.nx * (c.T - 1)].reshape(bsz, c.T - 1, c.nx)
            q_out = jax.nn.relu(out[..., c.nx * (c.T - 1):])[:, : c.T - 1]
        else:
            dx_ref = out[..., : c.nx]
            q_out = jax.nn.relu(out[..., c.nx]).reshape(bsz, c.T - 1)
        q_out = jnp.concatenate([jnp.ones((bsz, 1), q_out.dtype), q_out], axis=1)
        x_ref, u_ref = self._decode(obs, x_prev, dx_ref)
        out_mpc = {"x_t": obs, "x_ref": x_ref, "u_ref": u_ref, "q": q_out}
        out_aux = {"x": x_ref, "u": u_ref, "z": z_out, "q": q_out, "iter": it,
                   "deq_fwd_err": stats["fwd_err"],
                   "deq_fwd_steps": stats["fwd_steps"]}
        return out_mpc, out_aux
