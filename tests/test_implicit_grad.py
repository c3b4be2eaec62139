"""Implicit-VJP fixed-point gradients (`grad_type='implicit'`,
reference legacy `DEQPolicy.deq_fixed_point` `deq_layer.py:1334-1355`)
checked against the exact implicit-function-theorem gradient computed
with a direct linear solve of the transpose system."""
import jax
import jax.numpy as jnp
import numpy as np

from deqmpc_tpu.models.deq_layer import (DEQLayer, DEQLayerConfig,
                                         make_implicit_fp)
from deqmpc_tpu.solvers.fp import anderson


def _setup(hdim=8, bsz=3, seed=0):
    """Contractive synthetic cell f(z) = tanh(z W * 0.4 + inj) so the
    fixed point (and the transpose solve) converge tightly."""
    rng = jax.random.PRNGKey(seed)
    W = jax.random.normal(rng, (hdim, hdim)) / np.sqrt(hdim)
    params = {"W": W}

    def cell_apply(p, i, z):
        return jnp.tanh(0.4 * z @ p["W"] + i)

    inj = jax.random.normal(jax.random.PRNGKey(seed + 1), (bsz, hdim)) * 0.3
    z0 = jnp.zeros((bsz, hdim))
    return cell_apply, params, inj, z0


def test_implicit_fp_matches_direct_ift():
    cell_apply, params, inj, z0 = _setup()
    kw = dict(m=5, max_steps=60, tol=1e-12)
    fp = make_implicit_fp(cell_apply, anderson, **kw)

    g_out = jax.random.normal(jax.random.PRNGKey(9), z0.shape)

    def loss(p):
        z_star, _, _ = fp(p, inj, z0)
        return jnp.sum(z_star * g_out)

    grads = jax.grad(loss)(params)

    # exact IFT: w = (I - J_z')^{-1} g per sample, then one VJP to params
    z_star, _, _ = fp(params, inj, z0)
    # fixed point actually converged
    res = cell_apply(params, inj, z_star) - z_star
    assert float(jnp.max(jnp.abs(res))) < 1e-6

    def f_z(zz):
        return cell_apply(params, inj, zz)

    J = jax.jacrev(f_z)(z_star)  # (bsz, hdim, bsz, hdim)
    bsz, hdim = z_star.shape
    w = jnp.zeros_like(g_out)
    for b in range(bsz):
        Jb = J[b, :, b, :]
        wb = jnp.linalg.solve(jnp.eye(hdim) - Jb.T, g_out[b])
        w = w.at[b].set(wb)
    _, vjp_p = jax.vjp(lambda p: cell_apply(p, inj, z_star), params)
    exact = vjp_p(w)[0]

    flat_g = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(grads)])
    flat_e = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(exact)])
    err = float(jnp.linalg.norm(flat_g - flat_e) / (jnp.linalg.norm(flat_e) + 1e-12))
    assert err < 5e-3, err
    # no gradient to the initial z
    gz0 = jax.grad(lambda zz: jnp.sum(fp(params, inj, zz)[0] * g_out))(z0)
    assert float(jnp.max(jnp.abs(gz0))) == 0.0


def test_deq_layer_grad_type_implicit_runs():
    cfg = DEQLayerConfig(nx=2, nu=1, nq=1, T=5, dt=0.05, hdim=16,
                         layer_type="mlp", grad_type="implicit",
                         fp_max_steps=20, fp_tol=1e-6)
    layer = DEQLayer(cfg)
    params = layer.init(jax.random.PRNGKey(0), bsz=4)
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    x_prev = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 2))
    aux = {"x": x_prev, "z": 0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                                     layer.init_z(4).shape),
           "iter": 0}

    def loss(p):
        out_mpc, out_aux = layer(p, {"o": obs}, aux)
        return jnp.sum(out_mpc["x_ref"] ** 2) + jnp.sum(out_aux["z"] ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
