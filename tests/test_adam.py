"""Masked/per-voxel Adam vs a serial golden of the CUDA update
(`model/cuda/adam_upd_kernel.cu:8-132`)."""
import numpy as np
import jax.numpy as jnp

from fgs_nerf_tpu.optim.masked_adam import (
    AdamState, ParamOpts, adam_update, init_state,
)

B1, B2, EPS = 0.9, 0.99, 1e-8


def golden_adam(p, g, m, v, step, lr, skip_zero=False, perlr=None):
    step_size = lr * np.sqrt(1 - B2**step) / (1 - B1**step)
    p, g, m, v = [x.copy() for x in (p, g, m, v)]
    upd = np.ones_like(p, bool) if not skip_zero else (g != 0)
    m[upd] = B1 * m[upd] + (1 - B1) * g[upd]
    v[upd] = B2 * v[upd] + (1 - B2) * g[upd] ** 2
    scale = step_size if perlr is None else step_size * perlr[upd]
    p[upd] = p[upd] - scale * m[upd] / (np.sqrt(v[upd]) + EPS)
    return p, m, v


def test_plain_adam_matches(rng):
    p = {"w": rng.normal(size=(8, 4)).astype(np.float32)}
    g = {"w": rng.normal(size=(8, 4)).astype(np.float32)}
    st = init_state({"w": jnp.asarray(p["w"])})
    lrs = {"w": jnp.asarray(0.01, jnp.float32)}
    newp, newst = adam_update(
        {"w": jnp.asarray(p["w"])}, {"w": jnp.asarray(g["w"])}, st, lrs,
        {"w": ParamOpts()},
    )
    gp, gm, gv = golden_adam(p["w"], g["w"], np.zeros_like(p["w"]),
                             np.zeros_like(p["w"]), 1, 0.01)
    np.testing.assert_allclose(np.asarray(newp["w"]), gp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(newst.exp_avg["w"]), gm, atol=1e-7)
    # second step with different lr
    g2 = rng.normal(size=(8, 4)).astype(np.float32)
    newp2, newst2 = adam_update(
        newp, {"w": jnp.asarray(g2)}, newst, {"w": jnp.asarray(0.005, jnp.float32)},
        {"w": ParamOpts()},
    )
    gp2, gm2, gv2 = golden_adam(gp, g2, gm, gv, 2, 0.005)
    np.testing.assert_allclose(np.asarray(newp2["w"]), gp2, atol=1e-6)


def test_skip_zero_grad(rng):
    p = rng.normal(size=(16,)).astype(np.float32)
    g = rng.normal(size=(16,)).astype(np.float32)
    g[::2] = 0.0
    st = init_state({"sdf": jnp.asarray(p)})
    newp, newst = adam_update(
        {"sdf": jnp.asarray(p)}, {"sdf": jnp.asarray(g)}, st,
        {"sdf": jnp.asarray(0.1, jnp.float32)},
        {"sdf": ParamOpts(skip_zero_grad=True)},
    )
    gp, gm, gv = golden_adam(p, g, np.zeros_like(p), np.zeros_like(p), 1, 0.1,
                             skip_zero=True)
    np.testing.assert_allclose(np.asarray(newp["sdf"]), gp, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(newp["sdf"])[::2], p[::2])
    np.testing.assert_array_equal(np.asarray(newst.exp_avg["sdf"])[::2], 0.0)


def test_per_voxel_lr(rng):
    p = rng.normal(size=(10,)).astype(np.float32)
    g = rng.normal(size=(10,)).astype(np.float32)
    perlr = rng.uniform(0.1, 1.0, size=(10,)).astype(np.float32)
    st = init_state({"sdf": jnp.asarray(p)})
    newp, _ = adam_update(
        {"sdf": jnp.asarray(p)}, {"sdf": jnp.asarray(g)}, st,
        {"sdf": jnp.asarray(0.1, jnp.float32)},
        {"sdf": ParamOpts(has_per_lr=True)},
        per_lr={"sdf": jnp.asarray(perlr)},
    )
    gp, _, _ = golden_adam(p, g, np.zeros_like(p), np.zeros_like(p), 1, 0.1,
                           perlr=perlr)
    np.testing.assert_allclose(np.asarray(newp["sdf"]), gp, atol=1e-6)


def test_nested_module_tree(rng):
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    params = {"refnet": {"w0": jnp.asarray(w0), "b0": jnp.asarray(b0)}}
    grads = {"refnet": {"w0": jnp.ones((4, 3), jnp.float32),
                        "b0": jnp.ones((3,), jnp.float32)}}
    st = init_state(params)
    newp, _ = adam_update(params, grads, st,
                          {"refnet": jnp.asarray(0.001, jnp.float32)},
                          {"refnet": ParamOpts()})
    gp, _, _ = golden_adam(w0, np.ones_like(w0), np.zeros_like(w0),
                           np.zeros_like(w0), 1, 0.001)
    np.testing.assert_allclose(np.asarray(newp["refnet"]["w0"]), gp, atol=1e-6)
