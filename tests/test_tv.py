"""TV loss and TV gradient-injection vs goldens
(`model/nerf.py:1212-1221`, `model/cuda/total_variation_kernel.cu`)."""
import numpy as np
import jax.numpy as jnp
import torch

from fgs_nerf_tpu.ops.tv import total_variation_loss, tv_grad


def torch_total_variation(v_xyzc, mask_xyz1=None):
    """Golden of python ``total_variation`` (`model/nerf.py:1212-1221`)
    on the reference's [1, C, X, Y, Z] layout."""
    v = torch.from_numpy(np.moveaxis(v_xyzc, -1, 0)[None])
    tv2 = v.diff(dim=2).abs()
    tv3 = v.diff(dim=3).abs()
    tv4 = v.diff(dim=4).abs()
    if mask_xyz1 is not None:
        m = torch.from_numpy(mask_xyz1[None, :, :, :, 0][None])
        m = m.repeat(1, v.shape[1], 1, 1, 1)
        tv2 = tv2[m[:, :, :-1] & m[:, :, 1:]]
        tv3 = tv3[m[:, :, :, :-1] & m[:, :, :, 1:]]
        tv4 = tv4[m[:, :, :, :, :-1] & m[:, :, :, :, 1:]]
        return float((tv2.sum() + tv3.sum() + tv4.sum()) / 3 / m.sum())
    return float((tv2.sum() + tv3.sum() + tv4.sum()) / 3 / v.sum())


def test_tv_loss_unmasked(rng):
    v = rng.uniform(0.1, 1.0, size=(6, 7, 5, 3)).astype(np.float32)
    ours = float(total_variation_loss(jnp.asarray(v)))
    assert abs(ours - torch_total_variation(v)) < 1e-6


def test_tv_loss_masked(rng):
    v = rng.normal(size=(6, 6, 6, 2)).astype(np.float32)
    mask = (rng.uniform(size=(6, 6, 6, 1)) > 0.3)
    ours = float(total_variation_loss(jnp.asarray(v), jnp.asarray(mask)))
    gold = torch_total_variation(v, mask)
    assert abs(ours - gold) < 1e-6


def golden_tv_add_grad(param, grad, w, dense_mode, mask=None):
    """Numpy serial golden of the CUDA kernel semantics
    (`total_variation_kernel.cu:13-66`), per channel, w/6 per term."""
    out = grad.copy()
    X, Y, Z, C = param.shape
    wd = w / 6.0
    for c in range(C):
        for i in range(X):
            for j in range(Y):
                for k in range(Z):
                    if not dense_mode and grad[i, j, k, c] == 0:
                        continue
                    acc = 0.0
                    v0 = param[i, j, k, c]
                    m0 = 1.0 if mask is None else mask[i, j, k, 0]
                    for di, dj, dk in [(-1, 0, 0), (1, 0, 0), (0, -1, 0),
                                       (0, 1, 0), (0, 0, -1), (0, 0, 1)]:
                        ii, jj, kk = i + di, j + dj, k + dk
                        if 0 <= ii < X and 0 <= jj < Y and 0 <= kk < Z:
                            d = np.clip(v0 - param[ii, jj, kk, c], -1, 1)
                            m1 = 1.0 if mask is None else mask[ii, jj, kk, 0]
                            acc += wd * d * m0 * m1
                    out[i, j, k, c] += acc
    return out


def test_tv_grad_dense(rng):
    p = rng.normal(size=(4, 5, 3, 2)).astype(np.float32) * 2
    g = rng.normal(size=p.shape).astype(np.float32)
    ours = np.asarray(tv_grad(jnp.asarray(p), jnp.asarray(g), 0.3, 0.3, 0.3, True))
    gold = golden_tv_add_grad(p, g, 0.3, True)
    np.testing.assert_allclose(ours, gold, atol=1e-6)


def test_tv_grad_sparse_skips_zero_grad(rng):
    p = rng.normal(size=(4, 4, 4, 1)).astype(np.float32)
    g = rng.normal(size=p.shape).astype(np.float32)
    g[g < 0] = 0.0
    ours = np.asarray(tv_grad(jnp.asarray(p), jnp.asarray(g), 0.5, 0.5, 0.5, False))
    gold = golden_tv_add_grad(p, g, 0.5, False)
    np.testing.assert_allclose(ours, gold, atol=1e-6)
    np.testing.assert_array_equal(ours[g == 0], 0.0)


def test_tv_grad_masked(rng):
    p = rng.normal(size=(4, 4, 4, 1)).astype(np.float32)
    g = rng.normal(size=p.shape).astype(np.float32)
    mask = (rng.uniform(size=(4, 4, 4, 1)) > 0.5).astype(np.float32)
    ours = np.asarray(
        tv_grad(jnp.asarray(p), jnp.asarray(g), 0.5, 0.5, 0.5, True,
                mask=jnp.asarray(mask))
    )
    gold = golden_tv_add_grad(p, g, 0.5, True, mask=mask)
    np.testing.assert_allclose(ours, gold, atol=1e-6)
