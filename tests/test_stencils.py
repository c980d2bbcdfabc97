"""Stencil ops vs torch conv goldens (`model/nerf.py:224-278, 485-508`)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from fgs_nerf_tpu.ops.stencils import (
    gaussian_kernel_3d,
    sdf_gradient,
    smooth_grid,
    sobel_gradient_kernels,
    tv_smooth,
    tv_smooth_kernel,
)


def torch_conv_replicate(grid_xyzc, kernel):
    """Per-channel 3-D conv with replicate padding (torch golden)."""
    c = grid_xyzc.shape[-1]
    g = torch.from_numpy(np.moveaxis(grid_xyzc, -1, 0)[None])  # [1,C,X,Y,Z]
    k = torch.from_numpy(kernel)[None, None].repeat(c, 1, 1, 1, 1)
    pad = kernel.shape[0] // 2
    gp = F.pad(g, (pad,) * 6, mode="replicate")
    out = F.conv3d(gp, k, groups=c)
    return np.moveaxis(out[0].numpy(), 0, -1)


def test_gaussian_smooth_matches_torch(rng):
    for ksize, sigma in [(3, 1.0), (5, 0.8)]:
        grid = rng.normal(size=(10, 9, 8, 1)).astype(np.float32)
        ours = np.asarray(smooth_grid(jnp.asarray(grid), ksize, sigma))
        gold = torch_conv_replicate(grid, gaussian_kernel_3d(ksize, sigma))
        np.testing.assert_allclose(ours, gold, atol=2e-6)


def test_gaussian_kernel_matches_reference_construction():
    # reference builds exp(-(x^2+y^2+z^2)/(2 sigma^2)) / sum
    # (`model/nerf.py:260-268`)
    k = gaussian_kernel_3d(5, 0.8)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[2, 2, 2] == k.max()
    np.testing.assert_allclose(k, np.flip(k, 0), atol=0)


def test_tv_smooth_matches_torch(rng):
    grid = rng.normal(size=(7, 7, 7, 3)).astype(np.float32)
    ours = np.asarray(tv_smooth(jnp.asarray(grid)))
    gold = torch_conv_replicate(grid, tv_smooth_kernel())
    np.testing.assert_allclose(ours, gold, atol=2e-6)


def test_sdf_gradient_interpolate(rng):
    s = rng.normal(size=(8, 9, 10, 1)).astype(np.float32)
    vs = 0.05
    g = np.asarray(sdf_gradient(jnp.asarray(s), vs, "interpolate"))
    s0 = s[..., 0]
    gold_x = np.zeros_like(s0)
    gold_x[1:-1] = (s0[2:] - s0[:-2]) / (2 * vs)
    np.testing.assert_allclose(g[..., 0], gold_x, atol=1e-6)
    assert (g[0, :, :, 0] == 0).all() and (g[-1, :, :, 0] == 0).all()
    gold_z = np.zeros_like(s0)
    gold_z[:, :, 1:-1] = (s0[:, :, 2:] - s0[:, :, :-2]) / (2 * vs)
    np.testing.assert_allclose(g[..., 2], gold_z, atol=1e-6)


def test_sdf_gradient_grad_conv_matches_torch(rng):
    s = rng.normal(size=(8, 8, 8, 1)).astype(np.float32)
    vs = 0.04
    ours = np.asarray(sdf_gradient(jnp.asarray(s), vs, "grad_conv"))
    ks = sobel_gradient_kernels(vs)
    for a in range(3):
        gold = torch_conv_replicate(s, ks[a])[..., 0]
        np.testing.assert_allclose(ours[..., a], gold, atol=2e-5)


def test_sobel_kernels_match_reference_weights():
    # spot-check against `model/nerf.py:224-248` hand construction
    vs = 0.1
    ks = sobel_gradient_kernels(vs)
    base = np.array(
        [
            [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
            [[2, 4, 2], [4, 8, 4], [2, 4, 2]],
            [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
        ],
        np.float64,
    )
    k1 = base / (base[0].sum() * 2 * vs)
    assert np.allclose(ks[0][1], 0)
    np.testing.assert_allclose(ks[0][0], -k1[0], atol=1e-7)
    np.testing.assert_allclose(ks[0][2], k1[2], atol=1e-7)
    assert np.allclose(ks[2][:, :, 1], 0)
    np.testing.assert_allclose(ks[2][:, :, 0], -k1[:, :, 0], atol=1e-7)
