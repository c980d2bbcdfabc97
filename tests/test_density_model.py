"""DVGO-style density model vs reference formulas."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.models import density_voxel as D


def test_activate_density_matches_torch(rng):
    d = rng.normal(size=(100,)).astype(np.float32)
    alpha_init = 0.01
    act_shift = float(np.log(1 / (1 - alpha_init) - 1))
    interval = 0.5
    ours = np.asarray(D.activate_density(jnp.asarray(d), interval, act_shift))
    gold = 1 - torch.exp(
        -F.softplus(torch.from_numpy(d) + act_shift) * interval
    )
    np.testing.assert_allclose(ours, gold.numpy(), atol=1e-6)


def test_density_forward(rng):
    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    cfg = D.make_density_config(
        xyz_min, xyz_max, 16**3, 16**3, stepsize=0.5, fast_color_thres=1e-4
    )
    box = SceneBox.create(xyz_min, xyz_max)
    params = D.init_params(cfg)
    n = 16
    rays_o = np.full((n, 3), [0, 0, 3.0], np.float32)
    rays_o += rng.normal(size=(n, 3)).astype(np.float32) * 0.2
    look = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    rays_d = look - rays_o
    vd = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    out = D.forward(
        params, {}, cfg, box, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(vd), near=0.2, bg=1.0,
    )
    assert out["rgb_marched"].shape == (n, 3)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()
    # gradients flow to both grids
    def loss(p):
        o = D.forward(p, {}, cfg, box, jnp.asarray(rays_o), jnp.asarray(rays_d),
                      jnp.asarray(vd), near=0.2, bg=1.0)
        return jnp.sum(o["rgb_marched"] ** 2)
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["density"]).sum()) > 0
    assert float(jnp.abs(g["k0"]).sum()) > 0
