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


def test_dvgo_init_stage_driver(tmp_path):
    """`run_training(dvgo_init=True)` trains the density geometry search
    and the coarse stage consumes its mask checkpoint
    (`run.py:30-36`, `coarse_geometry_searching.py:105-380`)."""
    import os

    from fgs_nerf_tpu.config.base import Cfg, deep_update, load_config
    from fgs_nerf_tpu.data.synthetic import make_synthetic_dataset
    from fgs_nerf_tpu.train.checkpoint import load_checkpoint
    from fgs_nerf_tpu.train.pipeline import run_training

    tiny = dict(
        dvgo=dict(N_iters=20, N_rand=256, pg_scale=[6],
                  pervoxel_lr=True, pervoxel_lr_downrate=2),
        dvgo_model=dict(num_voxels=16**3, num_voxels_base=16**3,
                        alpha_init=0.01, sample_k=0),
        coarse_train=dict(
            N_iters=8, N_rand=256, pg_scale=[], save_iter=10**9,
            decay_step_module={}, tv_updates={},
        ),
        coarse_model=dict(num_voxels=20**3, num_voxels_base=20**3, shade_k=32),
    )
    cfg = Cfg(deep_update(dict(load_config("shiny_blender")), tiny))
    data = make_synthetic_dataset(n_views=4, h=24, w=24, n_test=1)
    out = str(tmp_path / "dvgo_run")
    results = run_training(
        cfg, data, out, stages=("geometry_searching", "coarse"),
        dvgo_init=True,
    )
    geo = results["geometry_searching"]
    assert "density" in geo.params and "k0" in geo.params
    assert np.isfinite(geo.psnr_history).all()
    # handoff artifact: sdf_mask present and nonempty, coarse ran off it
    ck = load_checkpoint(os.path.join(out, "geometry_searching_last.npz"))
    assert ck.sdf_mask is not None and (np.asarray(ck.sdf_mask) > 0).any()
    assert "coarse" in results
    assert np.isfinite(results["coarse"].psnr_history).all()
