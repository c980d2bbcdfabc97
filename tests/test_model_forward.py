"""SDF voxel model forwards: shapes, MLP input dims vs the reference's
formulas, dense vs top-K shading equivalence, and gradient flow."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.models import sdf_voxel as M


def tiny_cfg(stage, **kw):
    defaults = dict(
        stage=stage,
        xyz_min=np.array([-1.0, -1.0, -1.0], np.float32),
        xyz_max=np.array([1.0, 1.0, 1.0], np.float32),
        num_voxels=24**3,
        num_voxels_base=24**3,
        stepsize=0.5,
        k0_dim=4,
        refnet_width=16,
        refnet_depth=3,
        rgbnet_width=16,
        rgbnet_depth=3,
        posbase_pe=2,
        viewbase_pe=1,
        refbase_pe=2,
        fast_color_thres=1e-4,
        s_ratio=50.0,
        s_start=0.2,
    )
    if stage == "fine":
        defaults.update(grad_feat=(0.5, 1.0), sdf_feat=(0.5, 1.0))
    defaults.update(kw)
    xyz_min = defaults.pop("xyz_min")
    xyz_max = defaults.pop("xyz_max")
    cfg = M.make_model_config(xyz_min=xyz_min, xyz_max=xyz_max, **defaults)
    return cfg, SceneBox.create(xyz_min, xyz_max)


def make_rays(rng, n):
    rays_o = np.full((n, 3), 0.0, np.float32)
    rays_o[:, 2] = 3.0
    rays_o += rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    rays_d = target - rays_o
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    return jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(viewdirs)


def test_refnet_dims_match_reference_formula():
    # shiny-blender fine config (`config/shiny_blender.py:221-250`)
    cfg, _ = tiny_cfg(
        "fine", k0_dim=12, rgbnet_width=256, rgbnet_depth=4, refnet_width=256,
        refnet_depth=4, posbase_pe=5, viewbase_pe=3, refbase_pe=8,
        grad_feat=(0.5, 1.0, 1.5, 2.0), sdf_feat=(0.5, 1.0, 1.5, 2.0),
    )
    assert cfg.rgbnet_in_dim() == 106  # (3+30)+12+3+12+24+1+21
    assert cfg.refnet_in_dim() == 256 + 3 + 48
    # coarse config (`config/shiny_blender.py:148-178`)
    ccfg, _ = tiny_cfg(
        "coarse", k0_dim=12, refnet_width=192, refnet_depth=3, posbase_pe=5,
        viewbase_pe=1, refbase_pe=5,
    )
    assert ccfg.refnet_in_dim() == (3 + 30) + 12 + 3 + (3 + 30) + (3 + 6)


def test_coarse_forward_shapes_and_sanity(rng):
    cfg, box = tiny_cfg("geometry_searching", smooth_ksize=5, smooth_sigma=0.8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rays_o, rays_d, viewdirs = make_rays(rng, 16)
    out = M.forward_coarse(
        params, {}, cfg, box, rays_o, rays_d, viewdirs,
        jnp.asarray(0.2), near=0.2, bg=1.0,
    )
    assert out["rgb_marched"].shape == (16, 3)
    assert out["alphainv_cum"].shape == (16,)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()
    assert (np.asarray(out["rgb_marched"]) >= 0).all()
    assert (np.asarray(out["rgb_marched"]) <= 1).all()
    # ball-init SDF crosses zero inside the box -> some opacity
    assert np.asarray(out["cum_weights"]).max() > 0.01


def test_fine_forward_shapes(rng):
    cfg, box = tiny_cfg("fine")
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    rays_o, rays_d, viewdirs = make_rays(rng, 8)
    out = M.forward_fine(
        params, {}, cfg, box, rays_o, rays_d, viewdirs,
        jnp.asarray(0.05), near=0.2, bg=1.0,
    )
    assert out["rgb_marched"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()


def test_topk_matches_dense_when_capacity_sufficient(rng):
    for stage in ("geometry_searching", "fine"):
        cfg_d, box = tiny_cfg(stage)
        params = M.init_params(jax.random.PRNGKey(2), cfg_d)
        cfg_k = dataclasses.replace(cfg_d, shade_k=cfg_d.s_max)
        rays_o, rays_d, viewdirs = make_rays(rng, 12)
        args = (rays_o, rays_d, viewdirs, jnp.asarray(0.1))
        dense = M.forward(params, {}, cfg_d, box, *args, near=0.2, bg=1.0)
        topk = M.forward(params, {}, cfg_k, box, *args, near=0.2, bg=1.0)
        for key in ("rgb_marched", "sigmoid_rgb", "cum_weights", "alphainv_cum"):
            np.testing.assert_allclose(
                np.asarray(dense[key]), np.asarray(topk[key]), atol=1e-5,
                err_msg=f"{stage}:{key}",
            )
        assert not np.asarray(topk["overflow"]).any()


def test_gradients_flow_to_all_params(rng):
    cfg, box = tiny_cfg("geometry_searching", shade_k=64)
    params = M.init_params(jax.random.PRNGKey(3), cfg)
    rays_o, rays_d, viewdirs = make_rays(rng, 8)
    target = jnp.asarray(rng.uniform(size=(8, 3)).astype(np.float32))

    def loss_fn(p):
        out = M.forward(p, {}, cfg, box, rays_o, rays_d, viewdirs,
                        jnp.asarray(0.2), near=0.2, bg=1.0)
        return jnp.mean((out["rgb_marched"] - target) ** 2)

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads["sdf"]).sum()) > 0
    assert float(jnp.abs(grads["k0"]).sum()) > 0
    assert float(jnp.abs(grads["refnet"]["w0"]).sum()) > 0
    assert np.isfinite(float(jnp.abs(grads["sdf"]).sum()))


def test_mask_cache_and_inc_mask_reduce_live_set(rng):
    cfg, box = tiny_cfg("coarse")
    params = M.init_params(jax.random.PRNGKey(4), cfg)
    rays_o, rays_d, viewdirs = make_rays(rng, 8)
    # full-open mask cache == no-op (value well above the threshold:
    # at exactly thres, fp interpolation of a constant dips a ulp under,
    # a flakiness the reference shares)
    full_mask = jnp.full((*cfg.world_size, 1), 1.0, jnp.float32)
    buffers = {"mask_cache": M.build_mask_cache(full_mask, box.xyz_min, box.xyz_max)}
    out_open = M.forward(params, buffers, cfg, box, rays_o, rays_d, viewdirs,
                         jnp.asarray(0.2), near=0.2, bg=1.0)
    out_none = M.forward(params, {}, cfg, box, rays_o, rays_d, viewdirs,
                         jnp.asarray(0.2), near=0.2, bg=1.0)
    np.testing.assert_allclose(
        np.asarray(out_open["rgb_marched"]), np.asarray(out_none["rgb_marched"]),
        atol=1e-6,
    )
    # closed mask cache kills everything -> pure background
    closed = jnp.zeros((*cfg.world_size, 1), jnp.float32)
    buffers = {"mask_cache": M.build_mask_cache(closed, box.xyz_min, box.xyz_max)}
    out_closed = M.forward(params, buffers, cfg, box, rays_o, rays_d, viewdirs,
                           jnp.asarray(0.2), near=0.2, bg=1.0)
    np.testing.assert_allclose(np.asarray(out_closed["rgb_marched"]), 1.0, atol=1e-6)
    # a shrunken inc box reduces (or keeps) total weight
    buffers = {
        "inc_lower": jnp.asarray([0.4, 0.4, 0.4]),
        "inc_upper": jnp.asarray([0.6, 0.6, 0.6]),
    }
    out_inc = M.forward(params, buffers, cfg, box, rays_o, rays_d, viewdirs,
                        jnp.asarray(0.2), near=0.2, bg=1.0)
    assert (
        np.asarray(out_inc["valid"]).sum() < np.asarray(out_none["valid"]).sum()
    )


def test_scale_volume_grid_and_sdf_mask(rng):
    cfg, box = tiny_cfg("coarse")
    params = M.init_params(jax.random.PRNGKey(5), cfg)
    import numpy as _np

    big_cfg, _ = tiny_cfg("coarse", num_voxels=32**3)
    params2 = M.scale_volume_grid(params, big_cfg)
    assert params2["sdf"].shape[:3] == big_cfg.world_size
    assert params2["k0"].shape[:3] == big_cfg.world_size
    # sdf_mask quirk: threshold is (sdf < 0.5), not |sdf| < 0.5
    mask = M.build_sdf_mask(params, cfg)
    gold = _np.where(_np.asarray(params["sdf"]) < 0.5, 1e-3, 0.0)
    _np.testing.assert_allclose(_np.asarray(mask), gold, atol=0)


def test_sample_k_compaction_matches_dense(rng):
    # capacity >= s_max keeps every valid sample -> bitwise-equal render
    for stage in ("coarse", "fine"):
        cfg_d, box = tiny_cfg(stage)
        params = M.init_params(jax.random.PRNGKey(7), cfg_d)
        cfg_c = dataclasses.replace(cfg_d, sample_k=cfg_d.s_max - 8)
        rays_o, rays_d, viewdirs = make_rays(rng, 12)
        args = (rays_o, rays_d, viewdirs, jnp.asarray(0.1))
        dense = M.forward(params, {}, cfg_d, box, *args, near=0.2, bg=1.0)
        comp = M.forward(params, {}, cfg_c, box, *args, near=0.2, bg=1.0)
        ok = ~np.asarray(comp["overflow"])  # rays whose valid set fit
        assert ok.any()
        for key in ("rgb_marched", "cum_weights", "alphainv_cum", "depth"):
            np.testing.assert_allclose(
                np.asarray(dense[key])[ok], np.asarray(comp[key])[ok],
                atol=1e-5, err_msg=f"{stage}:{key}",
            )
