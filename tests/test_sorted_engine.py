"""Parity tests: the channel-major sorted-stream engine vs the lattice
engine.

The sorted engine (`ops/sorted_cm.py`,
`models/sdf_voxel.forward_coarse_sorted`) must reproduce the lattice
engine's dense-shading (shade_k == 0) renders and parameter gradients —
the reorganization is a pure execution-order / layout change on CPU
(fp32 throughout), so tolerances are fp-roundoff-scale.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.models import sdf_voxel as M
from fgs_nerf_tpu.ops.sorted_cm import (
    build_cell_pack_cm,
    corner_weights_cm,
    pack_gather_sorted_cm,
    padded_rows_cm,
    rows_fracs_cm,
    z_stride,
)


def _setup(stage="coarse", n=33, seed=0, **kw):
    rng = np.random.default_rng(seed)
    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    cfg = M.make_model_config(
        stage=stage, xyz_min=xyz_min, xyz_max=xyz_max,
        num_voxels=24**3, num_voxels_base=24**3, stepsize=0.5,
        k0_dim=4, refnet_width=32, refnet_depth=3,
        posbase_pe=2, viewbase_pe=1, refbase_pe=2,
        smooth_ksize=5, smooth_sigma=0.8, fast_color_thres=1e-4,
        mlp_bf16=False, **kw,
    )
    box = SceneBox.create(xyz_min, xyz_max)
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    params["k0"] = jnp.asarray(
        rng.normal(size=params["k0"].shape).astype(np.float32) * 0.3
    )
    cam = np.array([0.0, 0.0, 2.5], np.float32)
    rays_o = np.broadcast_to(cam, (n, 3)).copy()
    look = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    rays_d = (look - rays_o).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    args = (jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(viewdirs))
    return cfg, box, params, args


def _sorted_inputs(shape3, idx):
    """Sort a query set by row key; returns (keys_s, iota_s, w8_s, keys)."""
    m = idx.shape[0]
    rows, (fx, fy, fz), ok = rows_fracs_cm(
        idx[:, 0], idx[:, 1], idx[:, 2], shape3
    )
    r = padded_rows_cm(shape3)
    keys = jnp.where(ok, rows, r).astype(jnp.int32)
    iota = jnp.arange(m, dtype=jnp.int32)
    keys_s, iota_s, fx_s, fy_s, fz_s = jax.lax.sort(
        (keys, iota, fx, fy, fz), dimension=0, num_keys=1
    )
    w8_s = corner_weights_cm(fx_s, fy_s, fz_s)
    return keys_s, iota_s, w8_s, keys


def test_pack_gather_cm_matches_dense_trilinear():
    """pack_gather_sorted_cm == trilinear_sample on in-range points and
    zero-padding semantics outside."""
    from fgs_nerf_tpu.ops.interp import trilinear_sample_index
    from fgs_nerf_tpu.ops.sorted_cm import unsort_channels

    rng = np.random.default_rng(2)
    shape = (7, 6, 5, 3)
    grid = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    idx = jnp.asarray(
        rng.uniform(-1.8, np.array(shape[:3]) + 0.8, size=(400, 3))
        .astype(np.float32)
    )
    keys_s, iota_s, w8_s, keys = _sorted_inputs(shape[:3], idx)
    grid_cm = jnp.transpose(grid, (3, 0, 1, 2))
    out_s = pack_gather_sorted_cm(grid_cm, keys_s, w8_s)  # [C, M]
    out_ch = unsort_channels(
        iota_s, keys, tuple(out_s[c] for c in range(shape[-1]))
    )
    out = jnp.stack(out_ch, axis=-1)
    ref = trilinear_sample_index(grid, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_gather_cm_grid_gradient_matches():
    """VJP of the channel-major serve == VJP of the dense trilinear
    gather (transposed)."""
    from fgs_nerf_tpu.ops.interp import trilinear_sample_index
    from fgs_nerf_tpu.ops.sorted_cm import unsort_channels

    rng = np.random.default_rng(3)
    shape = (6, 5, 7, 2)
    grid = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    idx = jnp.asarray(
        rng.uniform(-1.2, np.array(shape[:3]) + 0.4, size=(300, 3))
        .astype(np.float32)
    )
    ct = jnp.asarray(rng.normal(size=(300, shape[-1])).astype(np.float32))
    keys_s, iota_s, w8_s, keys = _sorted_inputs(shape[:3], idx)

    def f_sorted(g_cm):
        out_s = pack_gather_sorted_cm(g_cm, keys_s, w8_s)
        out_ch = unsort_channels(
            iota_s, keys, tuple(out_s[c] for c in range(shape[-1]))
        )
        return jnp.sum(jnp.stack(out_ch, axis=-1) * ct)

    def f_ref(g):
        return jnp.sum(trilinear_sample_index(g, idx) * ct)

    g1 = jax.grad(f_sorted)(jnp.transpose(grid, (3, 0, 1, 2)))
    g2 = jax.grad(f_ref)(grid)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(jnp.transpose(g2, (3, 0, 1, 2))),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("stage", ["geometry_searching", "coarse"])
def test_sorted_forward_matches_lattice(stage):
    cfg, box, params, (rays_o, rays_d, viewdirs) = _setup(stage)
    cfg_sorted = dataclasses.replace(cfg, engine="sorted")
    s_val = jnp.asarray(0.3, jnp.float32)
    r_lat = M.forward(params, {}, cfg, box, rays_o, rays_d, viewdirs,
                      s_val, near=0.2, bg=1.0)
    r_srt = M.forward(params, {}, cfg_sorted, box, rays_o, rays_d, viewdirs,
                      s_val, near=0.2, bg=1.0)
    for key, tol in [("rgb_marched", 1e-4), ("sigmoid_rgb", 1e-4),
                     ("alphainv_cum", 1e-5), ("weights", 1e-5),
                     ("depth", 1e-4), ("cum_weights", 1e-5)]:
        np.testing.assert_allclose(
            np.asarray(r_srt[key]), np.asarray(r_lat[key]),
            rtol=2e-4, atol=tol, err_msg=key,
        )
    ndv_lat = jnp.sum(r_lat["normal"] * (-viewdirs[:, None, :]), axis=-1)
    # ndv only matters where weights > 0 (dead samples carry junk
    # normals from clipped/sentinel coords in either engine)
    w = np.asarray(r_lat["weights"])
    np.testing.assert_allclose(
        np.asarray(r_srt["ndv"]) * w, np.asarray(ndv_lat) * w,
        rtol=1e-4, atol=1e-5,
    )


def test_sorted_engine_with_sample_k_and_maskcache():
    cfg, box, params, (rays_o, rays_d, viewdirs) = _setup(
        "coarse", sample_k=48
    )
    sdf_mask = M.build_sdf_mask(params, cfg)
    buffers = {"mask_cache": M.build_mask_cache(
        sdf_mask, box.xyz_min, box.xyz_max)}
    cfg_sorted = dataclasses.replace(cfg, engine="sorted")
    s_val = jnp.asarray(0.3, jnp.float32)
    r_lat = M.forward(params, buffers, cfg, box, rays_o, rays_d, viewdirs,
                      s_val, near=0.2, bg=1.0)
    r_srt = M.forward(params, buffers, cfg_sorted, box, rays_o, rays_d,
                      viewdirs, s_val, near=0.2, bg=1.0)
    np.testing.assert_allclose(
        np.asarray(r_srt["rgb_marched"]), np.asarray(r_lat["rgb_marched"]),
        rtol=2e-4, atol=1e-4,
    )


def test_sorted_engine_gradients_match():
    """Full loss gradient (incl. per-sample losses) parity."""
    from fgs_nerf_tpu.train.losses import LossWeights, compute_losses

    cfg, box, params, (rays_o, rays_d, viewdirs) = _setup("coarse", n=17)
    cfg_sorted = dataclasses.replace(cfg, engine="sorted")
    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.uniform(size=(17, 3)).astype(np.float32))
    loss_w = LossWeights(
        weight_main=1.0, weight_rgbper=0.1, weight_entropy_last=1e-3,
        weight_orientation=1e-4, sigmoid_rgb_loss=0.1,
        weight_tv_density=0.01, ori_tv=True,
    )
    s_val = jnp.asarray(0.3, jnp.float32)

    def loss(p, c):
        render = M.forward(p, {}, c, box, rays_o, rays_d, viewdirs,
                           s_val, near=0.2, bg=1.0)
        return compute_losses(render, target, viewdirs, p, c, loss_w,
                              sdf_tv=0.1, smooth_grad_tv=0.05, tv_on=1.0,
                              nonempty_mask=None)["loss"]

    l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, cfg_sorted))(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4)
    for name in ("sdf", "k0"):
        np.testing.assert_allclose(
            np.asarray(g2[name]), np.asarray(g1[name]),
            rtol=5e-4, atol=1e-5, err_msg=name,
        )
    for name, leaf1 in g1["refnet"].items():
        np.testing.assert_allclose(
            np.asarray(g2["refnet"][name]), np.asarray(leaf1),
            rtol=5e-4, atol=1e-5, err_msg=f"refnet/{name}",
        )


def test_build_cell_pack_cm_zero_padding():
    rng = np.random.default_rng(4)
    shape = (4, 3, 5, 2)
    grid = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    grid_cm = jnp.transpose(grid, (3, 0, 1, 2))
    rp = 4096
    pack = build_cell_pack_cm(grid_cm, rp)
    x, y, z, c = shape
    # HALF pack: 4 (dx, dy) groups only — dz is served via row + 1
    assert pack.shape == (4 * c, rp)
    zp = z_stride(z)
    assert zp == 128
    r = padded_rows_cm(shape[:3])
    pk = np.asarray(pack)
    # column of base (-1,-1,-1) (= row 0) holds z = -1 values: all zero
    assert np.all(pk[:, 0] == 0)
    # its z neighbor (row 1, base z = 0): only group (dx=1, dy=1)
    # (channels [6, 8)) is in-grid and reads grid[0, 0, 0]
    assert np.all(pk[:6, 1] == 0)
    np.testing.assert_allclose(pk[6:8, 1], np.asarray(grid[0, 0, 0]))
    # z-padding columns and everything past the content region are zero
    assert np.all(pk[:, r:] == 0)
    assert np.all(pk[:, z + 2:zp] == 0)
