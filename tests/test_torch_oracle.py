"""Composed-forward parity vs the pure-torch reference oracle.

BASELINE.md's first quality target — "images & pixel/parameter
gradients allclose vs reference" — verified end to end: the oracle
(`tests/oracle.py`) assembles the reference's `forward_coarse` /
`forward_fine` from CUDA-free torch pieces, runs on the SAME parameters
and rays as this build's jitted forward, and both images and parameter
gradients must agree.

Tolerances are tiered (SURVEY.md §7.4.7): fp32 scan reassociation and
gather-order differences bound value agreement around 1e-5..1e-4; the
discrete thresholds (ceil step counts, T < 1e-3 early exit,
fast_color_thres) are knife-edge only on measure-zero inputs, which
fixed seeds avoid.
"""
import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.models import sdf_voxel as M

import oracle


XYZ_MIN = np.array([-1.0, -1.0, -1.0], np.float32)
XYZ_MAX = np.array([1.0, 1.0, 1.0], np.float32)
NEAR, BG, SVAL = 0.2, 1.0, 0.3


def _build(stage, seed=0, n=21, **kw):
    rng = np.random.default_rng(seed)
    cfg = M.make_model_config(
        stage=stage, xyz_min=XYZ_MIN, xyz_max=XYZ_MAX,
        num_voxels=20**3, num_voxels_base=20**3, stepsize=0.5,
        k0_dim=4, refnet_width=24, refnet_depth=3, rgbnet_width=24,
        rgbnet_depth=3, posbase_pe=2, viewbase_pe=1, refbase_pe=2,
        smooth_ksize=5, smooth_sigma=0.8, fast_color_thres=1e-4,
        mlp_bf16=False, shade_k=0, sample_k=0,
        grad_feat=(1.0, 2.0) if stage == "fine" else (),
        sdf_feat=(1.0, 2.0) if stage == "fine" else (),
        **kw,
    )
    box = SceneBox.create(XYZ_MIN, XYZ_MAX)
    params = M.init_params(jax.random.PRNGKey(3), cfg)
    params["sdf"] = params["sdf"] + jnp.asarray(
        rng.normal(size=params["sdf"].shape).astype(np.float32) * 0.1
    )
    params["k0"] = jnp.asarray(
        rng.normal(size=params["k0"].shape).astype(np.float32) * 0.3
    )
    cam = np.array([0.0, 0.1, 2.6], np.float32)
    rays_o = np.broadcast_to(cam, (n, 3)).copy()
    look = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    rays_d = (look - rays_o).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    return cfg, box, params, rays_o, rays_d, viewdirs


def _torch_params(params, cfg):
    tp = {
        "sdf": torch.tensor(
            np.transpose(np.asarray(params["sdf"]), (3, 0, 1, 2))[None],
            requires_grad=True,
        ),
        "k0": torch.tensor(
            np.transpose(np.asarray(params["k0"]), (3, 0, 1, 2))[None],
            requires_grad=True,
        ),
        "refnet": {
            k: torch.tensor(np.asarray(v), requires_grad=True)
            for k, v in params["refnet"].items()
        },
    }
    if "rgbnet" in params:
        tp["rgbnet"] = {
            k: torch.tensor(np.asarray(v), requires_grad=True)
            for k, v in params["rgbnet"].items()
        }
    return tp


def _oracle_kwargs(cfg):
    return dict(
        xyz_min=torch.tensor(XYZ_MIN), xyz_max=torch.tensor(XYZ_MAX),
        voxel_size=float(cfg.voxel_size), stepsize=float(cfg.stepsize),
        near=NEAR, bg=BG, s_val=SVAL, smooth_ksize=cfg.smooth_ksize,
        smooth_sigma=cfg.smooth_sigma, posbase_pe=cfg.posbase_pe,
        viewbase_pe=cfg.viewbase_pe, refbase_pe=cfg.refbase_pe,
        fast_color_thres=cfg.fast_color_thres,
    )


def _projection(seed, n):
    rng = np.random.default_rng(seed)
    return (
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n,)).astype(np.float32),
        rng.normal(size=(n, 1)).astype(np.float32),
    )


def _proj_loss_torch(out, proj):
    p1, p2, p3, p4 = (torch.tensor(p) for p in proj)
    return (
        (out["rgb_marched"] * p1).sum()
        + (out["sigmoid_rgb"] * p2).sum()
        + (out["alphainv_cum"] * p3).sum()
        + (out["cum_weights"] * p4).sum()
    )


def _proj_loss_jax(out, proj):
    p1, p2, p3, p4 = (jnp.asarray(p) for p in proj)
    return (
        jnp.sum(out["rgb_marched"] * p1)
        + jnp.sum(out["sigmoid_rgb"] * p2)
        + jnp.sum(out["alphainv_cum"] * p3)
        + jnp.sum(out["cum_weights"] * p4)
    )


def _grad_to_xyzc(t):
    return np.transpose(np.asarray(t.detach())[0], (1, 2, 3, 0))


def _compare_images(ref, got):
    for key, atol in [("rgb_marched", 3e-5), ("sigmoid_rgb", 3e-5),
                      ("alphainv_cum", 3e-5), ("cum_weights", 5e-5),
                      ("depth", 1e-4)]:
        np.testing.assert_allclose(
            np.asarray(got[key]).reshape(-1),
            np.asarray(ref[key].detach()).reshape(-1),
            rtol=2e-4, atol=atol, err_msg=key,
        )


def _compare_grads(tp, gj, keys):
    for name in keys:
        if name in ("sdf", "k0"):
            ref = _grad_to_xyzc(tp[name].grad)
            got = np.asarray(gj[name])
            scale = max(np.abs(ref).max(), 1e-3)
            np.testing.assert_allclose(
                got / scale, ref / scale, rtol=2e-4, atol=2e-5,
                err_msg=name,
            )
        else:
            for k, leaf in tp[name].items():
                ref = np.asarray(leaf.grad)
                got = np.asarray(gj[name][k])
                scale = max(np.abs(ref).max(), 1e-3)
                np.testing.assert_allclose(
                    got / scale, ref / scale, rtol=2e-4, atol=2e-5,
                    err_msg=f"{name}/{k}",
                )


@pytest.mark.parametrize("stage", ["geometry_searching", "coarse"])
def test_coarse_forward_and_grads_match_oracle(stage):
    cfg, box, params, rays_o, rays_d, viewdirs = _build(stage)
    n = rays_o.shape[0]
    proj = _projection(11, n)

    tp = _torch_params(params, cfg)
    out_t = oracle.forward_coarse(
        tp, torch.tensor(rays_o), torch.tensor(rays_d),
        torch.tensor(viewdirs), stage=stage, **_oracle_kwargs(cfg),
    )
    _proj_loss_torch(out_t, proj).backward()

    def jax_loss(p):
        out = M.forward(
            p, {}, cfg, box, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(viewdirs), jnp.asarray(SVAL), near=NEAR, bg=BG,
        )
        return _proj_loss_jax(out, proj), out

    (_, out_j), gj = jax.value_and_grad(jax_loss, has_aux=True)(params)
    _compare_images(out_t, out_j)
    _compare_grads(tp, gj, ["sdf", "k0", "refnet"])


def test_coarse_forward_with_mask_cache_matches_oracle():
    cfg, box, params, rays_o, rays_d, viewdirs = _build("coarse", seed=5)
    # a deliberately non-trivial occupancy summary from a second model;
    # scaled x2 so interior samples don't ALL sit exactly at the 1e-3
    # threshold (the mask holds {0, 1e-3} and a fully-enclosed sample
    # interpolates to exactly 1e-3 +/- one ulp — jax/torch rounding
    # would flip inclusion nondeterministically; with x2 only exact
    # boundary midpoints are knife-edge, which random rays never hit)
    prev = M.init_params(jax.random.PRNGKey(9), cfg)
    prev["sdf"] = prev["sdf"] * 0.6
    sdf_mask = M.build_sdf_mask(prev, cfg) * 2.0
    buffers = {
        "mask_cache": M.build_mask_cache(sdf_mask, XYZ_MIN, XYZ_MAX)
    }
    sdf_mask_t = torch.tensor(
        np.transpose(np.asarray(sdf_mask), (3, 0, 1, 2))[None]
    )
    n = rays_o.shape[0]
    proj = _projection(12, n)

    tp = _torch_params(params, cfg)
    out_t = oracle.forward_coarse(
        tp, torch.tensor(rays_o), torch.tensor(rays_d),
        torch.tensor(viewdirs), stage="coarse", sdf_mask=sdf_mask_t,
        mask_cache_thres=cfg.mask_cache_thres, **_oracle_kwargs(cfg),
    )
    _proj_loss_torch(out_t, proj).backward()

    def jax_loss(p):
        out = M.forward(
            p, buffers, cfg, box, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(viewdirs), jnp.asarray(SVAL), near=NEAR, bg=BG,
        )
        return _proj_loss_jax(out, proj), out

    (_, out_j), gj = jax.value_and_grad(jax_loss, has_aux=True)(params)
    _compare_images(out_t, out_j)
    _compare_grads(tp, gj, ["sdf", "k0", "refnet"])


def test_fine_forward_and_grads_match_oracle():
    cfg, box, params, rays_o, rays_d, viewdirs = _build("fine", seed=2)
    n = rays_o.shape[0]
    proj = _projection(13, n)

    tp = _torch_params(params, cfg)
    out_t = oracle.forward_fine(
        tp, torch.tensor(rays_o), torch.tensor(rays_d),
        torch.tensor(viewdirs), grad_feat=cfg.all_displace,
        center_sdf=cfg.center_sdf, use_grad_norm=cfg.use_grad_norm,
        **_oracle_kwargs(cfg),
    )
    _proj_loss_torch(out_t, proj).backward()

    def jax_loss(p):
        out = M.forward(
            p, {}, cfg, box, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(viewdirs), jnp.asarray(SVAL), near=NEAR, bg=BG,
        )
        return _proj_loss_jax(out, proj), out

    (_, out_j), gj = jax.value_and_grad(jax_loss, has_aux=True)(params)
    _compare_images(out_t, out_j)
    _compare_grads(tp, gj, ["sdf", "k0", "refnet", "rgbnet"])
