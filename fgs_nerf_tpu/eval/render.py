"""Chunked full-image rendering + evaluation.

Parity with ``render_viewpoints`` (`model/utils.py:249-441`): rays per
view are split into fixed 8192-ray chunks (padded to a static shape so
one jitted render serves every chunk), composited images get PSNR /
foreground / background splits, SSIM, optional LPIPS, an error heatmap,
and normal/depth/bgmap extras with the checkerboard matte.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.data.rays import get_rays_of_a_view
from fgs_nerf_tpu.eval import metrics as metrics_lib
from fgs_nerf_tpu.models import sdf_voxel as M


def make_render_fn(cfg_model, box: SceneBox, near: float, bg: float):
    """Jitted chunk renderer returning only the image-level outputs."""
    import dataclasses

    if getattr(cfg_model, "engine", "lattice") != "lattice":
        # the sorted engine is a training fast path; eval needs the
        # lattice renderer's full artifact set (normal_marched etc.)
        cfg_model = dataclasses.replace(cfg_model, engine="lattice")

    @jax.jit
    def render_chunk(params, buffers, rays_o, rays_d, viewdirs, s_val):
        out = M.forward(
            params, buffers, cfg_model, box, rays_o, rays_d, viewdirs, s_val,
            near=near, bg=bg,
        )
        return {
            "rgb_marched": out["rgb_marched"],
            "depth": out["depth"],
            "disp": out["disp"],
            "alphainv_cum": out["alphainv_cum"],
            "normal_marched": out["normal_marched"],
            # shading-capacity overflow per ray: a checkpoint evaluated
            # with an undersized shade_k/sample_k renders biased images;
            # render_viewpoints aggregates and warns like the trainer
            # (trainer.py overflow telemetry)
            "overflow": out["overflow"],
        }

    return render_chunk


def render_image(
    render_chunk, params, buffers, h, w, k, c2w, conv: Dict, s_val,
    chunk: int = 8192,
) -> Dict[str, np.ndarray]:
    rays_o, rays_d, viewdirs = get_rays_of_a_view(h, w, k, c2w, **conv)
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    v = viewdirs.reshape(-1, 3)
    n = len(o)
    pad = (-n) % chunk
    if pad:
        o = np.concatenate([o, np.repeat(o[-1:], pad, 0)])
        d = np.concatenate([d, np.repeat(d[-1:], pad, 0)])
        v = np.concatenate([v, np.repeat(v[-1:], pad, 0)])
    outs = []
    sv = jnp.asarray(s_val, jnp.float32)
    for s in range(0, n + pad, chunk):
        sl = slice(s, s + chunk)
        outs.append(
            jax.device_get(
                render_chunk(
                    params, buffers, jnp.asarray(o[sl]), jnp.asarray(d[sl]),
                    jnp.asarray(v[sl]), sv,
                )
            )
        )
    cat = {key: np.concatenate([ot[key] for ot in outs])[:n] for key in outs[0]}
    result = {}
    for key, val in cat.items():
        result[key] = val.reshape(h, w, -1) if val.ndim > 1 else val.reshape(h, w)
    if "overflow" in result:
        result["overflow_frac"] = float(np.mean(result.pop("overflow")))
    return result


def matte(vis, bgmap, dark=1.0, light=1.0, width=8):
    """Checkerboard matte for non-accumulated pixels
    (`model/utils.py:443-450`)."""
    acc = 1.0 - bgmap
    bg_mask = np.logical_xor(
        (np.arange(acc.shape[0]) % (2 * width) // width)[:, None],
        (np.arange(acc.shape[1]) % (2 * width) // width)[None, :],
    )
    bg = np.where(~bg_mask, light, dark)[..., None]
    if acc.ndim == 2:
        acc = acc[..., None]
    return vis * acc + bg * (1 - acc)


def render_viewpoints(
    render_chunk, params, buffers, poses, hw, ks, conv: Dict, s_val,
    gt_imgs=None, masks=None, savedir: Optional[str] = None,
    eval_ssim=True, eval_lpips=False, logger=None, step: int = 0,
) -> Dict[str, list]:
    import logging

    log = logger or logging.getLogger("fgs")
    stats = {"psnr": [], "fore_psnr": [], "bg_psnr": [], "ssim": [],
             "lpips_alex": [], "lpips_vgg": [], "rgbs": []}
    if savedir:
        os.makedirs(savedir, exist_ok=True)
    for i, c2w in enumerate(poses):
        h, w = int(hw[i][0]), int(hw[i][1])
        res = render_image(render_chunk, params, buffers, h, w, ks[i], c2w, conv, s_val)
        rgb = res["rgb_marched"]
        stats["rgbs"].append(rgb)
        ovf = res.get("overflow_frac", 0.0)
        if ovf > 0:
            log.warning(
                f"view {i}: {ovf:.2%} of rays overflowed the shading/"
                f"sample capacity (shade_k/sample_k) — rendered images "
                f"are biased; raise the capacities (or set -1 for exact)"
            )
        if gt_imgs is not None:
            gt = np.asarray(gt_imgs[i])
            mask = None if masks is None else np.asarray(masks[i])
            p, fore, back = metrics_lib.psnr_splits(rgb, gt, mask)
            stats["psnr"].append(p)
            stats["fore_psnr"].append(fore)
            stats["bg_psnr"].append(back)
            if eval_ssim:
                stats["ssim"].append(metrics_lib.rgb_ssim(rgb, gt, max_val=1))
            if eval_lpips:
                la = metrics_lib.rgb_lpips(gt, rgb, "alex")
                lv = metrics_lib.rgb_lpips(gt, rgb, "vgg")
                if la is not None:
                    stats["lpips_alex"].append(la)
                if lv is not None:
                    stats["lpips_vgg"].append(lv)
            log.info(
                f"view {i}: psnr {p:.2f} fore {fore:.2f} bg {back:.2f}"
            )
        if savedir:
            import imageio.v2 as imageio

            pre = f"{step}_" if step else ""
            imageio.imwrite(
                os.path.join(savedir, f"{pre}render_{i:03d}.png"),
                metrics_lib.to8b(rgb),
            )
            if gt_imgs is not None:
                gt8 = metrics_lib.to8b(np.asarray(gt_imgs[i]))
                err = 1 - np.exp(-20 * np.square(rgb - gt_imgs[i]).sum(-1))
                err8 = metrics_lib.to8b(np.repeat(err[..., None], 3, -1))
                imageio.imwrite(os.path.join(savedir, f"{pre}gt_{i:03d}.png"), gt8)
                imageio.imwrite(
                    os.path.join(savedir, f"{pre}{i:03d}.png"),
                    np.concatenate([err8, metrics_lib.to8b(rgb), gt8], axis=0),
                )
            bgmap = res["alphainv_cum"]
            normal_vis = matte(res["normal_marched"] / 2.0 + 0.5, bgmap[..., None])
            imageio.imwrite(
                os.path.join(savedir, f"{pre}_normal_{i:03d}.png"),
                metrics_lib.to8b(normal_vis),
            )
            # depth + bgmap dumps (`model/utils.py:386-429`): depth
            # normalized to its in-view max under the matte, bgmap raw
            depth = res["depth"]
            dmax = float(depth.max()) or 1.0
            depth_vis = matte((depth / dmax)[..., None], bgmap[..., None])
            imageio.imwrite(
                os.path.join(savedir, f"{pre}_depth_{i:03d}.png"),
                metrics_lib.to8b(np.repeat(depth_vis, 3, axis=-1)),
            )
            imageio.imwrite(
                os.path.join(savedir, f"{pre}_bgmap_{i:03d}.png"),
                metrics_lib.to8b(np.asarray(bgmap)[..., None].repeat(3, -1)),
            )
    if stats["psnr"]:
        msg = (
            f"Testing psnr {np.mean(stats['psnr']):.2f} (avg) | "
            f"foreground {np.mean(stats['fore_psnr']):.2f} | "
            f"background {np.mean(stats['bg_psnr']):.2f}"
        )
        if stats["ssim"]:
            msg += f" | ssim {np.mean(stats['ssim']):.4f}"
        log.info(msg)
    return stats
