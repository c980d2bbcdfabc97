"""The ``--dvgo_init`` geometry-searching driver.

TPU-native equivalent of ``geometry_searching``
(`model/coarse_geometry_searching.py:105-380`): trains the DVGO-style
density model instead of the SDF model for the first stage, with its
own optimizer groups (``lrate_density`` / ``lrate_k0``), LR schedule,
progressive scaling, per-voxel LR init, and checkpoint.  The loop is
one jitted step over static shapes, exactly like ``trainer.py``.

The checkpoint lands at ``geometry_searching_last.npz`` (the reference
also redirects its dvgo ckpt there when ``model.ref`` — which is
hardcoded True at `model/dvgo.py:49` — see
`coarse_geometry_searching.py:368-370`) and embeds an alpha-based
``sdf_mask`` so the downstream coarse stage's MaskCache + bbox shrink
consume it unchanged (see ``density_voxel.build_sdf_mask`` for why the
reference's own handoff is latent/broken).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.models import density_voxel as D
from fgs_nerf_tpu.models import sdf_voxel as M
from fgs_nerf_tpu.optim.masked_adam import ParamOpts, adam_update, init_state
from fgs_nerf_tpu.train import checkpoint as ckpt_lib
from fgs_nerf_tpu.train import schedules
from fgs_nerf_tpu.train.trainer import StageResult
from fgs_nerf_tpu.train.stage_common import (
    PrintWindow, apply_pervoxel_lr, apply_world_bound_scale,
    config_passthrough, drop_pervoxel_lr, gather_view_rays, pg_deduction,
)
from fgs_nerf_tpu.parallel.mesh import replicated, shard_batch


def make_density_train_step(
    cfg_model: D.DensityModelConfig,
    box: SceneBox,
    opts: Dict[str, ParamOpts],
    *,
    near: float,
    bg: float,
    n_rand: int,
    weight_main: float,
    weight_entropy_last: float,
    weight_rgbper: float,
):
    """Jitted dvgo train step: mse + entropy_last + rgbper
    (`coarse_geometry_searching.py:233-247` — orientation and TV are
    forced off for this stage, `:150-151`)."""

    def step_fn(params, opt_state, buffers, rays_o, rays_d, viewdirs, target, lrs):
        def loss_fn(p):
            render = D.forward(
                p, buffers, cfg_model, box, rays_o, rays_d, viewdirs,
                near=near, bg=bg,
            )
            main = jnp.mean((render["rgb_marched"] - target) ** 2)
            loss = weight_main * main
            if weight_entropy_last > 0:
                pout = jnp.clip(render["alphainv_cum"], 1e-6, 1 - 1e-6)
                ent = -jnp.mean(
                    pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout)
                )
                loss = loss + weight_entropy_last * ent
            if weight_rgbper > 0:
                diff = jnp.sum((render["sel_rgb"] - target[:, None, :]) ** 2, -1)
                rgbper = (
                    jnp.sum(diff * jax.lax.stop_gradient(render["sel_weights"]))
                    / n_rand
                )
                loss = loss + weight_rgbper * rgbper
            return loss, (render, main)

        (loss, (render, main)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        new_params, new_opt = adam_update(
            params, grads, opt_state, lrs, opts, per_lr=buffers.get("per_lr")
        )
        w = render["weights"]
        wm = jnp.max(w, axis=-1)
        ws = jnp.sum(w, axis=-1)
        metrics = {
            "loss": loss,
            "mse": main,
            "wmax_mean": jnp.sum(wm * (wm > 0)) / jnp.maximum(jnp.sum(wm > 0), 1),
            "wsum_mean": jnp.sum(ws * (ws > 0)) / jnp.maximum(jnp.sum(ws > 0), 1),
            "w_nonzero_frac": jnp.mean((ws > 0).astype(jnp.float32)),
        }
        return new_params, new_opt, metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))


def train_density_stage(
    cfg,
    data_dict: Dict[str, Any],
    xyz_min: np.ndarray,
    xyz_max: np.ndarray,
    out_dir: str,
    *,
    mesh=None,
    logger=None,
    seed: int = 777,
    i_print: int = 500,
    n_iters_override: Optional[int] = None,
) -> StageResult:
    """Run the dvgo geometry search; writes geometry_searching_last.npz."""
    import logging

    log = logger or logging.getLogger("fgs")
    cfg_model_blk = dict(cfg.get("dvgo_model", {}))
    cfg_train = dict(cfg.get("dvgo", {}))
    if not cfg_model_blk or not cfg_train:
        raise ValueError(
            "--dvgo_init requires 'dvgo' and 'dvgo_model' config blocks "
            "(the reference ships none — see config/scenes.py defaults)"
        )

    xyz_min, xyz_max, box = apply_world_bound_scale(
        cfg_model_blk, xyz_min, xyz_max
    )
    scale_ratio, pg_scale, cur_voxels = pg_deduction(cfg_train, cfg_model_blk)
    passthrough = config_passthrough(cfg_model_blk, D.DensityModelConfig)

    def build_cfg(nv: int) -> D.DensityModelConfig:
        return D.make_density_config(
            xyz_min=xyz_min, xyz_max=xyz_max, num_voxels=nv, **passthrough
        )

    cfg_m = build_cfg(cur_voxels)
    params = D.init_params(cfg_m)
    buffers: Dict[str, Any] = {}

    opts = {
        name: ParamOpts(
            skip_zero_grad=name in set(cfg_train.get("skip_zero_grad_fields", []))
        )
        for name in params
    }
    lr_state = schedules.LrState(schedules.initial_lrs(cfg_train, set(params)))
    near = float(data_dict["near"])
    bg = 1.0 if cfg.data.white_bkgd else 0.0
    n_rand = int(cfg_train["N_rand"])

    if mesh is not None:
        from fgs_nerf_tpu.parallel.spatial_train import mesh_sp_size

        if mesh_sp_size(mesh) > 1:
            raise ValueError(
                "spatial grid sharding (sp > 1) is wired for the SDF "
                "stages only; the dvgo density init replicates its "
                "(small, 160^3-class) grids — run --dvgo_init with a "
                "dp-only mesh"
            )
        params = jax.device_put(params, replicated(mesh))

    # per-view training rays; the reference dvgo driver hardcodes the
    # random pixel sampler (`coarse_geometry_searching.py:220-226`)
    rng = np.random.default_rng(seed)
    rgb_tr, o_tr, d_tr, v_tr, _conv = gather_view_rays(cfg, data_dict)

    # per-voxel LR init (`coarse_geometry_searching.py:186-196`):
    # visibility counts scale the density LR; near-invisible voxels are
    # clamped hard negative (density -100 ~= empty space).
    if cfg_train.get("pervoxel_lr", False):
        cnt = M.voxel_count_views(
            cfg_m, box, o_tr, d_tr, near, float(data_dict["far"]),
            cfg_m.stepsize,
            downrate=int(cfg_train.get("pervoxel_lr_downrate", 1)),
        )
        params, opts, buffers = apply_pervoxel_lr(
            params, opts, buffers, cnt,
            clamp_param="density", clamp_value=-100.0,
        )

    opt_state = init_state(params)

    step_cache: Dict[Any, Any] = {}

    def build_step():
        if cfg_m not in step_cache:
            step_cache[cfg_m] = make_density_train_step(
                cfg_m, box, opts, near=near, bg=bg, n_rand=n_rand,
                weight_main=float(cfg_train.get("weight_main", 1.0)),
                weight_entropy_last=float(cfg_train.get("weight_entropy_last", 0.0)),
                weight_rgbper=float(cfg_train.get("weight_rgbper", 0.0)),
            )
        return step_cache[cfg_m]

    n_iters = n_iters_override or int(cfg_train["N_iters"])
    window = PrintWindow(log, "dvgo", n_iters)
    os.makedirs(out_dir, exist_ok=True)
    ckpt_path = os.path.join(out_dir, "geometry_searching_last.npz")

    for global_step in range(1, n_iters + 1):
        if global_step in pg_scale:
            cur_voxels = int(cur_voxels * scale_ratio)
            new_cfg = build_cfg(cur_voxels)
            params = D.scale_volume_grid(jax.device_get(params), new_cfg)
            cfg_m = new_cfg
            params = jax.tree.map(jnp.asarray, params)
            opt_state = init_state(params)
            if mesh is not None:
                params = jax.device_put(params, replicated(mesh))
                opt_state = jax.device_put(opt_state, replicated(mesh))
            lr_state = schedules.LrState(
                schedules.initial_lrs(cfg_train, set(params))
            )
            opts, buffers = drop_pervoxel_lr(opts, buffers)
            log.info(
                f"[dvgo] pg_scale at {global_step}: voxels -> {cur_voxels} "
                f"world_size -> {cfg_m.world_size}"
            )

        b = rng.integers(0, rgb_tr.shape[0], n_rand)
        r = rng.integers(0, rgb_tr.shape[1], n_rand)
        c = rng.integers(0, rgb_tr.shape[2], n_rand)
        batch = (o_tr[b, r, c], d_tr[b, r, c], v_tr[b, r, c], rgb_tr[b, r, c])
        rays_o_b, rays_d_b, viewdirs_b, target_b = shard_batch(mesh, *batch)

        lrs = {k: jnp.asarray(v, jnp.float32) for k, v in lr_state.lrs.items()}
        step_fn = build_step()
        params, opt_state, metrics = step_fn(
            params, opt_state, buffers, rays_o_b, rays_d_b, viewdirs_b,
            target_b, lrs,
        )
        schedules.update_lrs(lr_state, global_step, cfg_train)
        window.push(metrics)

        if global_step % i_print == 0 or global_step == n_iters:
            window.flush(global_step)

    sdf_mask = D.build_sdf_mask(
        params, cfg_m, thres=float(cfg_model_blk.get("bbox_thres", 1e-3))
    )
    ckpt_lib.save_checkpoint(
        ckpt_path,
        global_step=n_iters,
        params=params,
        opt_state=opt_state,
        sdf_mask=sdf_mask,
        model_kwargs=dataclasses.asdict(cfg_m),
        xyz_min=np.asarray(box.xyz_min),
        xyz_max=np.asarray(box.xyz_max),
        lrs=lr_state.lrs,
    )
    log.info(f"[dvgo] checkpoint saved at {ckpt_path}")
    return StageResult(
        params=params, cfg_model=cfg_m, box=box, ckpt_path=ckpt_path,
        psnr_history=window.psnr_history, last_metrics=window.last_means,
    )
