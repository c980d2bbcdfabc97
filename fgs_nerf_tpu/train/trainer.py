"""Per-stage training orchestration.

TPU-native re-design of ``nerf_training`` (`model/nerf_training.py:
61-537`): the hot loop is one jitted train step (forward + losses +
backward + TV gradient injection + masked Adam) over static shapes;
everything schedule-shaped (LR decay, step-indexed events, incremental
voxel bounds, the s-value schedule) is computed host-side and fed in as
scalars so it never retraces.  Retraces happen only at progressive-
scaling rungs (new grid shapes — bounded by ``pg_scale``), at
``tv_updates`` events, and once if ``tv_dense_before`` is crossed,
mirroring the reference's own optimizer-reset points.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.models import sdf_voxel as M
from fgs_nerf_tpu.optim.masked_adam import AdamState, ParamOpts, adam_update, init_state
from fgs_nerf_tpu.ops.sdf2alpha import s_val_schedule
from fgs_nerf_tpu.ops.tv import tv_grad
from fgs_nerf_tpu.train import checkpoint as ckpt_lib
from fgs_nerf_tpu.train import schedules
from fgs_nerf_tpu.train.losses import LossWeights, compute_losses
from fgs_nerf_tpu.data import rays as ray_lib
from fgs_nerf_tpu.parallel.mesh import replicated, shard_batch
from fgs_nerf_tpu.parallel.spatial_train import (
    make_spatial_gather, mesh_sp_size, place_spatial,
)
from fgs_nerf_tpu.train.stage_common import (
    apply_pervoxel_lr, apply_world_bound_scale, config_passthrough,
    drop_pervoxel_lr, pg_deduction,
)


def loss_weights_from_cfg(cfg_train) -> LossWeights:
    return LossWeights(
        weight_main=cfg_train.get("weight_main", 1.0),
        weight_rgbper=cfg_train.get("weight_rgbper", 0.0),
        weight_entropy_last=cfg_train.get("weight_entropy_last", 0.0),
        weight_orientation=cfg_train.get("weight_orientation", 0.0),
        sigmoid_rgb_loss=cfg_train.get("sigmoid_rgb_loss", 0.0),
        weight_tv_density=cfg_train.get("weight_tv_density", 0.0),
        weight_tv_k0=cfg_train.get("weight_tv_k0", 0.0),
        ori_tv=cfg_train.get("ori_tv", False),
    )


def make_param_opts(params: Dict[str, Any], cfg_train) -> Dict[str, ParamOpts]:
    skip = set(cfg_train.get("skip_zero_grad_fields", []))
    return {
        name: ParamOpts(skip_zero_grad=name in skip) for name in params
    }


def _make_forward_fn(cfg_model, box, near, bg, gather_fn, mesh):
    """Forward closure; shard_map-wrapped over dp for the sorted engine.

    Rays never interact (SURVEY.md §5.7), so the per-device forward on
    the local ray shard is EXACTLY the global forward restricted to
    those rays — sorts, packs and Pallas kernels all run on local
    shapes.  Replicated params transpose to a psum of the per-device
    grid/MLP cotangents, which is the dp gradient reduction."""
    dp_size = 0
    if mesh is not None and "dp" in mesh.axis_names:
        dp_size = int(mesh.shape["dp"])
    use_shmap = (
        cfg_model.engine == "sorted"
        and gather_fn is None and dp_size > 1
    )
    if not use_shmap:
        def forward_fn(p, buffers, rays_o, rays_d, viewdirs, sv):
            return M.forward(
                p, buffers, cfg_model, box, rays_o, rays_d, viewdirs, sv,
                near=near, bg=bg, gather_fn=gather_fn,
            )

        return forward_fn

    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    def _local(p, buffers, rays_o, rays_d, viewdirs, sv):
        out = M.forward(
            p, buffers, cfg_model, box, rays_o, rays_d, viewdirs, sv,
            near=near, bg=bg, gather_fn=None,
        )
        # every other output is per-ray ([n_local, ...]); s_val is the
        # one replicated scalar — re-attached outside the shard_map
        out.pop("s_val")
        return out

    dp = P("dp")
    fwd = shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), dp, dp, dp, P()),
        out_specs=dp,
        check_vma=False,
    )

    def forward_fn(p, buffers, rays_o, rays_d, viewdirs, sv):
        out = fwd(p, buffers, rays_o, rays_d, viewdirs, sv)
        out["s_val"] = sv
        return out

    return forward_fn


def make_train_step(
    cfg_model: M.SDFModelConfig,
    box: SceneBox,
    loss_w: LossWeights,
    opts: Dict[str, ParamOpts],
    *,
    near: float,
    bg: float,
    n_rand: int,
    sdf_tv: float,
    smooth_grad_tv: float,
    inject_tv: bool,
    tv_dense: bool,
    weight_tv_density: float,
    weight_tv_k0: float,
    use_nonempty_mask: bool,
    gather_fn=None,
    mesh=None,
):
    """Build the jitted train step for one (stage, rung, tv-config).

    ``gather_fn`` overrides the model's trilinear field gather — the
    spatially sharded gather when grids are sp-sharded
    (`parallel/spatial_train.py`).

    ``mesh``: when the sorted engine runs on a dp mesh, the forward is
    wrapped in ``shard_map`` over the ``dp`` axis so the engine's
    stable sorts and pack windows stay DEVICE-LOCAL (rays are
    independent; a GSPMD-global ``lax.sort`` over the sharded sample
    stream would all-gather it).  Grid/MLP params stay replicated; the
    shard_map transpose inserts the gradient psum.  The lattice engine
    needs no wrapper (its gathers partition cleanly under GSPMD)."""
    forward_fn = _make_forward_fn(cfg_model, box, near, bg, gather_fn, mesh)

    def step_fn(params, opt_state, buffers, rays_o, rays_d, viewdirs, target,
                s_val, lrs, tv_on):
        def loss_fn(p):
            sv = p["s_val"][0] if cfg_model.s_learn else s_val
            render = forward_fn(p, buffers, rays_o, rays_d, viewdirs, sv)
            nonempty = buffers.get("nonempty_mask") if use_nonempty_mask else None
            losses = compute_losses(
                render, target, viewdirs, p, cfg_model, loss_w,
                sdf_tv=sdf_tv, smooth_grad_tv=smooth_grad_tv, tv_on=tv_on,
                nonempty_mask=nonempty,
            )
            return losses["loss"], (render, losses)

        (loss, (render, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)

        if inject_tv:
            # fine-stage TV injected straight into the gradient
            # (`model/nerf_training.py:353-371`, `model/nerf.py:461-467`:
            # weight scaled by world_size.max()/128 and 1/N_rand).
            scale = max(cfg_model.world_size) / 128.0
            if weight_tv_density > 0 and sdf_tv > 0:
                w = weight_tv_density * sdf_tv / n_rand * scale * tv_on
                grads["sdf"] = tv_grad(
                    params["sdf"], grads["sdf"], w, w, w, tv_dense
                )
            if weight_tv_k0 > 0:
                wk = weight_tv_k0 / n_rand * scale * tv_on
                grads["k0"] = tv_grad(
                    params["k0"], grads["k0"], wk, wk, wk, tv_dense
                )

        new_params, new_opt = adam_update(
            params, grads, opt_state, lrs, opts,
            per_lr=buffers.get("per_lr"),
        )
        if not cfg_model.s_learn:
            new_params["s_val"] = jnp.full((1,), s_val, jnp.float32)

        w_full = render["weights"]
        wm = jnp.max(w_full, axis=-1)
        ws = jnp.sum(w_full, axis=-1)
        valid_ct = jnp.sum(render["valid"])
        metrics = {
            "loss": loss,
            "mse": losses["mse"],
            "wmax_mean": jnp.sum(wm * (wm > 0)) / jnp.maximum(jnp.sum(wm > 0), 1),
            "wsum_mean": jnp.sum(ws * (ws > 0)) / jnp.maximum(jnp.sum(ws > 0), 1),
            "w_nonzero_frac": jnp.mean((ws > 0).astype(jnp.float32)),
            "mask_frac": jnp.sum(render["live"]) / jnp.maximum(valid_ct, 1),
            "overflow_frac": jnp.mean(render["overflow"].astype(jnp.float32)),
            "overflow_sample_frac": jnp.mean(
                render["overflow_sample"].astype(jnp.float32)
            ),
            "overflow_shade_frac": jnp.mean(
                render["overflow_shade"].astype(jnp.float32)
            ),
        }
        return new_params, new_opt, metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))


def _next_capacity(k: int, s_max: int) -> int:
    """The next capacity rung: 1.5x rounded up to the sublane multiple,
    capped at the lattice depth (where overflow is impossible).  The
    ladder from any k to s_max is O(log s_max) rungs, so escalation
    retraces are bounded like pg_scale's."""
    if k <= 0 or k >= s_max:
        return k
    return min(s_max, ((k + k // 2 + 7) // 8) * 8)


@dataclasses.dataclass
class StageResult:
    params: Dict[str, Any]
    cfg_model: M.SDFModelConfig
    box: SceneBox
    ckpt_path: str
    psnr_history: list
    # mean step metrics over the final i_print window (loss, mse,
    # overflow_frac, ...) — lets callers assert capacity/quality
    # invariants without re-running a step
    last_metrics: Dict[str, float] = dataclasses.field(default_factory=dict)


def train_stage(
    cfg,
    stage: str,
    data_dict: Dict[str, Any],
    xyz_min: np.ndarray,
    xyz_max: np.ndarray,
    out_dir: str,
    *,
    coarse_ckpt_path: Optional[str] = None,
    mask_ckpt_path: Optional[str] = None,
    mesh=None,
    logger=None,
    seed: int = 777,
    i_print: int = 500,
    n_iters_override: Optional[int] = None,
    resume: bool = False,
    i_validate: int = 0,
) -> StageResult:
    """Run one training stage end to end (`model/nerf_training.py:61`)."""
    import logging
    import os

    log = logger or logging.getLogger("fgs")
    from fgs_nerf_tpu.config.base import stage_blocks

    cfg_model_blk, cfg_train = stage_blocks(cfg, stage)

    # world bound scale + progressive-scale deduction + config filter
    # (`model/nerf_training.py:73-76, 93-101`; shared scaffolding)
    xyz_min, xyz_max, box = apply_world_bound_scale(
        cfg_model_blk, xyz_min, xyz_max
    )
    scale_ratio, pg_scale, cur_voxels = pg_deduction(cfg_train, cfg_model_blk)
    reset_iter = set(cfg_train.get("reset_iter", []))
    passthrough = config_passthrough(cfg_model_blk, M.SDFModelConfig)

    def build_cfg(nv: int) -> M.SDFModelConfig:
        return M.make_model_config(
            stage=stage, xyz_min=xyz_min, xyz_max=xyz_max, num_voxels=nv,
            sp_multiple=mesh_sp_size(mesh), **passthrough,
        )

    cfg_m = build_cfg(cur_voxels)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = M.init_params(k_init, cfg_m)

    # buffers: mask cache from the geometry-searching checkpoint
    buffers: Dict[str, Any] = {}
    if stage != "geometry_searching" and mask_ckpt_path and os.path.exists(mask_ckpt_path):
        mc_ckpt = ckpt_lib.load_checkpoint(mask_ckpt_path)
        prior_min, prior_max = mc_ckpt.box
        buffers["mask_cache"] = M.build_mask_cache(
            jnp.asarray(mc_ckpt.sdf_mask), prior_min, prior_max
        )
        params, buffers = M.set_nonempty_mask(params, buffers, cfg_m, box)

    # fine stage: warm-start SDF from the coarse grid
    # (`model/nerf_training.py:122-129`)
    if stage == "fine" and coarse_ckpt_path and os.path.exists(coarse_ckpt_path):
        c_ckpt = ckpt_lib.load_checkpoint(coarse_ckpt_path)
        sdf0 = jnp.asarray(c_ckpt.params["sdf"])
        params = M.init_sdf_from_sdf(
            params, sdf0, cfg_m, reduce=cfg_train.get("sdf_reduce", 1.0)
        )

    if cfg_model_blk.get("maskout_near_cam_vox", False):
        cam_o = jnp.asarray(
            data_dict["poses"][data_dict["i_train"], :3, 3], jnp.float32
        )
        params = M.maskout_near_cam_vox(params, cam_o, data_dict["near"], cfg_m, box)

    opt_state = init_state(params)
    opts = make_param_opts(params, cfg_train)
    loss_w = loss_weights_from_cfg(cfg_train)
    lr_state = schedules.LrState(schedules.initial_lrs(cfg_train, set(params)))

    near = float(data_dict["near"])
    bg = 1.0 if cfg.data.white_bkgd else 0.0
    n_rand = int(cfg_train["N_rand"])
    tv_terms = dict(cfg_train.get("tv_terms", {}))

    if mesh is not None:
        n_dev = int(np.prod(mesh.devices.shape))
        if n_rand % n_dev:
            raise ValueError(
                f"N_rand={n_rand} must divide the mesh size {n_dev} "
                f"(axes {dict(zip(mesh.axis_names, mesh.devices.shape))})"
            )
        if mesh_sp_size(mesh) > 1:
            # sdf/k0 + their Adam moments x-sharded over sp; the field
            # gather goes through the shard_map wrapper below and the
            # remaining grid work (stencils, TV, Adam) is GSPMD-
            # partitioned along the same placement
            params, opt_state = place_spatial(mesh, params, opt_state)
        else:
            # grids + MLPs replicated; the ray batch is the only sharded
            # input, XLA inserts the gradient psum (SURVEY.md §2.9)
            params = jax.device_put(params, replicated(mesh))
            opt_state = jax.device_put(opt_state, replicated(mesh))

    # ---- training rays -------------------------------------------------
    rng = np.random.default_rng(seed)
    images = np.asarray(data_dict["images"])[data_dict["i_train"]]
    poses = np.asarray(data_dict["poses"])[data_dict["i_train"]]
    hw = np.asarray(data_dict["HW"])[data_dict["i_train"]]
    ks = np.asarray(data_dict["Ks"])[data_dict["i_train"]]
    conv = dict(
        ndc=cfg.data.ndc, inverse_y=cfg.data.inverse_y,
        flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
    )
    sampler = cfg_train.get("ray_sampler", "random")
    if sampler == "in_maskcache" and "mask_cache" in buffers:
        mc = buffers["mask_cache"]
        keep_fn = ray_lib.make_maskcache_pixel_filter(
            box, cfg_m.world_size, cfg_m.stepsize, cfg_m.voxel_size,
            lambda pts: M.mask_cache_query(mc, pts, cfg_m.mask_cache_thres),
        )
        rgb_tr, o_tr, d_tr, v_tr, ratio = ray_lib.get_training_rays_in_maskcache(
            images, poses, hw, ks, keep_fn=keep_fn, near=near,
            far=float(data_dict["far"]), **conv,
        )
        log.info(f"in_maskcache ray filter kept ratio {ratio:.3f}")
        if len(rgb_tr) < n_rand:
            # a degenerate keep-set would crash the step with opaque
            # shape errors; fail loudly with the actual diagnosis
            raise ValueError(
                f"maskcache ray filter kept only {len(rgb_tr)} rays "
                f"(< N_rand={n_rand}) — the prior stage's sdf_mask and "
                "the current bbox are inconsistent"
            )
        flat = True
    elif sampler == "flatten" or sampler == "in_maskcache":
        rgb_tr, o_tr, d_tr, v_tr = ray_lib.get_training_rays_flatten(
            images, poses, hw, ks, **conv
        )
        flat = True
    else:  # 'random' / 'patch'
        rgb_tr, o_tr, d_tr, v_tr = ray_lib.get_training_rays(
            images, poses, hw, ks, **conv
        )
        flat = False
    if flat:
        index_gen = ray_lib.batch_index_generator(len(rgb_tr), n_rand, seed)
    elif sampler == "patch":
        view_gen = ray_lib.batch_index_generator(len(rgb_tr), 1, seed)

    # per-voxel LR from visibility counts (`model/nerf_training.py:189-198`)
    if cfg_train.get("pervoxel_lr", False):
        if flat:
            raise ValueError("pervoxel_lr requires a per-view ray sampler")
        cnt = M.voxel_count_views(
            cfg_m, box, o_tr, d_tr, near, float(data_dict["far"]),
            cfg_m.stepsize, downrate=int(cfg_train.get("pervoxel_lr_downrate", 1)),
        )
        # shape-matched per-voxel LR + low-visibility clamp
        # (`model/adam.py:210`, `model/nerf_training.py:189-198`)
        params, opts, buffers = apply_pervoxel_lr(
            params, opts, buffers, cnt, clamp_param="sdf", clamp_value=1.0
        )

    # ---- step function cache ------------------------------------------
    step_cache: Dict[Any, Any] = {}

    def build_step(global_step):
        sdf_tv = float(tv_terms.get("sdf_tv", 0.0))
        smooth_grad_tv = float(tv_terms.get("smooth_grad_tv", 0.0))
        tv_dense = global_step < cfg_train.get("tv_dense_before", 0)
        inject_tv = not cfg_train.get("ori_tv", False)
        key_ = (cfg_m, sdf_tv, smooth_grad_tv, tv_dense, inject_tv)
        if key_ not in step_cache:
            gather_fn = (
                make_spatial_gather(mesh)
                if mesh is not None and mesh_sp_size(mesh) > 1 else None
            )
            step_cache[key_] = make_train_step(
                cfg_m, box, loss_w, opts,
                near=near, bg=bg, n_rand=n_rand,
                sdf_tv=sdf_tv, smooth_grad_tv=smooth_grad_tv,
                inject_tv=inject_tv, tv_dense=tv_dense,
                weight_tv_density=loss_w.weight_tv_density,
                weight_tv_k0=loss_w.weight_tv_k0,
                use_nonempty_mask="nonempty_mask" in buffers,
                gather_fn=gather_fn,
                mesh=mesh,
            )
        return step_cache[key_]

    n_iters = n_iters_override or int(cfg_train["N_iters"])
    psnr_hist = []
    metric_acc: Dict[str, list] = {}
    t0 = time.time()
    time_log = {"ray_sample": 0.0, "render_opt": 0.0, "log": 0.0}
    last_metrics: Dict[str, float] = {}

    ckpt_path = os.path.join(out_dir, f"{stage}_last.npz")
    os.makedirs(out_dir, exist_ok=True)

    # mid-stage resume (`model/utils.py:42-60` reload path): restore
    # params, moments, LR state, and the progressive-scaling rung.
    start = 0
    if resume and os.path.exists(ckpt_path):
        rck = ckpt_lib.load_checkpoint(ckpt_path)
        start = min(rck.global_step, n_iters)
        for _ in [p for p in pg_scale if p <= start]:
            cur_voxels = int(cur_voxels * scale_ratio)
        pg_scale = [p for p in pg_scale if p > start]
        cfg_m = build_cfg(cur_voxels)
        params = jax.tree.map(jnp.asarray, rck.params)
        opt_state = init_state(params)
        if rck.opt is not None:
            opt_state = AdamState(
                jnp.asarray(rck.opt["step"]),
                jax.tree.map(jnp.asarray, rck.opt["exp_avg"]),
                jax.tree.map(jnp.asarray, rck.opt["exp_avg_sq"]),
            )
        if rck.meta.get("lrs"):
            lr_state = schedules.LrState(dict(rck.meta["lrs"]))
        log.info(f"[{stage}] resumed from {ckpt_path} at step {start}")

    for global_step in range(1 + start, n_iters + 1):
        t_start = time.time()
        # progressive scaling (`model/nerf_training.py:244-253`)
        if global_step in pg_scale:
            cur_voxels = int(cur_voxels * scale_ratio)
            new_cfg = build_cfg(cur_voxels)
            params = jax.device_get(params)
            params = M.scale_volume_grid(params, new_cfg)
            cfg_m = new_cfg
            if global_step in reset_iter:
                key, k_reset = jax.random.split(key)
                params = M.reset_refnet(params, k_reset, cfg_m)
                if cfg_model_blk.get("maskout_near_cam_vox", False):
                    cam_o = jnp.asarray(
                        data_dict["poses"][data_dict["i_train"], :3, 3], jnp.float32
                    )
                    params = M.maskout_near_cam_vox(params, cam_o, near, cfg_m, box)
            if "mask_cache" in buffers:
                params, buffers = M.set_nonempty_mask(params, buffers, cfg_m, box)
            params = jax.tree.map(jnp.asarray, params)
            opt_state = init_state(params)
            if mesh is not None:
                if mesh_sp_size(mesh) > 1:
                    params, opt_state = place_spatial(mesh, params, opt_state)
                else:
                    params = jax.device_put(params, replicated(mesh))
                    opt_state = jax.device_put(opt_state, replicated(mesh))
            lr_state = schedules.LrState(
                schedules.initial_lrs(cfg_train, set(params))
            )
            # reference quirk: per-voxel LR is not recomputed after a
            # rescale — the shape check silently disables it
            # (`model/adam.py:210`); mirror that by dropping it.
            opts, buffers = drop_pervoxel_lr(opts, buffers)
            log.info(
                f"[{stage}] pg_scale at {global_step}: voxels -> {cur_voxels} "
                f"world_size -> {cfg_m.world_size}"
            )

        # incremental voxel box (`model/nerf_training.py:285-293`)
        bounds = schedules.inc_bounds(global_step, cfg_train)
        if bounds is not None:
            buffers["inc_lower"] = jnp.asarray(bounds[0], jnp.float32)
            buffers["inc_upper"] = jnp.asarray(bounds[1], jnp.float32)
        else:
            buffers.pop("inc_lower", None)
            buffers.pop("inc_upper", None)

        # batch selection (`model/nerf_training.py:256-283`)
        if flat:
            sel = next(index_gen)
            batch = (o_tr[sel], d_tr[sel], v_tr[sel], rgb_tr[sel])
        elif sampler == "patch":
            b = int(next(view_gen)[0])
            patch = int(round(np.sqrt(n_rand)))
            r0 = rng.integers(0, rgb_tr.shape[1] - patch)
            c0 = rng.integers(0, rgb_tr.shape[2] - patch)
            sl = np.s_[b, r0:r0 + patch, c0:c0 + patch]
            batch = tuple(
                a[sl].reshape(-1, 3) for a in (o_tr, d_tr, v_tr, rgb_tr)
            )
        else:
            b = rng.integers(0, rgb_tr.shape[0], n_rand)
            r = rng.integers(0, rgb_tr.shape[1], n_rand)
            c = rng.integers(0, rgb_tr.shape[2], n_rand)
            batch = (o_tr[b, r, c], d_tr[b, r, c], v_tr[b, r, c], rgb_tr[b, r, c])
        rays_o_b, rays_d_b, viewdirs_b, target_b = shard_batch(mesh, *batch)
        time_log["ray_sample"] += time.time() - t_start
        t_start = time.time()

        s_val = float(
            s_val_schedule(global_step, cfg_m.s_ratio, cfg_m.s_start, cfg_m.step_start)
        )
        step_fn = build_step(global_step)
        tv_on = 1.0 if schedules.tv_active(global_step, cfg_train) else 0.0
        lrs = {
            k: jnp.asarray(v, jnp.float32) for k, v in lr_state.lrs.items()
        }
        params, opt_state, metrics = step_fn(
            params, opt_state, buffers, rays_o_b, rays_d_b, viewdirs_b, target_b,
            jnp.asarray(s_val, jnp.float32), lrs, jnp.asarray(tv_on, jnp.float32),
        )
        time_log["render_opt"] += time.time() - t_start
        t_start = time.time()

        # host-side schedule updates (end of step)
        schedules.update_lrs(lr_state, global_step, cfg_train)
        schedules.apply_tv_updates(tv_terms, global_step, cfg_train)

        # step-indexed model mutations (`model/nerf_training.py:446-456`):
        # s-schedule parameter overrides and smoothing-kernel swaps both
        # change static model config -> a bounded retrace.
        s_updates = cfg_model_blk.get("s_updates", {})
        if (global_step - 1) in s_updates:
            cfg_m = dataclasses.replace(cfg_m, **s_updates[global_step - 1])
            log.info(f"[{stage}] s_updates at {global_step - 1}: "
                     f"{s_updates[global_step - 1]}")
        smooth_updates = cfg_model_blk.get("smooth_updates", {})
        if (global_step - 1) in smooth_updates:
            upd = {
                ("smooth_ksize" if k_ == "ksize" else
                 "smooth_sigma" if k_ == "sigma" else k_): v_
                for k_, v_ in smooth_updates[global_step - 1].items()
            }
            cfg_m = dataclasses.replace(cfg_m, **upd)
            log.info(f"[{stage}] smooth_updates at {global_step - 1}: {upd}")

        # metrics stay on device until the log flush — a per-step
        # float() would serialize the async dispatch pipeline.
        metric_acc.setdefault("_pending", []).append(metrics)

        if global_step % i_print == 0 or global_step == n_iters:
            pending = [jax.device_get(m) for m in metric_acc.pop("_pending", [])]
            means = last_metrics = {
                k_: float(np.mean([m[k_] for m in pending]))
                for k_ in (pending[0] if pending else {})
            }
            psnrs = [-10.0 * np.log10(max(float(m["mse"]), 1e-12)) for m in pending]
            psnr_hist.extend(psnrs)
            eps = time.time() - t0
            log.info(
                f"[{stage}] iter {global_step:6d}/{n_iters} loss {means['loss']:.6f} "
                f"PSNR {np.mean(psnrs):5.2f} "
                f"Wmax {means['wmax_mean']:.3f} Wsum {means['wsum_mean']:.3f} "
                f"W>0 {means['w_nonzero_frac']:.3f} mask% {100*means['mask_frac']:.2f} "
                f"ovf% {100*means['overflow_frac']:.3f} s {s_val:.4g} "
                f"eps {eps:.0f}s "
                f"(ray {time_log['ray_sample']:.1f}s step {time_log['render_opt']:.1f}s)"
            )
            if means.get("overflow_frac", 0.0) > 0.0:
                # Dropped samples silently bias the composite: the
                # top-K compaction's exactness claim holds only at
                # zero overflow (`models/sdf_voxel.py:_compact_valid`).
                # Auto-escalation (default on): rebuild the step at the
                # next capacity rung — a bounded retrace, like pg_scale
                # (the reference never drops samples: its ragged sampler
                # is exact, `render_utils_kernel.cu:144-242`).
                if cfg_train.get("capacity_auto_escalate", True):
                    upd = {}
                    if means.get("overflow_sample_frac", 0.0) > 0.0:
                        upd["sample_k"] = _next_capacity(
                            cfg_m.sample_k, cfg_m.s_max
                        )
                    if means.get("overflow_shade_frac", 0.0) > 0.0:
                        upd["shade_k"] = _next_capacity(
                            cfg_m.shade_k, cfg_m.s_max
                        )
                    upd = {
                        k_: v_ for k_, v_ in upd.items()
                        if v_ != getattr(cfg_m, k_)
                    }
                    if upd:
                        cfg_m = dataclasses.replace(cfg_m, **upd)
                        log.warning(
                            f"[{stage}] capacity overflow on "
                            f"{100 * means['overflow_frac']:.2f}% of rays — "
                            f"auto-escalating {upd} (s_max={cfg_m.s_max}; "
                            f"one retrace)"
                        )
                if not cfg_train.get("capacity_auto_escalate", True):
                    log.warning(
                        f"[{stage}] capacity overflow on "
                        f"{100 * means['overflow_frac']:.2f}% of rays "
                        f"(sample_k={cfg_m.sample_k}, shade_k={cfg_m.shade_k}, "
                        f"s_max={cfg_m.s_max}): samples are being dropped and "
                        f"accuracy degrades — raise sample_k/shade_k (or set "
                        f"them to -1 for exact auto-capacity)"
                    )

        # periodic visual validation (`model/nerf_training.py:482-503`):
        # one random test view rendered with full PSNR/SSIM logging.
        if i_validate and (global_step % i_validate == 0 or global_step == n_iters):
            from fgs_nerf_tpu.eval.render import make_render_fn, render_viewpoints

            i_test = np.asarray(data_dict["i_test"])
            pick = [int(rng.integers(0, len(i_test)))] if global_step != n_iters else list(range(len(i_test)))
            sel_views = i_test[pick]
            rc = make_render_fn(cfg_m, box, near=near, bg=bg)
            render_viewpoints(
                rc, params, buffers,
                np.asarray(data_dict["poses"])[sel_views],
                np.asarray(data_dict["HW"])[sel_views],
                np.asarray(data_dict["Ks"])[sel_views], conv, s_val,
                gt_imgs=np.asarray(data_dict["images"])[sel_views],
                masks=np.asarray(data_dict["masks"])[sel_views],
                savedir=os.path.join(out_dir, f"render_test_{stage}"),
                eval_ssim=True, logger=log, step=global_step,
            )

        if global_step == n_iters or global_step % int(cfg_train.get("save_iter", 1 << 30)) == 0:
            sdf_mask = M.build_sdf_mask(params, cfg_m)
            ckpt_lib.save_checkpoint(
                ckpt_path,
                global_step=global_step,
                params=params,
                opt_state=opt_state,
                sdf_mask=sdf_mask,
                model_kwargs=dataclasses.asdict(cfg_m),
                xyz_min=np.asarray(box.xyz_min),
                xyz_max=np.asarray(box.xyz_max),
                lrs=lr_state.lrs,
            )
            log.info(f"[{stage}] checkpoint saved at {ckpt_path}")

        time_log["log"] += time.time() - t_start

    return StageResult(
        params=params, cfg_model=cfg_m, box=box, ckpt_path=ckpt_path,
        psnr_history=psnr_hist, last_metrics=last_metrics,
    )
