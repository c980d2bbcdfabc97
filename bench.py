"""Benchmark: training rays/s per chip on the real TPU.

Measures the full jitted training step (forward + losses + backward +
masked Adam) of the coarse-stage SDF voxel model at the reference's
workload shape: 8192 rays/step, ~115^3 grid (1.5M voxels), stepsize 0.5
(`config/shiny_blender.py:107,149,162` — see BASELINE.md).

The reference publishes no numbers; BASELINE.md documents the estimate
used for ``vs_baseline``: a single modern CUDA GPU running the
reference's ragged CUDA pipeline at roughly REF_RAYS_PER_S rays/s
(a 15k-iteration coarse stage in ~25 min).  The driver records the JSON
line on real TPU hardware.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REF_RAYS_PER_S = 20_000.0  # documented estimate, see BASELINE.md
N_RAND = 8192
N_WARMUP = 3
N_ITERS = 20


def _parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--engine", type=str, default=None, choices=["lattice", "sorted"],
        help="override the render engine (default: the bench config's "
        "choice)",
    )
    p.add_argument(
        "--stage", type=str, default="coarse", choices=["coarse", "fine"],
        help="workload: 'coarse' (the driver's primary metric; also "
        "emits the ckpt-workload and fine-stage variants on stderr) or "
        "'fine' only (256^3 grid, hierarchical taps, rgbnet->refnet, "
        "per config/shiny_blender.py:181-236)",
    )
    p.add_argument(
        "--mesh", type=str, default="none",
        help="scaling-efficiency mode: 'dp=N' (or 'dp=N,sp=M') measures "
        "the sharded step and reports rays/s plus rays/s/device — run "
        "on a real slice when one exists, or under "
        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
        "JAX_PLATFORMS=cpu for a virtual-mesh numerical check (CPU "
        "timings are NOT performance data).  Default 'none' is the "
        "driver's single-chip benchmark.",
    )
    return p.parse_args()


def _time_step(step, params, opt_state, buffers, batch, s_val, lrs, tv_on,
               n_warmup=N_WARMUP, n_iters=N_ITERS):
    """Warm up, then time the jitted step; returns (seconds/step, ...state)."""
    import jax

    for _ in range(n_warmup):
        params, opt_state, metrics = step(
            params, opt_state, buffers, *batch, s_val, lrs, tv_on
        )
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, metrics = step(
            params, opt_state, buffers, *batch, s_val, lrs, tv_on
        )
    jax.block_until_ready(metrics["loss"])
    # params/opt_state are donated by the jitted step — return the live
    # final state so callers can keep using it (e.g. the breakdown trace)
    return (time.perf_counter() - t0) / n_iters, params, opt_state


def main():
    args = _parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # full-step compiles run minutes on the tunneled TPU; persist them
    import jax

    # Persist TPU compiles only: CPU AOT cache entries embed machine
    # features and clash across XLA_FLAGS variants (observed
    # prefer-no-gather mismatch warnings on reload).
    if jax.default_backend() != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache", jax.default_backend()),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    if args.stage == "fine":
        _fine_workload(args.engine, to_stderr=False)
        return

    from fgs_nerf_tpu.core.box import SceneBox
    from fgs_nerf_tpu.models import sdf_voxel as M
    from fgs_nerf_tpu.optim.masked_adam import ParamOpts, init_state
    from fgs_nerf_tpu.train.losses import LossWeights
    from fgs_nerf_tpu.train.trainer import make_train_step

    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    cfg = M.make_model_config(
        stage="coarse", xyz_min=xyz_min, xyz_max=xyz_max,
        num_voxels=1_500_000, num_voxels_base=1_500_000, stepsize=0.5,
        k0_dim=12, refnet_width=192, refnet_depth=3,
        posbase_pe=5, viewbase_pe=1, refbase_pe=5,
        smooth_ksize=5, smooth_sigma=0.8,
        s_ratio=50.0, s_start=0.2, fast_color_thres=1e-4, shade_k=256,
        sample_k=288, shade_remat=False,
        # the channel-major sorted engine is the measured coarse-stage
        # winner (73.3k vs 55.1k rays/s lattice, round 4); --engine
        # lattice reproduces the classic pipeline's number
        engine="sorted",
    )
    if args.engine:
        cfg = dataclasses.replace(cfg, engine=args.engine)
    box = SceneBox.create(xyz_min, xyz_max)
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    loss_w = LossWeights(
        weight_main=1.0, weight_rgbper=0.2, weight_entropy_last=1e-3,
        weight_orientation=1e-4, sigmoid_rgb_loss=0.1,
        weight_tv_density=0.01, weight_tv_k0=0.0, ori_tv=True,
    )
    opts = {
        name: ParamOpts(skip_zero_grad=name in ("k0", "sdf")) for name in params
    }
    step = make_train_step(
        cfg, box, loss_w, opts, near=0.2, bg=1.0, n_rand=N_RAND,
        sdf_tv=0.1, smooth_grad_tv=0.05, inject_tv=False, tv_dense=True,
        weight_tv_density=0.01, weight_tv_k0=0.0, use_nonempty_mask=False,
    )
    opt_state = init_state(params)
    lrs = {"sdf": jnp.asarray(0.1), "k0": jnp.asarray(0.1),
           "refnet": jnp.asarray(1e-3)}

    mesh = None
    if args.mesh not in ("none", "1", ""):
        from fgs_nerf_tpu.parallel.mesh import build_mesh
        from fgs_nerf_tpu.parallel.spatial_train import (
            make_spatial_gather, mesh_sp_size, place_spatial,
        )

        mesh = build_mesh(args.mesh)
        if mesh is not None and mesh_sp_size(mesh) > 1:
            # rebuild the step with sp-sharded grids + sharded gather
            cfg = dataclasses.replace(
                cfg,
                world_size=(
                    cfg.world_size[0]
                    + (-cfg.world_size[0]) % mesh_sp_size(mesh),
                    *cfg.world_size[1:],
                ),
            )
            params = M.init_params(jax.random.PRNGKey(0), cfg)
            opt_state = init_state(params)
            step = make_train_step(
                cfg, box, loss_w, opts, near=0.2, bg=1.0, n_rand=N_RAND,
                sdf_tv=0.1, smooth_grad_tv=0.05, inject_tv=False,
                tv_dense=True, weight_tv_density=0.01, weight_tv_k0=0.0,
                use_nonempty_mask=False,
                gather_fn=make_spatial_gather(mesh),
            )
            params, opt_state = place_spatial(mesh, params, opt_state)
        elif mesh is not None:
            from fgs_nerf_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))
            opt_state = jax.device_put(opt_state, replicated(mesh))

    rng = np.random.default_rng(0)
    cam = np.array([0.0, 0.0, 3.5], np.float32)
    rays_o = np.broadcast_to(cam, (N_RAND, 3)).copy()
    look = rng.normal(size=(N_RAND, 3)).astype(np.float32) * 0.4
    rays_d = look - rays_o
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = rng.uniform(size=(N_RAND, 3)).astype(np.float32)
    if mesh is not None:
        from fgs_nerf_tpu.parallel.mesh import shard_batch

        batch = shard_batch(mesh, rays_o, rays_d, viewdirs, target)
    else:
        batch = tuple(jnp.asarray(a) for a in (rays_o, rays_d, viewdirs, target))
    s_val = jnp.asarray(0.2, jnp.float32)
    tv_on = jnp.asarray(1.0, jnp.float32)

    dt, params, opt_state = _time_step(
        step, params, opt_state, {}, batch, s_val, lrs, tv_on
    )

    rays_per_s = N_RAND / dt
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        print(json.dumps({
            "metric": "train_rays_per_s_mesh",
            "value": round(rays_per_s, 1),
            "unit": "rays/s",
            "mesh": args.mesh,
            "backend": jax.default_backend(),
            "step_ms": round(dt * 1e3, 2),
            "rays_per_s_per_device": round(rays_per_s / n_dev, 1),
            "vs_baseline": round(rays_per_s / REF_RAYS_PER_S, 3),
        }))
        return
    print(json.dumps({
        "metric": "train_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "step_ms": round(dt * 1e3, 2),
        "vs_baseline": round(rays_per_s / REF_RAYS_PER_S, 3),
    }))

    # Checkpoint-workload variant (stderr, so the driver still sees ONE
    # stdout JSON line): when a trained coarse checkpoint exists, rerun
    # the same timing with its mask cache installed — the live-sample
    # distribution of a real trained scene rather than the synthetic
    # everything-live worst case.  Generate one with
    # ``python run.py --mode train --config quick_synthetic`` or any
    # real scene; point FGS_BENCH_CKPT at the geometry/coarse .npz.
    import glob as _glob

    ckpt_path = os.environ.get("FGS_BENCH_CKPT")
    if not ckpt_path:
        # most recent first — a stale or different-scene checkpoint's
        # mask cache would skew the ckpt-workload metric
        cands = sorted(
            _glob.glob(os.path.join("results", "*", "*geometry_searching_last.npz"))
            + _glob.glob(os.path.join("results", "*", "*coarse_last.npz")),
            key=os.path.getmtime, reverse=True,
        )
        ckpt_path = cands[0] if cands else None
    try:
        _ckpt_workload_variant(
            ckpt_path, cfg, box, loss_w, opts, batch, s_val, lrs, tv_on
        )
    except Exception as e:  # noqa: BLE001 — the stderr extra must never
        # break the primary stdout JSON line's exit status
        print(f"ckpt-workload variant skipped: {e!r}", file=sys.stderr)

    try:
        _fine_workload(args.engine, to_stderr=True)
    except Exception as e:  # noqa: BLE001 — same isolation as above
        print(f"fine-stage variant skipped: {e!r}", file=sys.stderr)

    try:
        _breakdown_variant(step, params, opt_state, batch, s_val, lrs, tv_on)
    except Exception as e:  # noqa: BLE001 — same isolation as above
        print(f"breakdown variant skipped: {e!r}", file=sys.stderr)


# VERDICT r4 item 8: a driver-visible device-time breakdown so
# COMPOSITION regressions (a sort growing, a kernel silently hitting a
# slow path) are visible without a manual profiling session.  Order
# matters: serve patterns must win over the bare "sort" prefix
# ("sorted_window_gather" is a serve, not a sort).
_BUCKETS = (
    ("serve", ("window_gather", "window_serve", "tap_window")),
    ("accumulate", ("dense_accumulate", "scatter")),
    ("mlp", ("fused_shade", "dot_general", "dot.")),
    ("sort", ("sort.", "sort_")),
)


def _breakdown_variant(step, params, opt_state, batch, s_val, lrs, tv_on):
    """Trace 2 steps; aggregate device op time into coarse buckets."""
    import glob as _glob
    import gzip
    from collections import defaultdict

    import jax

    logdir = "/tmp/fgs_bench_trace"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    for _ in range(2):
        params, opt_state, metrics = step(
            params, opt_state, {}, *batch, s_val, lrs, tv_on
        )
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    paths = _glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    totals = defaultdict(float)
    step_total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if "TPU" not in pid_names.get(ev.get("pid"), ""):
            continue
        name = ev["name"]
        if name.startswith("jit_step_fn"):
            step_total += ev["dur"]
            continue
        if name.isdigit():  # TensorCore step markers, not ops
            continue
        for bucket, pats in _BUCKETS:
            if any(p in name for p in pats) or (
                bucket == "sort" and name.startswith("sort")
            ):
                totals[bucket] += ev["dur"]
                break
        else:
            totals["other"] += ev["dur"]
    if step_total <= 0:
        return
    shares = {
        k: round(v / 2e3, 2) for k, v in sorted(totals.items())
    }
    print(json.dumps({
        "metric": "train_step_breakdown_ms",
        "device_step_ms": round(step_total / 2e3, 2),
        **shares,
    }), file=sys.stderr)


def _fine_workload(engine_override=None, to_stderr=True):
    """Fine-stage bench (VERDICT r4 item 2): the most expensive stage of
    real training — 256^3 grid, 8,192 rays, hierarchical taps
    ``grad_feat=sdf_feat=(0.5,1,1.5,2)``, rgbnet(256x4) -> refnet(256x4),
    shade_k=128 / sample_k=512, per `config/shiny_blender.py:181-236`
    (mirrored in `fgs_nerf_tpu/config/scenes.py` fine_model) and
    `model/nerf.py:776-941`."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fgs_nerf_tpu.core.box import SceneBox
    from fgs_nerf_tpu.models import sdf_voxel as M
    from fgs_nerf_tpu.optim.masked_adam import ParamOpts, init_state
    from fgs_nerf_tpu.train.losses import LossWeights
    from fgs_nerf_tpu.train.trainer import make_train_step

    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    cfg = M.make_model_config(
        stage="fine", xyz_min=xyz_min, xyz_max=xyz_max,
        num_voxels=256**3, num_voxels_base=256**3, stepsize=0.5,
        k0_dim=12, rgbnet_width=256, rgbnet_depth=4,
        refnet_width=256, refnet_depth=4,
        posbase_pe=5, viewbase_pe=3, refbase_pe=8,
        grad_feat=(0.5, 1.0, 1.5, 2.0), sdf_feat=(0.5, 1.0, 1.5, 2.0),
        center_sdf=True, use_viewdir=True,
        s_ratio=50.0, s_start=0.05, fast_color_thres=1e-4,
        shade_k=128, sample_k=512, shade_remat=False,
        # two-pass sorted fine engine (the lattice fine path's
        # channel-last tap streams physically lane-pad to 16x their
        # logical bytes at 256^3 and exceed HBM)
        engine="sorted",
    )
    if engine_override:
        cfg = dataclasses.replace(cfg, engine=engine_override)
    box = SceneBox.create(xyz_min, xyz_max)
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    # fine_train loss weights (`config/shiny_blender.py:181-218`)
    loss_w = LossWeights(
        weight_main=1.0, weight_rgbper=0.0, weight_entropy_last=1e-3,
        weight_orientation=1e-4, sigmoid_rgb_loss=0.02,
        weight_tv_density=0.01, weight_tv_k0=0.0, ori_tv=False,
    )
    opts = {
        name: ParamOpts(skip_zero_grad=name in ("k0", "sdf"))
        for name in params
    }
    step = make_train_step(
        cfg, box, loss_w, opts, near=0.2, bg=1.0, n_rand=N_RAND,
        sdf_tv=0.1, smooth_grad_tv=0.05, inject_tv=True, tv_dense=True,
        weight_tv_density=0.01, weight_tv_k0=0.0, use_nonempty_mask=False,
    )
    lrs = {"sdf": jnp.asarray(5e-3), "k0": jnp.asarray(0.1),
           "refnet": jnp.asarray(1e-3), "rgbnet": jnp.asarray(1e-3)}

    rng = np.random.default_rng(0)
    cam = np.array([0.0, 0.0, 3.5], np.float32)
    rays_o = np.broadcast_to(cam, (N_RAND, 3)).copy()
    look = rng.normal(size=(N_RAND, 3)).astype(np.float32) * 0.4
    rays_d = look - rays_o
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = rng.uniform(size=(N_RAND, 3)).astype(np.float32)
    batch = tuple(jnp.asarray(a) for a in (rays_o, rays_d, viewdirs, target))

    dt, _, _ = _time_step(
        step, params, init_state(params), {}, batch,
        jnp.asarray(0.05, jnp.float32), lrs, jnp.asarray(1.0, jnp.float32),
        n_warmup=2, n_iters=6,
    )
    line = json.dumps({
        "metric": "train_rays_per_s_fine",
        "value": round(N_RAND / dt, 1),
        "unit": "rays/s",
        "step_ms": round(dt * 1e3, 2),
        "vs_baseline": round(N_RAND / dt / REF_RAYS_PER_S, 3),
    })
    print(line, file=sys.stderr if to_stderr else sys.stdout)

    # masked variant: real fine training always runs behind the prior
    # stage's mask cache; occupancy (not the dense worst case) sets the
    # realistic throughput.  Uses the newest trained checkpoint's mask.
    try:
        import glob as _glob

        from fgs_nerf_tpu.train.checkpoint import load_checkpoint

        cands = sorted(
            _glob.glob(os.path.join("results", "*", "coarse_last.npz"))
            + _glob.glob(
                os.path.join("results", "*", "geometry_searching_last.npz")
            ),
            key=os.path.getmtime, reverse=True,
        )
        ck = load_checkpoint(cands[0]) if cands else None
        if ck is not None and getattr(ck, "sdf_mask", None) is not None:
            buffers = {
                "mask_cache": M.build_mask_cache(
                    jnp.asarray(ck.sdf_mask), *ck.box
                )
            }
            p2 = M.init_params(jax.random.PRNGKey(0), cfg)
            dt_m, _, _ = _time_step(
                step, p2, init_state(p2), buffers, batch,
                jnp.asarray(0.05, jnp.float32), lrs,
                jnp.asarray(1.0, jnp.float32), n_warmup=2, n_iters=6,
            )
            print(json.dumps({
                "metric": "train_rays_per_s_fine_masked",
                "value": round(N_RAND / dt_m, 1),
                "unit": "rays/s",
                "step_ms": round(dt_m * 1e3, 2),
                "ckpt": cands[0],
                "vs_baseline": round(N_RAND / dt_m / REF_RAYS_PER_S, 3),
            }), file=sys.stderr if to_stderr else sys.stdout)
    except Exception as e:  # noqa: BLE001 — extras never break the metric
        print(f"masked fine variant skipped: {e!r}", file=sys.stderr)


def _ckpt_workload_variant(ckpt_path, cfg, box, loss_w, opts, batch, s_val,
                           lrs, tv_on):
    """Re-time the step with a trained checkpoint's mask cache (stderr)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fgs_nerf_tpu.models import sdf_voxel as M
    from fgs_nerf_tpu.optim.masked_adam import init_state
    from fgs_nerf_tpu.train.checkpoint import load_checkpoint
    from fgs_nerf_tpu.train.trainer import make_train_step

    if not (ckpt_path and os.path.exists(ckpt_path)):
        return
    ck = load_checkpoint(ckpt_path)
    if getattr(ck, "sdf_mask", None) is None:
        print(f"ckpt-workload variant skipped: {ckpt_path} has no sdf_mask",
              file=sys.stderr)
        return
    buffers = {
        "mask_cache": M.build_mask_cache(jnp.asarray(ck.sdf_mask), *ck.box)
    }
    cfg_ck = dataclasses.replace(cfg, stage="coarse")
    step_ck = make_train_step(
        cfg_ck, box, loss_w, opts, near=0.2, bg=1.0,
        n_rand=N_RAND, sdf_tv=0.1, smooth_grad_tv=0.05, inject_tv=False,
        tv_dense=True, weight_tv_density=0.01, weight_tv_k0=0.0,
        use_nonempty_mask=False,
    )
    params_ck = M.init_params(jax.random.PRNGKey(0), cfg_ck)
    dt_ck, _, _ = _time_step(
        step_ck, params_ck, init_state(params_ck), buffers, batch,
        s_val, lrs, tv_on,
    )
    print(json.dumps({
        "metric": "train_rays_per_s_ckpt_workload",
        "value": round(N_RAND / dt_ck, 1),
        "unit": "rays/s",
        "step_ms": round(dt_ck * 1e3, 2),
        "ckpt": ckpt_path,
        "vs_baseline": round(N_RAND / dt_ck / REF_RAYS_PER_S, 3),
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
