"""Capture a TPU trace of the coarse train step and print the top ops.

Usage: python scripts/profile_step.py [n_steps]

Builds the same workload as bench.py, runs a few traced steps with
``create_perfetto_trace=True``, then aggregates the perfetto JSON by op
name and prints the top-k durations — a poor man's `op_profile` that
needs no TensorBoard.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache", jax.default_backend()),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fgs_nerf_tpu.core.box import SceneBox
    from fgs_nerf_tpu.models import sdf_voxel as M
    from fgs_nerf_tpu.optim.masked_adam import ParamOpts, init_state
    from fgs_nerf_tpu.train.losses import LossWeights
    from fgs_nerf_tpu.train.trainer import make_train_step

    n_rand = 8192
    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    cfg = M.make_model_config(
        stage="coarse", xyz_min=xyz_min, xyz_max=xyz_max,
        num_voxels=1_500_000, num_voxels_base=1_500_000, stepsize=0.5,
        k0_dim=12, refnet_width=192, refnet_depth=3,
        posbase_pe=5, viewbase_pe=1, refbase_pe=5,
        smooth_ksize=5, smooth_sigma=0.8,
        s_ratio=50.0, s_start=0.2, fast_color_thres=1e-4, shade_k=256,
        sample_k=288, shade_remat=False,  # = bench.py config, so the
        # persistent compile cache is shared with bench runs
    )
    import dataclasses as _dc
    eng = os.environ.get("FGS_PROFILE_ENGINE")
    if eng:
        # the sorted engine shades densely (shade_k unused)
        cfg = _dc.replace(cfg, engine=eng)
    box = SceneBox.create(xyz_min, xyz_max)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    loss_w = LossWeights(
        weight_main=1.0, weight_rgbper=0.2, weight_entropy_last=1e-3,
        weight_orientation=1e-4, sigmoid_rgb_loss=0.1,
        weight_tv_density=0.01, weight_tv_k0=0.0, ori_tv=True,
    )
    opts = {name: ParamOpts(skip_zero_grad=name in ("k0", "sdf")) for name in params}
    step = make_train_step(
        cfg, box, loss_w, opts, near=0.2, bg=1.0, n_rand=n_rand,
        sdf_tv=0.1, smooth_grad_tv=0.05, inject_tv=False, tv_dense=True,
        weight_tv_density=0.01, weight_tv_k0=0.0, use_nonempty_mask=False,
    )
    opt_state = init_state(params)
    lrs = {"sdf": jnp.asarray(0.1), "k0": jnp.asarray(0.1),
           "refnet": jnp.asarray(1e-3)}
    rng = np.random.default_rng(0)
    cam = np.array([0.0, 0.0, 3.5], np.float32)
    rays_o = np.broadcast_to(cam, (n_rand, 3)).copy()
    look = rng.normal(size=(n_rand, 3)).astype(np.float32) * 0.4
    rays_d = look - rays_o
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = rng.uniform(size=(n_rand, 3)).astype(np.float32)
    batch = tuple(jnp.asarray(a) for a in (rays_o, rays_d, viewdirs, target))
    s_val = jnp.asarray(0.2, jnp.float32)
    tv_on = jnp.asarray(1.0, jnp.float32)
    return step, params, opt_state, batch, s_val, lrs, tv_on


def main():
    import jax

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    step, params, opt_state, batch, s_val, lrs, tv_on = build_step()
    for _ in range(2):
        params, opt_state, metrics = step(params, opt_state, {}, *batch, s_val, lrs, tv_on)
    jax.block_until_ready(metrics["loss"])

    logdir = "/tmp/fgs_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    for _ in range(n_steps):
        params, opt_state, metrics = step(params, opt_state, {}, *batch, s_val, lrs, tv_on)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no perfetto trace found under", logdir)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    # Keep only TPU-core tracks (device op events carry 'dur').
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        totals[ev["name"]] += ev["dur"]
        counts[ev["name"]] += 1
    total = sum(totals.values())
    print(f"total device op time: {total/1e6:.3f} s over {n_steps} steps "
          f"({total/1e6/n_steps:.3f} s/step)")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3/n_steps:9.2f} ms/step  x{counts[name]//n_steps:<4d} {name[:110]}")

    # Join trace op names with the optimized HLO's source metadata (if a
    # dump exists — scripts/dump_hlo.py writes it) and aggregate by
    # source line: surfaces the long tail the per-op view hides.
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_hlo.txt"
    if not os.path.exists(hlo_path):
        return
    import re

    src_of = {}
    pat = re.compile(
        r"%(\S+?) = .*?source_file=\"([^\"]+)\" source_line=(\d+)"
    )
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                src_of[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"
    by_src = defaultdict(float)
    for name, dur in totals.items():
        if name.startswith("jit_") or counts[name] == 0:
            continue
        by_src[src_of.get(name, f"<unattributed> {name[:40]}")] += dur
    print("\n--- by source line (needs a fresh dump_hlo.py run) ---")
    for src, dur in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur/1e3/n_steps:9.2f} ms/step  {src}")


if __name__ == "__main__":
    main()
