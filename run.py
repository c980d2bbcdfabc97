"""CLI runner — same surface as the reference's `run.py:104-137`.

    python run.py --mode train --config shiny_blender \
        --dataset_path /data/shiny_blender/car --expname car \
        --geometry_searching 1 --coarse_training 1 --fine_training 1
    python run.py --mode eval --config shiny_blender --expname car ...
"""
import argparse
import logging
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def config_parser():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--config", type=str, default="shiny_blender",
                   help="built-in name (shiny_blender|dtu|smart_car) or a python file")
    p.add_argument("--expname", type=str, default="scene")
    p.add_argument("--dataset_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="./results")
    p.add_argument("--mode", type=str, default="train", help="train | eval")
    p.add_argument("--dataset_type", type=str, default="")
    p.add_argument("--dvgo_init", default=False, type=lambda s: s not in ("0", "False", "false"),
                   help="use the DVGO density model for the geometry-"
                        "searching stage (reference run.py:30-36)")
    p.add_argument("--geometry_searching", default=True, type=lambda s: s not in ("0", "False", "false"))
    p.add_argument("--coarse_training", default=True, type=lambda s: s not in ("0", "False", "false"))
    p.add_argument("--fine_training", default=True, type=lambda s: s not in ("0", "False", "false"))
    p.add_argument("--i_print", type=int, default=500)
    p.add_argument("--i_validate", type=int, default=100000)
    p.add_argument("--scene", type=int, default=0)
    p.add_argument("--only_mesh", action="store_true")
    p.add_argument("--mesh_resolution", type=int, default=1024)
    p.add_argument("--eval_ssim", default=True,
                   type=lambda s: s not in ("0", "False", "false"))
    p.add_argument("--eval_lpips", default=False,
                   type=lambda s: s not in ("0", "False", "false"))
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--resume", action="store_true",
                   help="resume each requested stage from its saved "
                        "mid-stage checkpoint (params, Adam moments, LR "
                        "state, pg rung) when one exists")
    p.add_argument("--render_only", action="store_true",
                   help="do not optimize; reload weights and render the "
                        "render_poses camera path (reference run.py:116)")
    p.add_argument("--mesh", type=str, default="auto",
                   help="device mesh: 'auto' (dp over all devices), 'none', "
                        "or explicit 'dp=N[,sp=M]'")
    return p


def main():
    args = config_parser().parse_args()
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
    from fgs_nerf_tpu.config.base import load_config
    from fgs_nerf_tpu.data.dataset import load_dataset
    from fgs_nerf_tpu.parallel.mesh import build_mesh, maybe_distributed_init

    maybe_distributed_init()
    cfg = load_config(args.config)
    if args.dataset_path:
        cfg["data"]["datadir"] = args.dataset_path
    if args.dataset_type:
        cfg["data"]["dataset_type"] = args.dataset_type
    cfg["expname"] = args.expname
    cfg["basedir"] = args.output_dir

    out_dir = os.path.join(args.output_dir, args.expname)
    os.makedirs(out_dir, exist_ok=True)
    ts = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(out_dir, f"{ts}_{args.mode}.log")),
        ],
    )
    log = logging.getLogger("fgs")

    data_dict = load_dataset(cfg)
    log.info(
        f"dataset: {cfg['data']['dataset_type']} views={len(data_dict['poses'])} "
        f"hw={data_dict['hwf'][:2]} near/far={data_dict['near']}/{data_dict['far']}"
    )

    if args.render_only:
        from fgs_nerf_tpu.eval.evaluator import render_pose_path

        ckpt_path = _find_checkpoint(out_dir)
        render_pose_path(ckpt_path, cfg, data_dict, out_dir, logger=log)
        return

    if args.mode == "train":
        from fgs_nerf_tpu.train.pipeline import run_training

        mesh = build_mesh(args.mesh, cfg.get("parallel"))
        if mesh is not None:
            log.info(
                f"device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
                f"over {mesh.devices.size} devices "
                f"({jax.process_count()} process(es))"
            )
        stages = []
        if args.geometry_searching:
            stages.append("geometry_searching")
        if args.coarse_training:
            stages.append("coarse")
        if args.fine_training:
            stages.append("fine")
        results = run_training(cfg, data_dict, out_dir, stages=tuple(stages),
                               mesh=mesh, dvgo_init=args.dvgo_init,
                               i_print=args.i_print, i_validate=args.i_validate,
                               resume=args.resume)
        # end-of-training eval render + mesh of the last stage
        last = results[stages[-1]]
        _evaluate(args, cfg, data_dict, out_dir, last.cfg_model, None, log,
                  mesh_resolution=512)
    elif args.mode == "eval":
        _evaluate(args, cfg, data_dict, out_dir, None, None, log,
                  mesh_resolution=args.mesh_resolution)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def _find_checkpoint(out_dir):
    for stage in ("fine", "coarse", "geometry_searching"):
        p = os.path.join(out_dir, f"{stage}_last.npz")
        if os.path.exists(p):
            return p
    raise SystemExit(
        f"no checkpoint found under {out_dir} — train first "
        "(expected fine_last.npz / coarse_last.npz / "
        "geometry_searching_last.npz)"
    )


def _evaluate(args, cfg, data_dict, out_dir, cfg_model, _unused, log,
              mesh_resolution=1024):
    from fgs_nerf_tpu.eval.evaluator import evaluate_checkpoint

    ckpt_path = _find_checkpoint(out_dir)
    evaluate_checkpoint(
        ckpt_path, cfg, data_dict, out_dir,
        eval_ssim=bool(args.eval_ssim), eval_lpips=bool(args.eval_lpips),
        mesh_resolution=mesh_resolution, only_mesh=args.only_mesh,
        scene=args.scene, logger=log,
    )


if __name__ == "__main__":
    main()
