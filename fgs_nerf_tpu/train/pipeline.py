"""Three-stage training pipeline (`run.py:10-101`).

Stage boundaries communicate only through checkpoint artifacts, exactly
like the reference (SURVEY.md §3.1): geometry_searching_last -> mask
cache + bbox shrink; coarse_last -> fine SDF warm start.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

from fgs_nerf_tpu.train import bbox as bbox_lib
from fgs_nerf_tpu.train.trainer import StageResult, train_stage


def run_training(
    cfg,
    data_dict: Dict,
    out_dir: str,
    *,
    stages=("geometry_searching", "coarse", "fine"),
    mesh=None,
    logger: Optional[logging.Logger] = None,
    n_iters_override: Optional[Dict[str, int]] = None,
    i_print: int = 500,
    i_validate: int = 0,
    resume: bool = False,
    dvgo_init: bool = False,
) -> Dict[str, StageResult]:
    log = logger or logging.getLogger("fgs")
    os.makedirs(out_dir, exist_ok=True)
    n_iters_override = n_iters_override or {}
    results: Dict[str, StageResult] = {}

    geo_ckpt = os.path.join(out_dir, "geometry_searching_last.npz")
    coarse_ckpt = os.path.join(out_dir, "coarse_last.npz")

    if "geometry_searching" in stages:
        xyz_min, xyz_max = bbox_lib.compute_bbox_by_cam_frustrm(cfg, data_dict)
        log.info(f"frustum bbox: {xyz_min} .. {xyz_max}")
        if dvgo_init:
            # alternate geometry search with the DVGO density model
            # (`run.py:30-36`, `coarse_geometry_searching.py:105-380`)
            from fgs_nerf_tpu.train.density_trainer import train_density_stage

            results["geometry_searching"] = train_density_stage(
                cfg, data_dict, xyz_min, xyz_max, out_dir,
                mesh=mesh, logger=log, i_print=i_print,
                n_iters_override=n_iters_override.get("geometry_searching"),
            )
        else:
            results["geometry_searching"] = train_stage(
                cfg, "geometry_searching", data_dict, xyz_min, xyz_max, out_dir,
                mesh=mesh, logger=log, i_print=i_print, i_validate=i_validate,
                resume=resume,
                n_iters_override=n_iters_override.get("geometry_searching"),
            )

    if "coarse" in stages or "fine" in stages:
        xyz_min_t, xyz_max_t = bbox_lib.compute_bbox_by_coarse_geo(geo_ckpt)
        log.info(f"coarse-geo bbox: {xyz_min_t} .. {xyz_max_t}")

    if "coarse" in stages:
        results["coarse"] = train_stage(
            cfg, "coarse", data_dict, xyz_min_t, xyz_max_t, out_dir,
            mask_ckpt_path=geo_ckpt, mesh=mesh, logger=log,
            i_print=i_print, i_validate=i_validate, resume=resume,
            n_iters_override=n_iters_override.get("coarse"),
        )

    if "fine" in stages:
        results["fine"] = train_stage(
            cfg, "fine", data_dict, xyz_min_t, xyz_max_t, out_dir,
            coarse_ckpt_path=coarse_ckpt, mask_ckpt_path=geo_ckpt,
            mesh=mesh, logger=log, i_print=i_print, i_validate=i_validate,
            resume=resume,
            n_iters_override=n_iters_override.get("fine"),
        )

    return results
