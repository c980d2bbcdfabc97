"""Mid-stage checkpoint resume restores params/optimizer/LR and the
progressive-scaling rung."""
import logging

import numpy as np

from fgs_nerf_tpu.config.base import Cfg, deep_update, load_config
from fgs_nerf_tpu.data.synthetic import make_synthetic_dataset
from fgs_nerf_tpu.train.bbox import compute_bbox_by_cam_frustrm
from fgs_nerf_tpu.train.trainer import train_stage

logging.basicConfig(level=logging.WARNING)


def test_resume_continues_from_saved_rung(tmp_path):
    cfg = Cfg(deep_update(dict(load_config("shiny_blender")), dict(
        geometry_searching=dict(
            N_iters=14, N_rand=128, pg_scale=[6], reset_iter=[],
            inc_steps=4, save_iter=10, decay_step_module={},
        ),
        geometry_searching_model=dict(num_voxels=14**3, num_voxels_base=14**3,
                                      shade_k=16),
    )))
    ds = make_synthetic_dataset(n_views=4, h=24, w=24, n_test=1)
    xyz_min, xyz_max = compute_bbox_by_cam_frustrm(cfg, ds)
    out = str(tmp_path)

    # run 10 steps (checkpoint saved at save_iter=10, after pg_scale@6)
    res1 = train_stage(cfg, "geometry_searching", ds, xyz_min, xyz_max, out,
                       n_iters_override=10)
    ws_after_pg = res1.cfg_model.world_size

    # resume to 14: must pick up the post-pg grid and not re-scale
    res2 = train_stage(cfg, "geometry_searching", ds, xyz_min, xyz_max, out,
                       n_iters_override=14, resume=True)
    assert res2.cfg_model.world_size == ws_after_pg
    assert res2.params["sdf"].shape[:3] == ws_after_pg
    assert np.isfinite(res2.psnr_history).all()
    assert len(res2.psnr_history) == 4  # steps 11..14 only
