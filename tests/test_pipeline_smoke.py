"""End-to-end smoke: the full three-stage pipeline on a tiny synthetic
scene (SURVEY.md §7.3 — the minimum end-to-end slice, CPU-runnable)."""
import logging

import numpy as np
import pytest

from fgs_nerf_tpu.config.base import Cfg, deep_update, load_config
from fgs_nerf_tpu.data.synthetic import make_synthetic_dataset
from fgs_nerf_tpu.train.pipeline import run_training

logging.basicConfig(level=logging.INFO)

TINY = dict(
    geometry_searching=dict(
        N_iters=25, N_rand=256, pg_scale=[6], reset_iter=[6], inc_steps=8,
        save_iter=10**9, decay_step_module={},
    ),
    geometry_searching_model=dict(num_voxels=16**3, num_voxels_base=16**3,
                                  shade_k=32),
    coarse_train=dict(
        N_iters=12, N_rand=256, pg_scale=[5], save_iter=10**9,
        decay_step_module={}, tv_updates={},
    ),
    coarse_model=dict(num_voxels=20**3, num_voxels_base=20**3, shade_k=32),
    fine_train=dict(
        N_iters=10, N_rand=256, pg_scale=[], save_iter=10**9,
        decay_step_module={},
    ),
    fine_model=dict(num_voxels=24**3, num_voxels_base=24**3, shade_k=32),
)


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = load_config("shiny_blender")
    return Cfg(deep_update(dict(cfg), TINY))


@pytest.fixture(scope="module")
def dataset():
    return make_synthetic_dataset(n_views=6, h=40, w=40, n_test=1)


def test_full_pipeline_runs(tiny_cfg, dataset, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    results = run_training(tiny_cfg, dataset, out)
    assert set(results) == {"geometry_searching", "coarse", "fine"}
    for stage, res in results.items():
        assert np.isfinite(res.psnr_history).all(), stage
        import os

        assert os.path.exists(res.ckpt_path), stage
    # geometry searching on a synthetic sphere should make progress
    geo = results["geometry_searching"].psnr_history
    assert np.mean(geo[-5:]) > np.mean(geo[:5]) - 1.0  # not diverging

    # checkpoint roundtrip + eval render of one view
    from fgs_nerf_tpu.eval.render import make_render_fn, render_viewpoints
    from fgs_nerf_tpu.train.checkpoint import load_checkpoint

    res = results["fine"]
    ckpt = load_checkpoint(res.ckpt_path)
    assert ckpt.sdf_mask is not None
    conv = dict(ndc=False, inverse_y=False, flip_x=False, flip_y=False)
    rc = make_render_fn(res.cfg_model, res.box, near=dataset["near"], bg=1.0)
    import jax

    params = jax.tree.map(np.asarray, res.params)
    stats = render_viewpoints(
        rc, params, {}, dataset["poses"][dataset["i_test"]],
        dataset["HW"][dataset["i_test"]], dataset["Ks"][dataset["i_test"]],
        conv, s_val=float(res.params["s_val"][0]),
        gt_imgs=dataset["images"][dataset["i_test"]],
        masks=dataset["masks"][dataset["i_test"]],
        eval_ssim=True,
    )
    assert np.isfinite(stats["psnr"]).all()
    assert stats["rgbs"][0].shape == (40, 40, 3)

    # --render_only path render over render_poses (reference run.py:116)
    from fgs_nerf_tpu.eval.evaluator import render_pose_path

    small = dict(dataset)
    small["render_poses"] = np.asarray(dataset["render_poses"])[:2]
    savedir = render_pose_path(res.ckpt_path, tiny_cfg, small, out)
    import os

    frames = [f for f in os.listdir(savedir) if f.startswith("render_")]
    assert len(frames) == len(small["render_poses"]) >= 1
