"""Convergence floor (VERDICT round-1 item 5): 150 geometry-searching
iterations on the procedural glossy sphere must exceed a recorded PSNR
floor with zero capacity overflow.  The recorded reference run
(2026-08, virtual CPU mesh) reached last-30-mean 28.7 dB; the floor is
set 5 dB under that so only a real optimization/renderer regression —
not fp noise — turns it red."""
import tempfile

import numpy as np

from fgs_nerf_tpu.config.base import Cfg, deep_update, load_config
from fgs_nerf_tpu.data.synthetic import make_synthetic_dataset
from fgs_nerf_tpu.train.trainer import train_stage

PSNR_FLOOR = 23.0  # recorded: 28.66 last-30 mean
# Soft corridor (VERDICT r4 item 10): drift below the recorded level is
# REPORTED (warning) long before it eats the 5 dB hard margin, without
# making the suite flaky on fp noise.
PSNR_EXPECTED = 27.5

TINY = dict(
    geometry_searching=dict(
        N_iters=150, N_rand=512, pg_scale=[40], reset_iter=[40],
        inc_steps=20, save_iter=10**9, decay_step_module={},
    ),
    geometry_searching_model=dict(
        num_voxels=14**3, num_voxels_base=14**3, shade_k=48, sample_k=96
    ),
)


def test_geometry_search_converges_above_floor():
    cfg = Cfg(deep_update(dict(load_config("shiny_blender")), TINY))
    data = make_synthetic_dataset(n_views=8, h=48, w=48, n_test=1)
    res = train_stage(
        cfg, "geometry_searching", data,
        np.array([-1.0, -1.0, -1.0], np.float32),
        np.array([1.0, 1.0, 1.0], np.float32),
        tempfile.mkdtemp(), i_print=50,
    )
    h = np.asarray(res.psnr_history)
    mean30 = h[-30:].mean()
    assert mean30 >= PSNR_FLOOR, mean30
    if mean30 < PSNR_EXPECTED:
        import warnings

        warnings.warn(
            f"convergence drift: last-30 PSNR {mean30:.2f} dB is below the "
            f"recorded {PSNR_EXPECTED} dB soft corridor (hard floor "
            f"{PSNR_FLOOR} dB still holds) — investigate before the margin "
            "erodes",
            stacklevel=1,
        )
    # the exactness claim of the top-K compaction holds only at zero
    # overflow — these capacities must never drop samples on this scene
    assert res.last_metrics["overflow_frac"] == 0.0


def test_capacity_clamped_to_lattice_depth():
    """shade_k/sample_k above s_max must clamp (top_k rejects k > axis)."""
    from fgs_nerf_tpu.models import sdf_voxel as M

    cfg = M.make_model_config(
        stage="geometry_searching",
        xyz_min=np.array([-1.0] * 3, np.float32),
        xyz_max=np.array([1.0] * 3, np.float32),
        num_voxels=14**3, num_voxels_base=14**3, stepsize=0.5,
        shade_k=10_000, sample_k=10_000,
    )
    assert cfg.shade_k == cfg.s_max
    assert cfg.sample_k == cfg.s_max
