"""LR/TV/inc schedule semantics vs reference formulas
(`model/nerf_training.py:389-456`, `200-214`)."""
import numpy as np

from fgs_nerf_tpu.train import schedules


BASE = dict(
    N_iters=100, lrate_decay=20, lrate_sdf=0.1, lrate_refnet=1e-3,
    tv_from=0, tv_end=50, tv_every=3,
)


def test_exponential_decay_per_step():
    lr = schedules.LrState(schedules.initial_lrs(BASE, {"sdf", "refnet"}))
    assert lr.lrs == {"sdf": 0.1, "refnet": 1e-3}
    f = 0.1 ** (1 / (20 * 1000))
    for step in range(1, 11):
        schedules.update_lrs(lr, step, BASE)
    np.testing.assert_allclose(lr.lrs["sdf"], 0.1 * f**10, rtol=1e-9)


def test_decay_step_module_event():
    cfg = dict(BASE, decay_step_module={5: dict(sdf=0.1)})
    lr = schedules.LrState(schedules.initial_lrs(cfg, {"sdf", "refnet"}))
    for step in range(1, 8):
        schedules.update_lrs(lr, step, cfg)
    # event keyed on global_step-1 == 5 -> applied during step 6
    f = 0.1 ** (1 / (20 * 1000))
    np.testing.assert_allclose(lr.lrs["sdf"], 0.1 * f**7 * 0.1, rtol=1e-9)
    np.testing.assert_allclose(lr.lrs["refnet"], 1e-3 * f**7, rtol=1e-9)


def test_cosine_lr_multiplicative():
    cfg = dict(BASE, cosine_lr=True,
               cosine_lr_cfg=dict(warm_up_iters=0, const_warm_up=True,
                                  warm_up_min_ratio=1.0))
    lr = schedules.LrState({"sdf": 0.1})
    for step in range(1, 51):
        schedules.update_lrs(lr, step, cfg)
    # product of ratio factors telescopes to cosine(step-1)/cosine(-1=warmup 1.0)
    expect = 0.1 * schedules.cosine_lr_func(49, 0, 1.0, 100, True, 0)
    np.testing.assert_allclose(lr.lrs["sdf"], expect, rtol=1e-6)


def test_tv_gate():
    cfg = dict(BASE)
    active = [s for s in range(1, 60) if schedules.tv_active(s, cfg)]
    assert active[0] == 3 and all(s % 3 == 0 for s in active)
    assert all(s < 50 for s in active)


def test_tv_updates_mutation():
    cfg = dict(BASE, tv_updates={10: dict(sdf_tv=0.5)})
    terms = dict(sdf_tv=0.1, smooth_grad_tv=0.05)
    changed = False
    for step in range(1, 13):
        changed |= schedules.apply_tv_updates(terms, step, cfg)
    assert changed and terms["sdf_tv"] == 0.5 and terms["smooth_grad_tv"] == 0.05


def test_inc_bounds_growth():
    cfg = dict(voxel_inc=True, inc_steps=10, x_mid=0.5, y_mid=0.5, z_mid=0.5,
               x_init_ratio=0.6, y_init_ratio=0.6, z_init_ratio=0.6)
    lo1, up1 = schedules.inc_bounds(1, cfg)
    lo10, up10 = schedules.inc_bounds(10, cfg)
    assert schedules.inc_bounds(11, cfg) is None
    # grows monotonically to the full unit cube
    assert all(a >= b for a, b in zip(lo1, lo10))
    np.testing.assert_allclose(lo10, [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(up10, [1, 1, 1], atol=1e-9)
    # init box matches the reference formula
    np.testing.assert_allclose(
        lo1[0], (0.5 - 0.6 * 0.5) - 0.1 * (0.5 - 0.6 * 0.5), rtol=1e-9
    )


def test_inc_disabled():
    assert schedules.inc_bounds(1, dict(voxel_inc=False)) is None
