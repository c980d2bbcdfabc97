"""Built-in scene configurations.

Schedule values mirror the reference configs because they are
load-bearing for reproducing results (SURVEY.md §5.6):
`config/shiny_blender.py`, `config/dtu.py` (diff: dataset_type,
inverse_y, reso_level, geometry voxel counts, coarse viewbase_pe),
`config/smart_car.py` (diff: shorter geometry search, no fine
sigmoid-rgb loss).  Structure here is ours: a shared base plus
per-dataset overrides.

TPU-specific additions (absent in the reference): per-stage
``shade_k`` (top-K shading capacity), ``sample_k`` (valid-sample
compaction capacity along the ray axis), and ``parallel`` (mesh axes /
sharding knobs).
"""
from fgs_nerf_tpu.config.base import deep_update

_BASE = dict(
    expname="",
    basedir="",
    reso_level=1,
    data=dict(
        datadir="",
        dataset_type="blender",
        inverse_y=False,
        flip_x=False,
        flip_y=False,
        testskip=1,
        white_bkgd=True,
        half_res=False,
        factor=1,
        ndc=False,
        spherify=False,
        llffhold=8,
        load_depths=False,
        movie_render_kwargs=dict(),
    ),
    parallel=dict(
        mesh_axes=("dp",),
        # grids replicated, ray batch sharded over 'dp' (SURVEY.md §2.9)
    ),
    # --dvgo_init alternate geometry search (`run.py:30-36` reads
    # cfg.dvgo / cfg.dvgo_model; the reference ships NO such blocks —
    # its --dvgo_init path crashes as shipped).  Values follow the DVGO
    # lineage's canonical coarse schedule and `model/dvgo.py` defaults.
    dvgo=dict(
        N_iters=5000,
        N_rand=8192,
        lrate_density=0.1,
        lrate_k0=0.1,
        lrate_decay=20,
        pervoxel_lr=True,
        pervoxel_lr_downrate=1,
        ray_sampler="random",
        weight_main=1.0,
        weight_entropy_last=0.01,
        weight_rgbper=0.1,
        scale_ratio=2,
        pg_scale=[],
        skip_zero_grad_fields=["density", "k0"],
    ),
    dvgo_model=dict(
        num_voxels=100**3,
        num_voxels_base=100**3,
        bbox_thres=1e-3,
        mask_cache_thres=1e-3,
        alpha_init=1e-6,
        fast_color_thres=1e-7,
        world_bound_scale=1.05,
        stepsize=0.5,
        sample_k=256,
    ),
    geometry_searching=dict(
        N_iters=12000,
        N_rand=8192,
        save_iter=20000,
        lrate_density=0.1,
        lrate_k0=0.1,
        lrate_sdf=0.1,
        lrate_refnet=1e-3,
        lrate_decay=20,
        pervoxel_lr=False,
        pervoxel_lr_downrate=1,
        ray_sampler="random",
        weight_main=1.0,
        weight_entropy_last=1e-3,
        weight_rgbper=0.2,
        weight_tv_density=0.01,
        weight_tv_k0=0.0,
        sigmoid_rgb_loss=0.1,
        weight_orientation=1e-4,
        tv_every=1,
        tv_from=0,
        tv_end=40000,
        voxel_inc=True,
        x_mid=0.5, y_mid=0.5, z_mid=0.5,
        x_init_ratio=0.6, y_init_ratio=0.6, z_init_ratio=0.6,
        inc_steps=1000,
        scale_ratio=2,
        pg_scale=[1001, 2501, 4001, 5501, 7001, 8501, 10001],
        reset_iter=[1001, 2501, 4001, 5501, 7001, 8501, 10001],
        tv_terms=dict(sdf_tv=0.1, grad_norm=0, grad_tv=0, smooth_grad_tv=0.05),
        tv_add_grad_new=True,
        ori_tv=True,
        tv_updates=dict(),
        tv_dense_before=40000,
        decay_step_module={10001: dict(sdf=0.1)},
        skip_zero_grad_fields=["density", "k0", "sdf"],
    ),
    geometry_searching_model=dict(
        num_voxels=120**3,
        num_voxels_base=120**3,
        nearest=False,
        bbox_thres=1e-3,
        mask_cache_thres=1e-3,
        alpha_init=0.01,
        fast_color_thres=1e-4,
        ref=True,
        maskout_near_cam_vox=True,
        world_bound_scale=1,
        stepsize=0.5,
        # channel-major sorted-stream engine: the measured coarse-
        # stage winner on v5e (73.3k vs 55.1k rays/s, round 4); falls
        # back to the lattice pipeline under spatial grid sharding
        engine="sorted",
        k0_dim=6,
        refnet_width=128,
        refnet_depth=3,
        posbase_pe=5,
        viewbase_pe=1,
        refbase_pe=3,
        smooth_ksize=5,
        smooth_sigma=0.8,
        s_ratio=50,
        s_start=0.2,
        shade_k=256,
        sample_k=0,
    ),
    coarse_train=dict(
        N_iters=15000,
        N_rand=8192,
        save_iter=20000,
        lrate_k0=0.1,
        lrate_sdf=0.1,
        lrate_refnet=1e-3,
        lrate_decay=20,
        pervoxel_lr=False,
        pervoxel_lr_downrate=1,
        ray_sampler="in_maskcache",
        weight_main=1.0,
        weight_entropy_last=1e-3,
        weight_rgbper=0.2,
        weight_tv_density=0.01,
        weight_tv_k0=0.0,
        sigmoid_rgb_loss=0.1,
        weight_orientation=1e-4,
        tv_every=1,
        tv_from=0,
        tv_end=40000,
        voxel_inc=False,
        scale_ratio=3,
        pg_scale=[1000, 2001, 3001, 4001, 5001, 8001],
        reset_iter=[],
        tv_terms=dict(sdf_tv=0.1, grad_norm=0, grad_tv=0, smooth_grad_tv=0.05),
        tv_add_grad_new=True,
        ori_tv=True,
        tv_updates={8001: dict(sdf_tv=0.1, smooth_grad_tv=0.2)},
        tv_dense_before=40000,
        decay_step_module={
            5001: dict(sdf=0.2), 8001: dict(sdf=0.1), 12001: dict(sdf=0.2)
        },
        skip_zero_grad_fields=["density", "k0", "sdf"],
    ),
    coarse_model=dict(
        num_voxels=1500000,
        num_voxels_base=1500000,
        nearest=False,
        bbox_thres=1e-3,
        mask_cache_thres=1e-3,
        alpha_init=0.01,
        fast_color_thres=1e-4,
        ref=True,
        use_viewdir=True,
        maskout_near_cam_vox=True,
        world_bound_scale=1.1,
        stepsize=0.5,
        # channel-major sorted-stream engine: the measured coarse-
        # stage winner on v5e (73.3k vs 55.1k rays/s, round 4); falls
        # back to the lattice pipeline under spatial grid sharding
        engine="sorted",
        k0_dim=12,
        rgbnet_width=192,
        rgbnet_depth=3,
        refnet_width=192,
        refnet_depth=3,
        posbase_pe=5,
        viewbase_pe=1,
        refbase_pe=5,
        smooth_ksize=5,
        smooth_sigma=0.8,
        s_ratio=50,
        s_start=0.2,
        shade_k=256,
        sample_k=288,
    ),
    fine_train=dict(
        N_iters=20000,
        N_rand=8192,
        save_iter=20000,
        lrate_k0=0.1,
        lrate_sdf=5e-3,
        lrate_rgbnet=1e-3,
        lrate_refnet=1e-3,
        lrate_decay=20,
        pervoxel_lr=False,
        pervoxel_lr_downrate=1,
        ray_sampler="in_maskcache",
        weight_main=1.0,
        weight_entropy_last=1e-3,
        weight_rgbper=0.0,
        weight_tv_density=0.01,
        weight_tv_k0=0.0,
        sigmoid_rgb_loss=0.02,
        weight_orientation=1e-4,
        tv_every=3,
        tv_from=0,
        tv_end=30000,
        voxel_inc=False,
        scale_ratio=4.096,
        pg_scale=[15000],
        reset_iter=[],
        tv_terms=dict(sdf_tv=0.1, grad_norm=0, grad_tv=0, smooth_grad_tv=0.05),
        tv_add_grad_new=True,
        tv_dense_before=20000,
        sdf_reduce=0.3,
        cosine_lr=True,
        cosine_lr_cfg=dict(warm_up_iters=0, const_warm_up=True, warm_up_min_ratio=1.0),
        decay_step_module={15000: dict(sdf=0.1)},
        skip_zero_grad_fields=["density", "k0", "k1"],
    ),
    fine_model=dict(
        num_voxels=256**3,
        num_voxels_base=256**3,
        # two-pass sorted fine engine (base field pass + exact
        # hierarchical taps as offset window serves); the lattice
        # pipeline remains the sp-sharded / eval-artifact path
        engine="sorted",
        nearest=False,
        bbox_thres=1e-3,
        mask_cache_thres=1e-3,
        alpha_init=0.01,
        fast_color_thres=1e-4,
        maskout_near_cam_vox=False,
        world_bound_scale=1.10,
        stepsize=0.5,
        ref=True,
        use_viewdir=True,
        refnet_width=256,
        refnet_depth=4,
        k0_dim=12,
        rgbnet_width=256,
        rgbnet_depth=4,
        center_sdf=True,
        posbase_pe=5,
        viewbase_pe=3,
        refbase_pe=8,
        s_ratio=50,
        s_start=0.05,
        grad_feat=(0.5, 1.0, 1.5, 2.0),
        sdf_feat=(0.5, 1.0, 1.5, 2.0),
        shade_k=128,
        sample_k=512,
    ),
)

SHINY_BLENDER = _BASE

DTU = deep_update(
    _BASE,
    dict(
        reso_level=2,
        data=dict(dataset_type="dtu", inverse_y=True),
        geometry_searching_model=dict(num_voxels=1024000, num_voxels_base=80**3),
        coarse_model=dict(viewbase_pe=3),
    ),
)

SMART_CAR = deep_update(
    _BASE,
    dict(
        geometry_searching=dict(
            N_iters=10000,
            pg_scale=[1001, 2501, 4001, 5501],
            reset_iter=[1001, 2501, 4001, 5501],
        ),
        fine_train=dict(sigmoid_rgb_loss=0.0),
    ),
)

# Tiny CPU-runnable end-to-end config on the procedural synthetic scene
# (the PR1 reference slice of BASELINE.json config #1): small grids,
# short schedules, same machinery.
QUICK_SYNTHETIC = deep_update(
    _BASE,
    dict(
        data=dict(dataset_type="synthetic"),
        geometry_searching=dict(
            N_iters=60, N_rand=1024, pg_scale=[20], reset_iter=[20],
            inc_steps=15, save_iter=10**9, decay_step_module={},
        ),
        geometry_searching_model=dict(
            num_voxels=24**3, num_voxels_base=24**3, shade_k=64, sample_k=0,
        ),
        coarse_train=dict(
            N_iters=40, N_rand=1024, pg_scale=[15], save_iter=10**9,
            decay_step_module={}, tv_updates={},
        ),
        coarse_model=dict(num_voxels=32**3, num_voxels_base=32**3, shade_k=64,
                          sample_k=96),
        fine_train=dict(
            N_iters=30, N_rand=1024, pg_scale=[], save_iter=10**9,
            decay_step_module={},
        ),
        fine_model=dict(num_voxels=40**3, num_voxels_base=40**3, shade_k=64,
                        sample_k=128),
    ),
)


# The REAL shiny-blender schedule (12k/15k/20k iters, geometry 120^3 ->
# fine 256^3, 8,192 rays/step — `config/shiny_blender.py:30,106,181`)
# pointed at the procedural glossy-sphere scene at a realistic capture
# resolution.  The closest achievable stand-in for a real-dataset
# quality run in an environment with no datasets mounted (VERDICT r4
# item 5): exercises every rung of the pg_scale ladders, the 256^3 fine
# stage, checkpoint handoffs and the full eval path at scale.
FULL_SYNTHETIC = deep_update(
    _BASE,
    dict(
        data=dict(
            dataset_type="synthetic", synthetic_views=40,
            synthetic_hw=256, synthetic_test=3,
        ),
    ),
)
