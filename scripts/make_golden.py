"""Regenerate the golden-render regression fixture.

Trains a small coarse-stage model briefly on the procedural synthetic
scene (fixed seeds), renders one held-out view, and commits BOTH the
parameters and the rendered image to ``tests/golden/golden_render.npz``.
The paired test (`tests/test_golden.py`) re-renders from the committed
parameters only — so it pins the *renderer*, independent of any
training/optimizer changes.  Re-run this script (on the CPU backend)
only when an intentional renderer-semantics change invalidates the
fixture, and eyeball the image before committing.

Usage: python scripts/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.data.synthetic import make_synthetic_dataset
from fgs_nerf_tpu.models import sdf_voxel as M
from fgs_nerf_tpu.optim.masked_adam import ParamOpts, init_state, adam_update
from fgs_nerf_tpu.train.losses import LossWeights
from fgs_nerf_tpu.train.trainer import make_train_step
from fgs_nerf_tpu.eval.render import make_render_fn, render_image

H = W = 48
N_ITERS = 60
CONV = dict(ndc=False, inverse_y=False, flip_x=False, flip_y=False)


def golden_cfg():
    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    return M.make_model_config(
        stage="coarse", xyz_min=xyz_min, xyz_max=xyz_max,
        num_voxels=20**3, num_voxels_base=20**3, stepsize=0.5, k0_dim=4,
        refnet_width=32, refnet_depth=3, posbase_pe=2, viewbase_pe=1,
        refbase_pe=2, smooth_ksize=5, smooth_sigma=0.8,
        s_ratio=50.0, s_start=0.2, fast_color_thres=1e-4,
        shade_k=48, sample_k=72,
    ), SceneBox.create(xyz_min, xyz_max)


def main():
    # Pin the CPU backend here (not at import): tests import this
    # module for its config constants, and a module-level
    # jax.config.update would silently not apply (or error) in a
    # process whose backend is already initialized (ADVICE r2).
    jax.config.update("jax_platforms", "cpu")
    cfg, box = golden_cfg()
    data = make_synthetic_dataset(n_views=6, h=H, w=W, n_test=1)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    loss_w = LossWeights(
        weight_main=1.0, weight_rgbper=0.02, weight_entropy_last=1e-3,
        weight_orientation=1e-4, sigmoid_rgb_loss=0.1,
        weight_tv_density=0.01, ori_tv=True,
    )
    opts = {n: ParamOpts(skip_zero_grad=n in ("k0", "sdf")) for n in params}
    step = make_train_step(
        cfg, box, loss_w, opts, near=float(data["near"]), bg=1.0, n_rand=512,
        sdf_tv=0.1, smooth_grad_tv=0.05, inject_tv=False, tv_dense=True,
        weight_tv_density=0.01, weight_tv_k0=0.0, use_nonempty_mask=False,
    )
    opt_state = init_state(params)
    lrs = {"sdf": jnp.asarray(0.1), "k0": jnp.asarray(0.1),
           "refnet": jnp.asarray(1e-3)}

    rng = np.random.default_rng(7)
    imgs = data["images"][data["i_train"]]
    from fgs_nerf_tpu.data.rays import get_rays_of_a_view

    rays = [
        get_rays_of_a_view(H, W, data["Ks"][i], data["poses"][i], **CONV)
        for i in data["i_train"]
    ]
    for it in range(N_ITERS):
        b = rng.integers(0, len(rays), 512)
        r = rng.integers(0, H, 512)
        c = rng.integers(0, W, 512)
        o = np.stack([np.asarray(rays[bi][0])[ri, ci] for bi, ri, ci in zip(b, r, c)])
        d = np.stack([np.asarray(rays[bi][1])[ri, ci] for bi, ri, ci in zip(b, r, c)])
        v = np.stack([np.asarray(rays[bi][2])[ri, ci] for bi, ri, ci in zip(b, r, c)])
        t = np.stack([imgs[bi, ri, ci] for bi, ri, ci in zip(b, r, c)])
        params, opt_state, metrics = step(
            params, opt_state, {},
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(v), jnp.asarray(t),
            jnp.asarray(0.2), lrs, jnp.asarray(1.0),
        )
    print("final loss", float(metrics["loss"]))

    rc = make_render_fn(cfg, box, near=float(data["near"]), bg=1.0)
    i_test = int(data["i_test"][0])
    out = render_image(
        rc, params, {}, H, W, data["Ks"][i_test], data["poses"][i_test],
        CONV, jnp.asarray(0.2), chunk=1024,
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "golden_render.npz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = {f"p_{k}": np.asarray(v) for k, v in params.items() if k != "refnet"}
    flat.update({f"refnet_{k}": np.asarray(v) for k, v in params["refnet"].items()})
    np.savez_compressed(
        path,
        rgb=np.asarray(out["rgb_marched"]),
        depth=np.asarray(out["depth"]),
        pose=data["poses"][i_test],
        k=data["Ks"][i_test],
        near=np.float32(data["near"]),
        **flat,
    )
    print("wrote", path, "psnr vs gt",
          -10 * np.log10(np.mean((np.asarray(out["rgb_marched"]) -
                                  data["images"][i_test]) ** 2)))


if __name__ == "__main__":
    main()
