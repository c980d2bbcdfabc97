"""Loss terms vs hand-computed reference formulas
(`model/nerf_training.py:306-346`, `model/nerf.py:469-478`)."""
import numpy as np
import jax.numpy as jnp

from fgs_nerf_tpu.models import sdf_voxel as M
from fgs_nerf_tpu.train.losses import LossWeights, compute_losses
from tests.test_model_forward import tiny_cfg


def fake_render(rng, n=6, k=4):
    return {
        "rgb_marched": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "sigmoid_rgb": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "alphainv_cum": jnp.asarray(rng.uniform(0.01, 0.99, size=(n,)).astype(np.float32)),
        "sel_rgb": jnp.asarray(rng.uniform(size=(n, k, 3)).astype(np.float32)),
        "sel_weights": jnp.asarray(rng.uniform(0, 0.4, size=(n, k)).astype(np.float32)),
        "weights": jnp.asarray(rng.uniform(0, 0.4, size=(n, k)).astype(np.float32)),
        "normal": jnp.asarray(rng.normal(size=(n, k, 3)).astype(np.float32)),
    }


def test_loss_terms_match_formulas(rng):
    cfg, _ = tiny_cfg("coarse")
    n, k = 6, 4
    render = fake_render(rng, n, k)
    target = rng.uniform(size=(n, 3)).astype(np.float32)
    viewdirs = rng.normal(size=(n, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    w = LossWeights(
        weight_main=1.0, weight_rgbper=0.2, weight_entropy_last=1e-3,
        weight_orientation=1e-4, sigmoid_rgb_loss=0.1, weight_tv_density=0.0,
    )
    params = M.init_params(__import__("jax").random.PRNGKey(0), cfg)
    losses = compute_losses(
        render, jnp.asarray(target), jnp.asarray(viewdirs), params, cfg, w,
        sdf_tv=0.0, smooth_grad_tv=0.0, tv_on=0.0, nonempty_mask=None,
    )
    r = {k_: np.asarray(v) for k_, v in render.items()}

    mse = np.mean((r["rgb_marched"] - target) ** 2)
    np.testing.assert_allclose(float(losses["mse"]), mse, rtol=1e-6)

    rgbper = (
        ((r["sel_rgb"] - target[:, None, :]) ** 2).sum(-1) * r["sel_weights"]
    ).sum() / n
    np.testing.assert_allclose(float(losses["rgbper"]), rgbper, rtol=1e-5)

    p = np.clip(r["alphainv_cum"], 1e-6, 1 - 1e-6)
    ent = -np.mean(p * np.log(p) + (1 - p) * np.log(1 - p))
    np.testing.assert_allclose(float(losses["entropy_last"]), ent, rtol=1e-5)

    ndv = (r["normal"] * (-viewdirs[:, None, :])).sum(-1)
    ori = (r["weights"] * np.minimum(0.0, ndv) ** 2).sum()
    np.testing.assert_allclose(float(losses["orientation"]), ori, rtol=1e-5)

    sig = np.mean((r["sigmoid_rgb"] - target) ** 2)
    total = mse + 0.2 * rgbper + 1e-3 * ent + 1e-4 * ori + 0.1 * sig
    np.testing.assert_allclose(float(losses["loss"]), total, rtol=1e-5)


def test_tv_gate_zeroes_contribution(rng):
    cfg, _ = tiny_cfg("coarse")
    render = fake_render(rng)
    target = rng.uniform(size=(6, 3)).astype(np.float32)
    vd = rng.normal(size=(6, 3)).astype(np.float32)
    w = LossWeights(weight_main=1.0, weight_tv_density=0.01, ori_tv=True)
    params = M.init_params(__import__("jax").random.PRNGKey(1), cfg)
    off = compute_losses(render, jnp.asarray(target), jnp.asarray(vd), params,
                         cfg, w, sdf_tv=0.1, smooth_grad_tv=0.05, tv_on=0.0,
                         nonempty_mask=None)
    on = compute_losses(render, jnp.asarray(target), jnp.asarray(vd), params,
                        cfg, w, sdf_tv=0.1, smooth_grad_tv=0.05, tv_on=1.0,
                        nonempty_mask=None)
    assert float(on["loss"]) > float(off["loss"])
    np.testing.assert_allclose(float(off["loss"]), float(off["mse"]), rtol=1e-6)
