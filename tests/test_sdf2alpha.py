"""SDF->alpha conversion vs a torch golden of
``neus_alpha_from_sdf_scatter`` (`model/nerf.py:510-544`)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from fgs_nerf_tpu.ops.sdf2alpha import neus_alpha, s_val_schedule


def golden_alpha(dirs, sdf, gradients, dist, s_val):
    dirs = torch.from_numpy(dirs)
    sdf = torch.from_numpy(sdf).reshape(-1)
    gradients = torch.from_numpy(gradients).reshape(-1, 3)
    inv_s = 1.0 / s_val
    true_cos = (dirs * gradients).sum(-1, keepdim=True)
    iter_cos = -(F.relu(-true_cos * 0.5 + 0.5) * 0.0 + F.relu(-true_cos) * 1.0)
    sdf = sdf.unsqueeze(-1)
    est_next = sdf + iter_cos * dist * 0.5
    est_prev = sdf - iter_cos * dist * 0.5
    prev_cdf = torch.sigmoid(est_prev * inv_s)
    next_cdf = torch.sigmoid(est_next * inv_s)
    alpha = ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).clip(0.0, 1.0)
    return alpha.squeeze(-1).numpy()


def test_alpha_matches_reference(rng):
    n, s = 16, 20
    viewdirs = rng.normal(size=(n, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    sdf = rng.normal(size=(n, s)).astype(np.float32) * 0.3
    grads = rng.normal(size=(n, s, 3)).astype(np.float32)
    dist = 0.01
    s_val = 0.07
    ours = np.asarray(
        neus_alpha(
            jnp.asarray(viewdirs), jnp.asarray(sdf), jnp.asarray(grads),
            jnp.asarray(dist, jnp.float32), jnp.asarray(s_val, jnp.float32),
        )
    )
    dirs_flat = np.repeat(viewdirs[:, None, :], s, axis=1).reshape(-1, 3)
    gold = golden_alpha(dirs_flat, sdf.reshape(-1), grads.reshape(-1, 3), dist, s_val)
    np.testing.assert_allclose(ours.reshape(-1), gold, atol=2e-6)


def test_s_schedule():
    # s = s_ratio / (step + s_ratio/s_start - step_start) (`model/nerf.py:514`)
    s = float(s_val_schedule(0, s_ratio=50.0, s_start=0.2))
    assert abs(s - 0.2) < 1e-6
    s1 = float(s_val_schedule(1000, s_ratio=50.0, s_start=0.2))
    assert abs(s1 - 50.0 / (1000 + 250.0)) < 1e-7
    # monotonically decreasing sharpness parameter
    assert s1 < s
