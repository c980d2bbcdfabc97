"""NeuS-style SDF -> alpha conversion and the s-value schedule.

Parity with ``neus_alpha_from_sdf_scatter`` (`model/nerf.py:510-544`)
on the fixed [N, S] sample lattice: the section SDF is extrapolated a
half step along the ray using the (always non-positive) ``iter_cos``
with ``cos_anneal_ratio = 1``, and alpha is the clipped sigmoid-CDF
ratio with the reference's 1e-5 stabilizers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def s_val_schedule(
    global_step, s_ratio: float, s_start: float, step_start: int = 0
):
    """Scheduled sharpness (`model/nerf.py:513-514`):
    ``s = s_ratio / (step + s_ratio / s_start - step_start)``."""
    return s_ratio / (
        jnp.asarray(global_step, jnp.float32) + s_ratio / s_start - step_start
    )


def neus_alpha(
    viewdirs: jnp.ndarray,  # [N, 3] (unit view directions)
    sdf: jnp.ndarray,  # [N, S]
    gradients: jnp.ndarray,  # [N, S, 3] interpolated SDF gradient field
    dist: jnp.ndarray,  # [] world-space step distance
    s_val: jnp.ndarray,  # [] scheduled (or learned) sharpness
) -> jnp.ndarray:
    """Per-sample opacity from SDF mid-point estimates.

    ``iter_cos = -relu(-cos)`` (cos_anneal_ratio == 1,
    `model/nerf.py:525-528`); prev/next SDF extrapolate by
    ``+/- iter_cos * dist * 0.5``; ``alpha = clip((p + 1e-5)/(c + 1e-5),
    0, 1)`` with p = prev_cdf - next_cdf, c = prev_cdf
    (`model/nerf.py:539-543`).
    """
    true_cos = jnp.sum(viewdirs[:, None, :] * gradients, axis=-1)  # [N, S]
    return neus_alpha_from_cos(true_cos, sdf, dist, s_val)


def neus_alpha_from_cos(true_cos, sdf, dist, s_val):
    """Elementwise core of ``neus_alpha`` — shape-agnostic, shared by
    the [N, S] lattice path and the flat sorted-stream path."""
    inv_s = 1.0 / s_val
    iter_cos = -jnp.maximum(-true_cos, 0.0)  # always <= 0
    est_next = sdf + iter_cos * dist * 0.5
    est_prev = sdf - iter_cos * dist * 0.5
    prev_cdf = _sigmoid(est_prev * inv_s)
    next_cdf = _sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)


_sigmoid = jax.nn.sigmoid
