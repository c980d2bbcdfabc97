"""Training losses (`model/nerf_training.py:306-346`).

All terms operate on the fixed-shape render dict produced by
``models.sdf_voxel.forward``; the ragged point stream of the reference
maps onto masked sums over the sample lattice / shading selection.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from fgs_nerf_tpu.ops.stencils import sdf_gradient
from fgs_nerf_tpu.ops.tv import density_tv_loss, k0_tv_loss


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Static loss configuration for one stage (config keys of
    `config/shiny_blender.py:41-47` etc.)."""

    weight_main: float = 1.0
    weight_rgbper: float = 0.0
    weight_entropy_last: float = 0.0
    weight_orientation: float = 0.0
    sigmoid_rgb_loss: float = 0.0
    weight_tv_density: float = 0.0
    weight_tv_k0: float = 0.0
    ori_tv: bool = False


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def compute_losses(
    render: Dict[str, jnp.ndarray],
    target: jnp.ndarray,  # [N, 3]
    viewdirs: jnp.ndarray,  # [N, 3]
    params: Dict[str, Any],
    cfg_model,  # SDFModelConfig
    w: LossWeights,
    sdf_tv: float,
    smooth_grad_tv: float,
    tv_on: bool,
    nonempty_mask: Optional[jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Returns dict with 'loss' plus individual terms for logging.

    ``sdf_tv``/``smooth_grad_tv`` come from the (mutable) ``tv_terms``
    schedule; ``tv_on`` encodes the tv_from/tv_end/tv_every gate
    (static per jitted variant is avoided by passing it as a traced
    bool masked multiply).
    """
    n_rays = target.shape[0]
    losses = {}
    main = mse(render["rgb_marched"], target)
    losses["mse"] = main
    loss = w.weight_main * main

    if w.weight_rgbper > 0:
        # per-point color supervision on the shaded selection
        # (`model/nerf_training.py:311-314`): sum_pts w * |rgb - target|^2 / N
        if "sel_rgb_ch" in render:
            # channel-major engine: rgb as three [N, S] planes (full
            # lanes) instead of a [N, S, 3] stack
            diff = sum(
                (ch - target[:, a:a + 1]) ** 2
                for a, ch in enumerate(render["sel_rgb_ch"])
            )
        else:
            diff = jnp.sum(
                (render["sel_rgb"] - target[:, None, :]) ** 2, axis=-1
            )
        rgbper = jnp.sum(diff * jax.lax.stop_gradient(render["sel_weights"])) / n_rays
        losses["rgbper"] = rgbper
        loss = loss + w.weight_rgbper * rgbper

    if w.weight_entropy_last > 0:
        pout = jnp.clip(render["alphainv_cum"], 1e-6, 1 - 1e-6)
        ent = -jnp.mean(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
        losses["entropy_last"] = ent
        loss = loss + w.weight_entropy_last * ent

    if w.weight_orientation > 0:
        # ref-NeRF orientation regularizer (`model/nerf.py:469-478`):
        # sum over points of w * min(0, n . -v)^2 (torch .mean of the
        # already-reduced scalar is the identity).  The sorted engine
        # precomputes n.(-v) per sample (it never materializes normals
        # in ray-major order).
        if "ndv" in render:
            ndv = render["ndv"]
        else:
            ndv = jnp.sum(render["normal"] * (-viewdirs[:, None, :]), axis=-1)
        ori = jnp.sum(
            jax.lax.stop_gradient(render["weights"]) * jnp.minimum(0.0, ndv) ** 2
        )
        losses["orientation"] = ori
        loss = loss + w.weight_orientation * ori

    if w.sigmoid_rgb_loss > 0:
        sig = mse(render["sigmoid_rgb"], target)
        losses["sigmoid_rgb"] = sig
        loss = loss + w.sigmoid_rgb_loss * sig

    # TV loss terms (`model/nerf_training.py:330-345`): the smooth-grad
    # term applies in every stage when weight_tv_density > 0; the
    # ori_tv branch adds the sdf TV (and optional k0 TV) loss.
    if w.weight_tv_density > 0:
        grad_field = sdf_gradient(params["sdf"], cfg_model.voxel_size, cfg_model.grad_mode)
        tv_gate = jnp.asarray(tv_on, jnp.float32)
        tv_sg = density_tv_loss(
            params["sdf"], grad_field, cfg_model.voxel_size,
            sdf_tv=0.0, smooth_grad_tv=smooth_grad_tv,
            nonempty_mask=nonempty_mask,
        )
        loss = loss + tv_gate * w.weight_tv_density * tv_sg
        losses["tv_smooth_grad"] = tv_sg
        if w.ori_tv:
            tv_sdf = density_tv_loss(
                params["sdf"], grad_field, cfg_model.voxel_size,
                sdf_tv=sdf_tv, smooth_grad_tv=0.0,
                nonempty_mask=nonempty_mask,
            )
            loss = loss + tv_gate * w.weight_tv_density * tv_sdf
            losses["tv_sdf"] = tv_sdf
            if w.weight_tv_k0 > 0:
                from fgs_nerf_tpu.models.sdf_voxel import k0_dense

                tv_k0 = k0_tv_loss(k0_dense(params, cfg_model), nonempty_mask)
                loss = loss + tv_gate * w.weight_tv_k0 * tv_k0
                losses["tv_k0"] = tv_k0

    losses["loss"] = loss
    return losses
