"""DVGO-style density voxel model — the optional ``--dvgo_init``
geometry-searching path (`model/dvgo.py:25-357`).

Same TPU design as the SDF model (fixed sample lattice, masked alpha,
scan): density grid + 3-channel color grid; post-activation alpha
``1 - exp(-softplus(d + act_shift) * interval)`` with
``act_shift = log(1/(1-alpha_init) - 1)`` (`model/dvgo.py:46-47,
225-227`); color = sigmoid(k0); normals from the density gradient
field.  Note the dvgo composite blends background with
``alphainv_last`` rather than ``1 - cum_weights``
(`model/dvgo.py:337`), a small quirk preserved here.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox, grid_resolution, max_samples_per_ray
from fgs_nerf_tpu.models.sdf_voxel import (
    _compact_valid,
    _pts_at_steps,
    _safe_norm,
    mask_cache_query,
)
from fgs_nerf_tpu.ops.interp import resize_trilinear, trilinear_sample
from fgs_nerf_tpu.ops.ray_sample import sample_along_rays
from fgs_nerf_tpu.ops.stencils import sdf_gradient
from fgs_nerf_tpu.ops.transmittance import alpha_to_weights


@dataclasses.dataclass(frozen=True)
class DensityModelConfig:
    num_voxels: int
    num_voxels_base: int
    world_size: Tuple[int, int, int]
    voxel_size: float
    voxel_size_base: float
    s_max: int
    stepsize: float
    alpha_init: float = 0.01
    fast_color_thres: float = 0.0
    mask_cache_thres: float = 1e-3
    sample_k: int = 0

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def step_dist(self) -> float:
        return self.stepsize * self.voxel_size

    @property
    def act_shift(self) -> float:
        """`model/dvgo.py:47`."""
        return float(np.log(1.0 / (1.0 - self.alpha_init) - 1.0))


def make_density_config(
    xyz_min, xyz_max, num_voxels, num_voxels_base, stepsize, **kw
) -> DensityModelConfig:
    world_size, voxel_size = grid_resolution(xyz_min, xyz_max, num_voxels)
    _, voxel_size_base = grid_resolution(xyz_min, xyz_max, num_voxels_base)
    return DensityModelConfig(
        num_voxels=num_voxels, num_voxels_base=num_voxels_base,
        world_size=world_size, voxel_size=voxel_size,
        voxel_size_base=voxel_size_base,
        s_max=max_samples_per_ray(world_size, stepsize), stepsize=stepsize, **kw,
    )


def init_params(cfg: DensityModelConfig) -> Dict[str, Any]:
    """Ball-shaped density init `r - 1` (`model/dvgo.py:59-62`),
    zero color grid."""
    axes = [np.linspace(-1.0, 1.0, n) for n in cfg.world_size]
    x, y, z = np.meshgrid(*axes, indexing="ij")
    r = np.sqrt(x**2 + y**2 + z**2) - 1.0
    return {
        "density": jnp.asarray(r[..., None], jnp.float32),
        "k0": jnp.zeros((*cfg.world_size, 3), jnp.float32),
    }


def activate_density(density, interval, act_shift):
    """`model/dvgo.py:225-227`."""
    return 1.0 - jnp.exp(-jax.nn.softplus(density + act_shift) * interval)


def forward(
    params: Dict[str, Any],
    buffers: Dict[str, Any],
    cfg: DensityModelConfig,
    box: SceneBox,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    near: float,
    bg: float,
) -> Dict[str, jnp.ndarray]:
    """`model/dvgo.py:284-357` on the fixed lattice."""
    del viewdirs  # view-independent color model
    rs = sample_along_rays(rays_o, rays_d, box, near, cfg.step_dist, cfg.s_max)
    pts, valid = rs.pts, rs.valid
    if "mask_cache" in buffers:
        valid = valid & mask_cache_query(buffers["mask_cache"], pts, cfg.mask_cache_thres)
    if 0 < cfg.sample_k < cfg.s_max:
        valid, steps, _ = _compact_valid(valid, cfg.sample_k)
        pts = _pts_at_steps(rays_o, rays_d, rs.t_min, steps, cfg.step_dist)

    interval = jnp.asarray(cfg.stepsize * cfg.voxel_size_ratio, jnp.float32)
    density = trilinear_sample(params["density"], pts, box)[..., 0]
    alpha = activate_density(density, interval, cfg.act_shift)

    live = valid
    if cfg.fast_color_thres > 0:
        live = live & (alpha > cfg.fast_color_thres)
    weights, alphainv_last = alpha_to_weights(alpha, live)
    if cfg.fast_color_thres > 0:
        live = live & (weights > cfg.fast_color_thres)
    w_eff = weights * live

    k0 = trilinear_sample(params["k0"], pts, box)
    rgb = jax.nn.sigmoid(k0)
    grad_field = sdf_gradient(params["density"], cfg.voxel_size, "interpolate")
    gradient = trilinear_sample(grad_field, pts, box)
    normals = gradient / (_safe_norm(gradient) + 1e-7)

    rgb_marched = jnp.sum(w_eff[..., None] * rgb, axis=1) + alphainv_last[..., None] * bg
    normal_marched = jnp.sum(w_eff[..., None] * normals, axis=1)
    return {
        "rgb_marched": rgb_marched,
        "alphainv_cum": alphainv_last,
        "weights": w_eff,
        "sel_rgb": rgb,
        "sel_weights": w_eff,
        "normal_marched": normal_marched,
        "live": live,
        "valid": valid,
    }


def scale_volume_grid(
    params: Dict[str, Any], new_cfg: DensityModelConfig
) -> Dict[str, Any]:
    """Trilinear upsample of density + k0 at a pg_scale rung
    (`model/dvgo.py` ``scale_volume_grid`` via `model/grid.py:101-106`)."""
    params = dict(params)
    params["density"] = resize_trilinear(params["density"], new_cfg.world_size)
    params["k0"] = resize_trilinear(params["k0"], new_cfg.world_size)
    return params


def build_alpha_grid(params, cfg: DensityModelConfig) -> jnp.ndarray:
    """Checkpoint-time occupancy for the dvgo-init MaskGrid handoff
    (`model/grid.py:259-262` uses a saved ``alpha.grid``): voxel-wise
    activated alpha of the density grid."""
    return activate_density(
        params["density"], cfg.stepsize * cfg.voxel_size_ratio, cfg.act_shift
    )


def build_sdf_mask(
    params, cfg: DensityModelConfig, thres: float = 1e-3
) -> jnp.ndarray:
    """Occupancy summary in the SDF checkpoint schema.

    The reference's ``--dvgo_init`` handoff is latent/broken as shipped:
    ``geometry_searching_last.tar`` written by the dvgo driver
    (`model/coarse_geometry_searching.py:370-380`) carries no
    ``sdf_mask.grid``, but the downstream coarse stage's MaskCache and
    bbox shrink read exactly that key (`model/nerf.py:1192-1200`,
    `model/nerf_training.py:40-58`) — running the shipped path would
    KeyError.  The dvgo model's *intended* occupancy semantics are its
    own MaskGrid construction (`model/grid.py:259-262`): activated
    alpha >= thres.  We export that test in the sdf_mask schema
    (occupied -> 1e-3, matching ``set_sdf_mask``'s scaling at
    `model/nerf.py:181-186`) so the next stage consumes a dvgo
    checkpoint identically to an SDF one.
    """
    alpha = build_alpha_grid(params, cfg)
    return jnp.where(alpha >= thres, 1e-3, 0.0).astype(jnp.float32)
