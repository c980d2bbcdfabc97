"""Field representations: dense voxel grids and the TensoRF
vector-matrix decomposition.

The dense grid in this framework is simply a channel-last jnp array
(sampled via ``ops.interp``); :class:`TensoRFGrid` provides the
VM-decomposed alternative of the reference (`model/grid.py:136-247`):
three planes + three vectors (+ a feature basis for C > 1), queried
with bilinear samples and combined as xy*z + xz*y + yz*x.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.ops.interp import _corner_gather  # reuse corner math


def bilinear_sample(plane: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """plane [A, B, C]; uv [..., 2] fractional index coords
    (align_corners, zero padding) -> [..., C]."""
    sizes = jnp.asarray(plane.shape[:2], jnp.int32)
    flat = plane.reshape(-1, plane.shape[-1])
    i0 = jnp.floor(uv).astype(jnp.int32)
    f = uv - i0.astype(uv.dtype)
    out = None
    for off in ((0, 0), (0, 1), (1, 0), (1, 1)):
        off_arr = jnp.asarray(off, jnp.int32)
        ci = i0 + off_arr
        inb = jnp.all((ci >= 0) & (ci < sizes), axis=-1)
        cc = jnp.clip(ci, 0, sizes - 1)
        lin = cc[..., 0] * sizes[1] + cc[..., 1]
        v = jnp.take(flat, lin, axis=0) * inb[..., None].astype(flat.dtype)
        w = jnp.prod(jnp.where(jnp.asarray(off, bool), f, 1.0 - f), axis=-1)
        term = w[..., None] * v
        out = term if out is None else out + term
    return out


def init_tensorf_params(
    key, channels: int, world_size, n_comp: int, n_comp_xy: int = None
) -> Dict[str, jnp.ndarray]:
    """`model/grid.py:137-155`: planes/vectors ~ N(0, 0.1); feature
    basis kaiming-uniform for multi-channel grids."""
    n_comp_xy = n_comp_xy or n_comp
    x, y, z = world_size
    ks = jax.random.split(key, 7)
    p = {
        "xy_plane": 0.1 * jax.random.normal(ks[0], (x, y, n_comp_xy)),
        "xz_plane": 0.1 * jax.random.normal(ks[1], (x, z, n_comp)),
        "yz_plane": 0.1 * jax.random.normal(ks[2], (y, z, n_comp)),
        "x_vec": 0.1 * jax.random.normal(ks[3], (x, n_comp)),
        "y_vec": 0.1 * jax.random.normal(ks[4], (y, n_comp)),
        "z_vec": 0.1 * jax.random.normal(ks[5], (z, n_comp_xy)),
    }
    if channels > 1:
        r_total = 2 * n_comp + n_comp_xy
        bound = jnp.sqrt(6.0 / r_total) / jnp.sqrt(6.0)  # kaiming a=sqrt(5)
        p["f_vec"] = jax.random.uniform(
            ks[6], (r_total, channels), minval=-bound, maxval=bound
        )
    return {k: v.astype(jnp.float32) for k, v in p.items()}


def tensorf_sample(
    params: Dict[str, jnp.ndarray], xyz: jnp.ndarray, box: SceneBox,
    channels: int,
) -> jnp.ndarray:
    """VM-decomposed query (`model/grid.py:157-175, 220-247`)."""
    u = box.normalize(xyz)
    x, y = params["xy_plane"].shape[:2]
    z = params["z_vec"].shape[0]
    ux = u[..., 0] * (x - 1)
    uy = u[..., 1] * (y - 1)
    uz = u[..., 2] * (z - 1)

    xy = bilinear_sample(params["xy_plane"], jnp.stack([ux, uy], -1))
    xz = bilinear_sample(params["xz_plane"], jnp.stack([ux, uz], -1))
    yz = bilinear_sample(params["yz_plane"], jnp.stack([uy, uz], -1))
    xv = _line_sample(params["x_vec"], ux)
    yv = _line_sample(params["y_vec"], uy)
    zv = _line_sample(params["z_vec"], uz)

    feat = jnp.concatenate([xy * zv, xz * yv, yz * xv], axis=-1)
    if channels > 1:
        return feat @ params["f_vec"]
    return jnp.sum(feat, axis=-1)


def _line_sample(vec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """vec [N, R]; t fractional index -> [..., R] (linear, zero pad)."""
    n = vec.shape[0]
    i0 = jnp.floor(t).astype(jnp.int32)
    f = (t - i0.astype(t.dtype))[..., None]
    lo_in = (i0 >= 0) & (i0 < n)
    hi_in = (i0 + 1 >= 0) & (i0 + 1 < n)
    lo = jnp.take(vec, jnp.clip(i0, 0, n - 1), axis=0) * lo_in[..., None]
    hi = jnp.take(vec, jnp.clip(i0 + 1, 0, n - 1), axis=0) * hi_in[..., None]
    return lo * (1 - f) + hi * f


def tensorf_densify(params: Dict[str, jnp.ndarray], channels: int) -> jnp.ndarray:
    """Expand to a dense [X, Y, Z, C] grid (`model/grid.py:202-215`)."""
    xy, xz, yz = params["xy_plane"], params["xz_plane"], params["yz_plane"]
    xv, yv, zv = params["x_vec"], params["y_vec"], params["z_vec"]
    feat = jnp.concatenate(
        [
            jnp.einsum("xyr,zr->xyzr", xy, zv),
            jnp.einsum("xzr,yr->xyzr", xz, yv),
            jnp.einsum("yzr,xr->xyzr", yz, xv),
        ],
        axis=-1,
    )
    if channels > 1:
        return jnp.einsum("xyzr,rc->xyzc", feat, params["f_vec"])
    return jnp.sum(feat, axis=-1, keepdims=True)


def tensorf_scale(
    params: Dict[str, jnp.ndarray], new_world_size
) -> Dict[str, jnp.ndarray]:
    """Progressive upscaling of the factored grid: linear align-corners
    resize of each plane/vector to the new resolution
    (`model/grid.py:216-230` — F.interpolate on planes and lines; the
    feature basis is resolution-independent and passes through)."""
    from fgs_nerf_tpu.ops.interp import _resize_axis_linear

    x, y, z = (int(v) for v in new_world_size)
    out = dict(params)
    for name, (a, b) in {
        "xy_plane": (x, y), "xz_plane": (x, z), "yz_plane": (y, z),
    }.items():
        p = _resize_axis_linear(params[name], 0, a)
        out[name] = _resize_axis_linear(p, 1, b)
    for name, a in {"x_vec": x, "y_vec": y, "z_vec": z}.items():
        out[name] = _resize_axis_linear(params[name], 0, a)
    return out
