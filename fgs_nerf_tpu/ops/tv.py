"""Total-variation regularizers: loss-form TV and analytic
gradient-injection TV.

The reference has two TV paths:

* ``ori_tv`` (geometry-searching + coarse stages): TV appears as a real
  loss term — python ``total_variation`` (`model/nerf.py:1212-1221`)
  wrapped by ``density_total_variation`` / ``k0_total_variation``
  (`model/nerf.py:430-459`).
* fine stage: TV gradients are injected *directly into the parameter
  gradient* by a CUDA kernel (``total_variation_add_grad``,
  `model/cuda/total_variation_kernel.cu:13-133`) without ever forming a
  loss.  ``tv_grad`` reproduces that kernel analytically so the update
  composes with sharded grids and psum.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fgs_nerf_tpu.ops.stencils import tv_smooth


def _fwd_diff(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """v[i] - v[i+1] along ``axis`` (length n-1)."""
    n = v.shape[axis]
    lead = jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)
    trail = jax.lax.slice_in_dim(v, 1, n, axis=axis)
    return lead - trail


def total_variation_loss(
    v: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean absolute difference over the three grid axes.

    Parity with ``total_variation`` (`model/nerf.py:1212-1221`):
    masked -> sum of pairwise-masked |diffs| / 3 / mask.sum() (where the
    reference repeats the mask over channels, so the denominator scales
    with C); unmasked -> sum |diffs| / 3 / v.sum().  ``v`` is
    [X, Y, Z, C]; ``mask`` is boolean [X, Y, Z, 1].
    """
    dx = jnp.abs(jnp.diff(v, axis=0))
    dy = jnp.abs(jnp.diff(v, axis=1))
    dz = jnp.abs(jnp.diff(v, axis=2))
    if mask is not None:
        m = mask.astype(v.dtype)
        num = (
            (dx * (m[1:] * m[:-1])).sum()
            + (dy * (m[:, 1:] * m[:, :-1])).sum()
            + (dz * (m[:, :, 1:] * m[:, :, :-1])).sum()
        )
        denom = m.sum() * v.shape[-1]
        return num / 3.0 / denom
    return (dx.sum() + dy.sum() + dz.sum()) / 3.0 / v.sum()


def density_tv_loss(
    sdf: jnp.ndarray,
    gradient: jnp.ndarray,
    voxel_size: float,
    sdf_tv: float,
    smooth_grad_tv: float,
    nonempty_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``density_total_variation`` (`model/nerf.py:430-447`).

    sdf: [X, Y, Z, 1]; gradient: [X, Y, Z, 3] (the whole-grid SDF
    gradient field).  The smooth-grad term penalizes deviation of the
    gradient from a detached 3x3x3-smoothed copy of itself; the masked
    variant averages over the 3 * mask.sum() selected elements.
    """
    tv = jnp.asarray(0.0, sdf.dtype)
    if sdf_tv > 0:
        tv = tv + total_variation_loss(sdf, nonempty_mask) / 2.0 / voxel_size * sdf_tv
    if smooth_grad_tv > 0:
        smoothed = jax.lax.stop_gradient(tv_smooth(gradient))
        err = (smoothed - gradient) ** 2
        if nonempty_mask is not None:
            m = nonempty_mask.astype(err.dtype)
            tv = tv + (err * m).sum() / (m.sum() * 3.0) * smooth_grad_tv
        else:
            tv = tv + err.mean() * smooth_grad_tv
    return tv


def k0_tv_loss(
    k0: jnp.ndarray, nonempty_mask: Optional[jnp.ndarray], k0_tv: float = 1.0
) -> jnp.ndarray:
    """``k0_total_variation`` (`model/nerf.py:449-459`)."""
    if k0_tv <= 0:
        return jnp.asarray(0.0, k0.dtype)
    return k0_tv * total_variation_loss(k0, nonempty_mask)


def tv_grad(
    grid: jnp.ndarray,
    grad: jnp.ndarray,
    wx: float,
    wy: float,
    wz: float,
    dense_mode: bool,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Analytic TV gradient, added to an existing parameter gradient.

    Parity with ``total_variation_add_grad`` /
    ``total_variation_add_grad_new``
    (`model/cuda/total_variation_kernel.cu:13-133`): each voxel gains
    ``w/6 * clamp(v_center - v_neighbor, -1, 1)`` per existing
    neighbor; in sparse mode (``dense_mode=False``) only voxels whose
    incoming grad is nonzero are updated; the masked variant multiplies
    every term by mask[center] * mask[neighbor].  (The reference's
    unmasked kernel reuses wz for the x/z axes — callers always pass
    wx == wy == wz, which we assume here.)

    grid/grad: [X, Y, Z, C].  Returns grad + tv_contribution.
    """
    ws = (wx / 6.0, wy / 6.0, wz / 6.0)
    m = None if mask is None else mask.astype(grid.dtype)

    tv = jnp.zeros_like(grid)
    for axis, w in enumerate(ws):
        fwd = jnp.clip(_fwd_diff(grid, axis), -1.0, 1.0)
        if m is not None:
            pair = _pair_mask(m, axis)
            fwd = fwd * pair
        pad_hi = [(0, 0)] * grid.ndim
        pad_hi[axis] = (0, 1)
        pad_lo = [(0, 0)] * grid.ndim
        pad_lo[axis] = (1, 0)
        # at i: clamp(v_i - v_{i+1}) from the high neighbor,
        #       clamp(v_i - v_{i-1}) = -fwd[i-1] from the low neighbor.
        tv = tv + w * (jnp.pad(fwd, pad_hi) + jnp.pad(-fwd, pad_lo))

    if not dense_mode:
        tv = jnp.where(grad != 0.0, tv, 0.0)
    return grad + tv


def _pair_mask(m: jnp.ndarray, axis: int) -> jnp.ndarray:
    n = m.shape[axis]
    lead = jax.lax.slice_in_dim(m, 0, n - 1, axis=axis)
    trail = jax.lax.slice_in_dim(m, 1, n, axis=axis)
    return lead * trail
