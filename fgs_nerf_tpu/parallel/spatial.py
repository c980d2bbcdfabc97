"""Spatial grid sharding with halo exchange (the ``sp`` mesh axis).

The reference is single-GPU and keeps every grid resident on one device
(SURVEY.md §2.9); at the fine stage a 256^3 x (1 + 3 + 12)-channel fp32
grid pair plus Adam moments is ~3 GB, which caps resolution on a single
chip.  This module shards voxel grids along their **first spatial axis
(x)** over the ``sp`` mesh axis and provides the three primitives the
render step needs on a slab:

* :func:`halo_exchange` — pad a slab with its neighbors' boundary
  planes via ``jax.lax.ppermute`` (zeros past the global edges, which
  matches both the zero-padding gather semantics and the stencils'
  edge behavior when composed as below).
* :func:`sharded_trilinear_sample` — trilinear gather against the
  sharded grid.  Each device evaluates the samples whose **base cell**
  (floor of the x index) it owns against its 1-plane-right-extended
  slab and contributes zero elsewhere; a ``psum`` over ``sp`` completes
  every sample.  The backward runs the deterministic sort-scatter of
  ``ops.scatter`` per slab and the ppermute transpose routes boundary-
  plane gradients to their owner — no densified all-gather anywhere.
* :func:`sharded_stencil` — run any dense stencil (gaussian smoothing,
  SDF gradients, TV smoothing) on a halo-extended slab and slice out
  the core; exact for ops whose receptive field <= halo.

Edge semantics: the dense stencils in ``ops.stencils`` use *replicate*
padding at the global boundary.  ``halo_exchange`` therefore fills
edge halos by replicating the slab's own boundary plane when
``edge='replicate'`` (stencil use) and with zeros when ``edge='zero'``
(gather use, where out-of-grid corners must read 0).

Cost model: the forward gather is row-bound on the *sample* count, so
sp-sharding does not cut gather time (every device scans the full
sample stream); what it buys is grid **memory** scaling — resolution
per chip — plus stencil/TV/Adam FLOPs and the scatter backward, all of
which are proportional to slab volume.  Ray throughput scales on the
``dp`` axis; the two compose as a 2-D ``(dp, sp)`` mesh.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(
    slab: jnp.ndarray, halo: int, axis_name: str, edge: str = "zero"
) -> jnp.ndarray:
    """Extend a [Xl, ...] slab to [Xl + 2*halo, ...] with neighbor planes.

    Left halo comes from the left neighbor's last ``halo`` planes, right
    halo from the right neighbor's first ``halo`` planes.  The first
    (last) device has no left (right) neighbor: its halo is zeros or a
    replication of its own boundary plane depending on ``edge``.
    """
    if halo <= 0:
        return slab
    n = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    right_edge = slab[-halo:]
    left_edge = slab[:halo]
    # ppermute: send my right edge to my right neighbor (their left halo)
    left_halo = jax.lax.ppermute(
        right_edge, axis_name, [(d, d + 1) for d in range(n - 1)]
    )
    # send my left edge to my left neighbor (their right halo)
    right_halo = jax.lax.ppermute(
        left_edge, axis_name, [(d + 1, d) for d in range(n - 1)]
    )
    if edge == "replicate":
        # devices at the global boundary received zeros; replicate own plane
        left_halo = jnp.where(i == 0, jnp.concatenate([slab[:1]] * halo, 0), left_halo)
        right_halo = jnp.where(
            i == n - 1, jnp.concatenate([slab[-1:]] * halo, 0), right_halo
        )
    return jnp.concatenate([left_halo, slab, right_halo], axis=0)


def sharded_stencil(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    slab: jnp.ndarray,
    halo: int,
    axis_name: str,
    edge: str = "replicate",
) -> jnp.ndarray:
    """Apply a same-shape dense stencil ``fn`` to a sharded grid.

    Exact when ``fn``'s receptive field along x is <= ``halo`` and its
    own boundary handling matches ``edge`` (the ``ops.stencils`` convs
    replicate-pad; the central-difference ``sdf_gradient`` zero-borders,
    use ``edge='zero'`` + halo 1 for it — interior planes never read
    the pad, and border planes are fixed by the caller's mask).
    """
    ext = halo_exchange(slab, halo, axis_name, edge=edge)
    out = fn(ext)
    return jax.lax.slice_in_dim(out, halo, halo + slab.shape[0], axis=0)


def sharded_sdf_gradient(
    slab: jnp.ndarray, voxel_size: float, axis_name: str, mode: str = "interpolate"
) -> jnp.ndarray:
    """`ops.stencils.sdf_gradient` over an x-sharded slab.

    The dense op zeroes the first/last plane along each axis; with a
    1-plane halo the interior x-planes of every slab see true central
    differences, and the global first/last planes must be re-zeroed
    (the dense op zeroes *slab* borders, which are interior planes of
    the global grid for middle shards — those are fixed by the halo;
    conversely the global border planes sit at halo offset and get a
    spurious value from the zero halo, re-zeroed here).
    """
    from fgs_nerf_tpu.ops.stencils import sdf_gradient

    if mode == "grad_conv":
        return sharded_stencil(
            lambda g: sdf_gradient(g, voxel_size, mode), slab, 1, axis_name,
            edge="replicate",
        )
    n = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    out = sharded_stencil(
        lambda g: sdf_gradient(g, voxel_size, mode), slab, 1, axis_name,
        edge="zero",
    )
    xl = slab.shape[0]
    # zero gx on the global border planes (dense op zeroes them; the
    # halo version computed a difference against the zero halo instead)
    plane_ids = jnp.arange(xl)
    is_first = (i == 0) & (plane_ids == 0)
    if mode == "interpolate":
        is_last = (i == n - 1) & (plane_ids == xl - 1)
    else:  # raw: only the last plane is zeroed
        is_first = jnp.zeros_like(is_first)
        is_last = (i == n - 1) & (plane_ids == xl - 1)
    border = (is_first | is_last)[:, None, None]
    gx = jnp.where(border, 0.0, out[..., 0])
    return jnp.concatenate([gx[..., None], out[..., 1:]], axis=-1)


def _owned_range(xl: int, axis_name: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    i = jax.lax.axis_index(axis_name)
    x0 = i * xl
    return x0, x0 + xl


def sharded_trilinear_sample(
    slab: jnp.ndarray,  # [Xl, Y, Z, C], x-shard of the global grid
    idx: jnp.ndarray,  # [..., 3] fractional GLOBAL index coords
    global_x: int,
    axis_name: str,
) -> jnp.ndarray:
    """Trilinear gather against an x-sharded grid (zero padding).

    Ownership: the device whose slab contains ``clip(floor(ix), 0, X-1)``
    evaluates the sample; every other device contributes zero and a
    ``psum`` over ``axis_name`` completes the value.  A 1-plane right
    halo makes all globally-valid corners of owned base cells local:
    base x = x0+Xl-1 needs corner x0+Xl (the right neighbor's first
    plane); the last shard's halo is zeros, which a base at the global
    last plane reads with weight*0 = 0 — exactly the zero-padding
    semantics.  Bases at ix in [-1, 0) clip to 0 (owner: shard 0) whose
    x-1 corner is globally invalid and masked by the local gather.

    Autodiff: the local gather is ``ops.interp.trilinear_sample_index``
    (sort-scatter backward per slab); the halo's cotangent flows back
    through the ppermute transpose to the neighbor that owns the plane,
    and the psum transposes to an identity on the (replicated) output
    cotangent.  Deterministic end to end.
    """
    from fgs_nerf_tpu.ops.interp import trilinear_sample_index

    xl = slab.shape[0]
    x0, x1 = _owned_range(xl, axis_name)
    ext = halo_exchange(slab, 1, axis_name, edge="zero")
    # drop the left halo: ownership is by base cell, so the left plane
    # is never a corner of an owned base (base >= x0, corners >= x0)
    ext = jax.lax.slice_in_dim(ext, 1, 1 + xl + 1, axis=0)  # [Xl+1, Y, Z, C]

    ix_base = jnp.clip(jnp.floor(idx[..., 0]).astype(jnp.int32), 0, global_x - 1)
    own = (ix_base >= x0) & (ix_base < x1)
    local_idx = jnp.concatenate(
        [(idx[..., :1] - x0.astype(idx.dtype)), idx[..., 1:]], axis=-1
    )
    # clamp non-owned x coords into the slab so their (masked) gathers
    # stay in range; their contribution is zeroed below
    safe_x = jnp.clip(local_idx[..., :1], 0.0, float(xl) - 1e-3)
    local_idx = jnp.concatenate(
        [jnp.where(own[..., None], local_idx[..., :1], safe_x), local_idx[..., 1:]],
        axis=-1,
    )
    vals = trilinear_sample_index(ext, local_idx)
    vals = vals * own[..., None].astype(vals.dtype)
    return jax.lax.psum(vals, axis_name)


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [X, Y, Z, C] grids: x over ``sp``, rest replicated."""
    return NamedSharding(mesh, P("sp"))


def pad_to_multiple(grid, n_shards: int):
    """Pad the x axis so it divides the shard count (slabs must be equal).

    Returns (padded, orig_x).  Padding lives past the global extent and
    is never addressed by in-range samples; stencils see it as extra
    zero/replicate planes past the border, whose influence is confined
    to the pad region itself.
    """
    x = grid.shape[0]
    pad = (-x) % n_shards
    if pad == 0:
        return grid, x
    cfgpad = [(0, pad)] + [(0, 0)] * (grid.ndim - 1)
    return jnp.pad(grid, cfgpad), x
