"""Sorted-stream field engine: the render pipeline's per-sample work
reorganized around ONE stable sort by packed-grid row.

Why: on TPU, any per-sample crossing between ray order and grid order
costs at least the XLA row-gather floor (~11.5 ns/row — BASELINE.md:
~27 ms per 2.36M-sample crossing at the coarse bench).  The classic
pipeline pays that floor twice per step (forward gather of ray-ordered
samples; backward permutation of cotangents into row order).  This
module instead keeps the WHOLE per-sample pipeline (field gather →
alpha → shading) in row-sorted order:

* the trilinear gather becomes a streaming window serve over the
  sorted stream (``ops.pallas.window_gather``), never touching rows
  individually;
* the grid gradient consumes the cotangents ALREADY in sorted order —
  the backward permutation disappears entirely
  (``ops.scatter._dense_accumulate`` directly);
* only the per-ray transmittance scan needs ray order, and the few
  scalar channels that feed it (alpha, rgb, n·v) cross domains via
  stable key-sorts at ~1.6 ms per f32 channel — 4-10x cheaper than
  row-gather crossings.

The sort keys live in the same padded ``(X+2)(Y+2)(Z+2)`` row space as
the deterministic scatter (`ops/scatter.py`), so forward serve and
backward accumulate share one sorted key array.

Reference role: pass 1+2 of the CUDA render
(`/root/reference/model/nerf.py:943-1075` driven by the ragged sampler
`model/cuda/render_utils_kernel.cu:196-242`); the reorganization itself
has no reference counterpart — it is the TPU-native answer to
``F.grid_sample``'s latency-hiding memory system.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fgs_nerf_tpu.ops.scatter import _dense_accumulate, _use_pallas_combine


def padded_rows(grid_shape3) -> int:
    x, y, z = grid_shape3
    return (x + 2) * (y + 2) * (z + 2)


def pack_rows_fracs(idx: jnp.ndarray, grid_shape3):
    """Row ids (padded ``(X+2)(Y+2)(Z+2)`` space), fractional offsets and
    in-range mask for index-space coords ``idx`` [..., 3].

    Row linearization matches ``ops.scatter.corner_scatter_grid_grad``
    so the forward serve and the backward accumulate share one sort.
    """
    x, y, z = grid_shape3
    sizes = jnp.asarray((x, y, z), jnp.int32)
    i0 = jnp.floor(idx).astype(jnp.int32)
    f = idx - i0.astype(idx.dtype)
    ok = jnp.all((i0 >= -1) & (i0 < sizes), axis=-1)
    b = jnp.clip(i0, -1, sizes - 1) + 1  # padded coords in [0, size]
    rows = (b[..., 0] * (y + 2) + b[..., 1]) * (z + 2) + b[..., 2]
    return rows, f, ok


def rows_to_coords(rows: jnp.ndarray, grid_shape3):
    """Inverse of the row linearization: padded base coords [..., 3]."""
    x, y, z = grid_shape3
    b2 = rows % (z + 2)
    r = rows // (z + 2)
    b1 = r % (y + 2)
    b0 = r // (y + 2)
    return jnp.stack([b0, b1, b2], axis=-1)


def corner_weights(fracs: jnp.ndarray) -> jnp.ndarray:
    """Trilinear corner weights [..., 8], corner order dx slowest /
    dz fastest — matching the cell pack's channel-group order."""
    wx = jnp.stack([1.0 - fracs[..., 0], fracs[..., 0]], axis=-1)
    wy = jnp.stack([1.0 - fracs[..., 1], fracs[..., 1]], axis=-1)
    wz = jnp.stack([1.0 - fracs[..., 2], fracs[..., 2]], axis=-1)
    w = wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]
    return w.reshape(*fracs.shape[:-1], 8)


def _pack_dtype():
    return jnp.bfloat16 if _use_pallas_combine() else jnp.float32


def build_cell_pack(field: jnp.ndarray, rp: int) -> jnp.ndarray:
    """Cell pack over the padded base range [-1, size] per axis:
    row (b+1) holds the 8 corner values of base cell b, corner
    k = dx*4 + dy*2 + dz at channels [k*C, (k+1)*C); out-of-grid
    corners are exact zeros.  Output zero-padded to ``rp`` rows.

    bf16 shifted slices on TPU (exact bf16(field), measured 2.3x
    faster than the one-hot im2col conv — see ops/interp.py); fp32
    slices elsewhere.
    """
    x, y, z, c = field.shape
    if _use_pallas_combine():
        field = field.astype(jnp.bfloat16)
    gp = jnp.pad(field, ((1, 2), (1, 2), (1, 2), (0, 0)))
    parts = [
        jax.lax.slice(
            gp, (dx, dy, dz, 0), (dx + x + 2, dy + y + 2, dz + z + 2, c)
        )
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    ]
    pack = jnp.concatenate(parts, axis=-1).reshape(-1, 8 * c)
    r = pack.shape[0]
    return jnp.pad(pack, ((0, rp - r), (0, 0)))


def corner_shift_combine(dense: jnp.ndarray, grid_shape) -> jnp.ndarray:
    """Fold per-corner dense accumulations back onto grid nodes: the
    contribution to node v from corner offset o comes from base v - o,
    i.e. padded coord v - o + 1 — 8 shifted dense adds."""
    x, y, z, c = grid_shape
    corners = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    out = jnp.zeros((x, y, z, c), jnp.float32)
    for k, (dx, dy, dz) in enumerate(corners):
        sx, sy, sz = 1 - dx, 1 - dy, 1 - dz
        out = out + jax.lax.slice(
            dense, (sx, sy, sz, k * c), (sx + x, sy + y, sz + z, (k + 1) * c)
        )
    return out


def _rp_for(grid_shape3, bw: int) -> int:
    r = padded_rows(grid_shape3)
    return ((r + 1 + bw - 1) // bw + 1) * bw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pack_gather_sorted(field, keys_sorted, w8_sorted, bs=1024, bw=512):
    """Trilinear serve of a row-sorted sample stream.

    field: [X, Y, Z, C] grid; keys_sorted: [M] non-decreasing rows in
    the padded row space (sentinel >= padded_rows gathers zeros);
    w8_sorted: [M, 8] corner weights.  Returns [M, C] f32.

    Custom VJP: the field cotangent is the sorted dense accumulate +
    corner shifts — NO permutation (cotangents arrive sorted).  Key /
    weight cotangents are zero (sample positions are data).
    """
    return _pack_gather_fwd_impl(field, keys_sorted, w8_sorted, bs, bw)


def _pack_gather_fwd_impl(field, keys_sorted, w8_sorted, bs, bw):
    rp = _rp_for(field.shape[:3], bw)
    pack = build_cell_pack(field, rp)
    m = keys_sorted.shape[0]
    pad = (-m) % bs
    if pad:
        keys_sorted = jnp.concatenate(
            [keys_sorted, jnp.full((pad,), rp - 1, keys_sorted.dtype)]
        )
        w8_sorted = jnp.concatenate(
            [w8_sorted, jnp.zeros((pad, 8), w8_sorted.dtype)]
        )
    if _use_pallas_combine():
        from fgs_nerf_tpu.ops.pallas.window_gather import (
            sorted_window_gather_pallas,
        )

        out = sorted_window_gather_pallas(
            pack, keys_sorted, w8_sorted, bs=bs, bw=bw
        )
    else:
        from fgs_nerf_tpu.ops.pallas.window_gather import (
            sorted_window_gather_reference,
        )

        out = sorted_window_gather_reference(pack, keys_sorted, w8_sorted)
    return out[:m] if pad else out


def _pack_gather_fwd(field, keys_sorted, w8_sorted, bs, bw):
    out = _pack_gather_fwd_impl(field, keys_sorted, w8_sorted, bs, bw)
    return out, (field.shape, keys_sorted, w8_sorted)


def _pack_gather_bwd(bs, bw, res, g):
    grid_shape, keys_sorted, w8_sorted = res
    x, y, z, c = grid_shape
    r = padded_rows((x, y, z))
    upd_dtype = jnp.bfloat16 if _use_pallas_combine() else jnp.float32
    upd = (
        w8_sorted[:, :, None] * g[:, None, :].astype(w8_sorted.dtype)
    ).reshape(-1, 8 * c).astype(upd_dtype)
    keys_c = jnp.minimum(keys_sorted, r - 1)  # sentinels carry zero upd
    dense = _dense_accumulate(keys_c, upd, r)
    dense = dense.reshape(x + 2, y + 2, z + 2, 8 * c)
    dfield = corner_shift_combine(dense, grid_shape)
    return (
        dfield,
        np.zeros(keys_sorted.shape, jax.dtypes.float0),
        jnp.zeros_like(w8_sorted),
    )


pack_gather_sorted.defvjp(_pack_gather_fwd, _pack_gather_bwd)


def sort_stream(keys: jnp.ndarray, *payloads: jnp.ndarray):
    """ONE stable ascending sort by row key; returns (keys_sorted,
    *payloads_sorted).  All operands are [M] 1-D."""
    return jax.lax.sort((keys, *payloads), dimension=0, num_keys=1)


def _unsort_impl(iota_sorted, vals):
    k = vals.shape[1]
    cols = jax.lax.sort(
        (iota_sorted, *(vals[:, j] for j in range(k))),
        dimension=0, num_keys=1,
    )[1:]
    return jnp.stack(cols, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def unsort_to_raymajor(iota_sorted, keys_raymajor, vals):
    """Bring sorted-domain channels back to ray-major order.

    iota_sorted: [M] i32 — each sorted element's ray-major position
    (the iota payload of the main sort); keys_raymajor: [M] i32 — the
    ORIGINAL (unsorted) key array, used by the VJP to rebuild the exact
    permutation via the same stable sort; vals: [M, K] f32.
    Returns [M, K] in ray-major order.
    """
    return _unsort_impl(iota_sorted, vals)


def _unsort_fwd(iota_sorted, keys_raymajor, vals):
    return _unsort_impl(iota_sorted, vals), (keys_raymajor,)


def _unsort_bwd(res, g):
    (keys_raymajor,) = res
    k = g.shape[1]
    cols = jax.lax.sort(
        (keys_raymajor, *(g[:, j] for j in range(k))),
        dimension=0, num_keys=1,
    )[1:]
    return (
        np.zeros(keys_raymajor.shape, jax.dtypes.float0),
        np.zeros(keys_raymajor.shape, jax.dtypes.float0),
        jnp.stack(cols, axis=-1),
    )


unsort_to_raymajor.defvjp(_unsort_fwd, _unsort_bwd)
