"""Channel-major sorted-stream field engine.

The round-3 sorted engine (git history: ``ops/sorted_stream.py``,
removed in round 4) proved the
reorganization — ONE stable sort by packed-grid row, streaming window
serve, shading in sorted order, permutation-free backward — but kept
the per-sample data in channel-last ``[M, C]`` layouts, which idle
>90% of the VPU lanes for every elementwise op (PROFILE_r03.md §3,
measured 309 ms/step vs the lattice engine's 150).  This module is the
prescribed channel-major rewrite: every per-sample quantity is a 1-D
``[M]`` array or a ``[C, M]`` channel-major matrix (full lanes), the
pack is ``[8C, Rp]``, and both Pallas kernels work in the MXU-native
orientation (``window_gather_cm`` forward, ``scatter_combine_cm``
backward with in-kernel outer-product updates).

Row space: linearized over padded base coords with a **lane-aligned z
stride** ``zp = roundup(Z + 2, 128)`` so the pack build's
``[8C, X+2, Y+2, zp] -> [8C, Rp]`` collapse is a free reshape (no
relayout).  Rows in the z padding are zero and unreferenced.

Reference role: pass 1+2 of the CUDA render
(`/root/reference/model/nerf.py:943-1075` over
`model/cuda/render_utils_kernel.cu:196-242` + ``F.grid_sample``); the
layout discipline itself has no reference counterpart — it is the
TPU answer to CUDA's per-thread scalar freedom.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fgs_nerf_tpu.ops.scatter import _use_pallas_combine


def z_stride(z: int) -> int:
    # z + 3: padded base coords span [0, z + 1] and the dz = 1 corner of
    # row r is served from row r + 1, so r + 1 <= z + 2 must stay inside
    # the same (x, y) column — one guaranteed zero row past the content
    return ((z + 3) + 127) // 128 * 128


def padded_rows_cm(grid_shape3) -> int:
    x, y, z = grid_shape3
    return (x + 2) * (y + 2) * z_stride(z)


def rows_fracs_cm(ix, iy, iz, grid_shape3):
    """Row ids, fractional offsets and in-range mask from per-axis
    index-space coordinate arrays (any matching shape).

    Operates on separate per-axis arrays (lattice ``[N, S]`` layouts
    stay full-lane) and uses the lane-aligned z stride.
    """
    x, y, z = grid_shape3
    zp = z_stride(z)
    i0x = jnp.floor(ix)
    i0y = jnp.floor(iy)
    i0z = jnp.floor(iz)
    fx = ix - i0x
    fy = iy - i0y
    fz = iz - i0z
    ok = (
        (i0x >= -1.0) & (i0x < x) & (i0y >= -1.0) & (i0y < y)
        & (i0z >= -1.0) & (i0z < z)
    )
    bx = jnp.clip(i0x, -1.0, x - 1.0) + 1.0
    by = jnp.clip(i0y, -1.0, y - 1.0) + 1.0
    bz = jnp.clip(i0z, -1.0, z - 1.0) + 1.0
    rows = ((bx * (y + 2) + by) * zp + bz).astype(jnp.int32)
    return rows, (fx, fy, fz), ok


def rows_to_coords_cm(rows: jnp.ndarray, grid_shape3):
    """Inverse linearization -> padded base coords (3 x [M] f32)."""
    x, y, z = grid_shape3
    zp = z_stride(z)
    b2 = rows % zp
    r = rows // zp
    b1 = r % (y + 2)
    b0 = r // (y + 2)
    return (
        b0.astype(jnp.float32), b1.astype(jnp.float32), b2.astype(jnp.float32)
    )


def pack16_pair(a, b) -> jnp.ndarray:
    """Two f32 in [0, 1] -> one u32 sort payload (16-bit fixed point
    each; max quantization error 0.5/65535 ~ 7.6e-6).

    Sort cost prices per payload COLUMN, so carrying (fx, fy) as one
    u32 instead of two f32 removes a column from the main stream sort.
    The quantization is deterministic and identical on every device
    (dp-bitwise parity holds); the engine then computes the EXACT
    gradient of the quantized-position forward, so fwd/bwd stay
    self-consistent."""
    qa = jnp.round(a * 65535.0).astype(jnp.uint32)
    qb = jnp.round(b * 65535.0).astype(jnp.uint32)
    return (qa << 16) | qb


def unpack16_pair(q):
    """Inverse of ``pack16_pair`` -> two f32 in [0, 1]."""
    a = (q >> 16).astype(jnp.float32) * (1.0 / 65535.0)
    b = (q & jnp.uint32(0xFFFF)).astype(jnp.float32) * (1.0 / 65535.0)
    return a, b


def sort_stream(keys, iota, fx, fy, fz, vdx, vdy, vdz, pack16=True):
    """The engine's main stream sort: stable by grid row, carrying the
    per-sample fracs + viewdirs.  With ``pack16`` the six f32 payloads
    ride as three u32 16-bit pairs (5 sort operands instead of 8 —
    lax.sort prices per payload column); positions quantize to 1/65535
    of a voxel, directions to ~3e-5.  Returns
    (keys_s, iota_s, fx_s, fy_s, fz_s, vx_s, vy_s, vz_s)."""
    if not pack16:
        return jax.lax.stop_gradient(
            jax.lax.sort(
                (keys, iota, fx, fy, fz, vdx, vdy, vdz),
                dimension=0, num_keys=1,
            )
        )
    qa = pack16_pair(fx, fy)
    qb = pack16_pair(fz, (vdx + 1.0) * 0.5)
    qc = pack16_pair((vdy + 1.0) * 0.5, (vdz + 1.0) * 0.5)
    keys_s, iota_s, qa_s, qb_s, qc_s = jax.lax.stop_gradient(
        jax.lax.sort((keys, iota, qa, qb, qc), dimension=0, num_keys=1)
    )
    fx_s, fy_s = unpack16_pair(qa_s)
    fz_s, vh1 = unpack16_pair(qb_s)
    vh2, vh3 = unpack16_pair(qc_s)
    return (keys_s, iota_s, fx_s, fy_s, fz_s,
            vh1 * 2.0 - 1.0, vh2 * 2.0 - 1.0, vh3 * 2.0 - 1.0)


def corner_weights_cm(fx, fy, fz) -> jnp.ndarray:
    """Trilinear corner weights [8, M], corner k = dx*4 + dy*2 + dz."""
    parts = []
    for dx in (0, 1):
        wx = fx if dx else 1.0 - fx
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            for dz in (0, 1):
                wz = fz if dz else 1.0 - fz
                parts.append(wx * wy * wz)
    return jnp.stack(parts, axis=0)


def build_cell_pack_cm(field_cm: jnp.ndarray, rp: int) -> jnp.ndarray:
    """Channel-major HALF cell pack: column (row of padded base b)
    holds the 4 ``(dx, dy)`` corner values of base cell b at z-offset 0,
    group k2 = dx*2 + dy at sublanes [k2*C, (k2+1)*C); out-of-grid
    corners are exact zeros.  Zero-padded to ``rp`` columns.

    The dz = 1 corners are NOT packed: in the lane-strided row space
    the z neighbor is simply the next row, so the serve reads group k2
    at rows r and r + 1 (two shifted one-hots against the same window).
    This halves pack bytes AND removes the z-offset slices from the
    build — they were the only lane-misaligned (and therefore
    relayout-priced) part of the full 8-corner pack.

    field_cm: [C, X, Y, Z] -> [4C, rp] (bf16 on TPU, f32 elsewhere).
    """
    c, x, y, z = field_cm.shape
    zp = z_stride(z)
    if _use_pallas_combine():
        field_cm = field_cm.astype(jnp.bfloat16)
    gp = jnp.pad(field_cm, ((0, 0), (1, 2), (1, 2), (1, zp - z - 1)))
    parts = [
        jax.lax.slice(gp, (0, dx, dy, 0), (c, dx + x + 2, dy + y + 2, zp))
        for dx in (0, 1) for dy in (0, 1)
    ]
    pack = jnp.concatenate(parts, axis=0).reshape(4 * c, -1)
    r = pack.shape[1]
    return jnp.pad(pack, ((0, 0), (0, rp - r)))


def _rp_for(grid_shape3, bw: int) -> int:
    r = padded_rows_cm(grid_shape3)
    return ((r + 1 + bw - 1) // bw + 1) * bw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pack_gather_sorted_cm(field_cm, keys_sorted, w8_sorted, bs=1024, bw=512):
    """Trilinear serve of a row-sorted sample stream, channel-major.

    field_cm: [C, X, Y, Z]; keys_sorted: [M] non-decreasing rows in the
    lane-strided row space (sentinel >= padded_rows_cm gathers zeros);
    w8_sorted: [8, M] corner weights.  Returns [C, M] f32.

    Custom VJP: the field cotangent is the channel-major dense
    accumulate (updates built in-kernel from w8 x g) + corner shifts —
    NO permutation (cotangents arrive sorted) and no [M, 8C]
    materialization.  Sentinel samples MUST carry zero cotangent (they
    do: they exist only at masked lattice slots, whose alpha/rgb are
    multiplied by a zero mask downstream).  Key / weight cotangents are
    zero (sample positions are data).
    """
    return _pack_gather_cm_fwd_impl(field_cm, keys_sorted, w8_sorted, bs, bw)


def _pack_gather_cm_fwd_impl(field_cm, keys_sorted, w8_sorted, bs, bw):
    grid3 = field_cm.shape[1:]
    rp = _rp_for(grid3, bw)
    pack = build_cell_pack_cm(field_cm, rp)
    m = keys_sorted.shape[0]
    pad = (-m) % bs
    if pad:
        # rp - 2: the serve also reads row + 1, which must stay in range
        keys_sorted = jnp.concatenate(
            [keys_sorted, jnp.full((pad,), rp - 2, keys_sorted.dtype)]
        )
        w8_sorted = jnp.pad(w8_sorted, ((0, 0), (0, pad)))
    if _use_pallas_combine():
        from fgs_nerf_tpu.ops.pallas.window_gather_cm import (
            sorted_window_gather_cm_pallas,
        )

        out = sorted_window_gather_cm_pallas(
            pack, keys_sorted, w8_sorted, bs=bs, bw=bw
        )
    else:
        from fgs_nerf_tpu.ops.pallas.window_gather_cm import (
            sorted_window_gather_cm_reference,
        )

        out = sorted_window_gather_cm_reference(pack, keys_sorted, w8_sorted)
    return out[:, :m] if pad else out


def _pack_gather_cm_fwd(field_cm, keys_sorted, w8_sorted, bs, bw):
    out = _pack_gather_cm_fwd_impl(field_cm, keys_sorted, w8_sorted, bs, bw)
    return out, (field_cm.shape, keys_sorted, w8_sorted)


def _pack_gather_cm_bwd(bs, bw, res, g):
    grid_shape, keys_sorted, w8_sorted = res
    c, x, y, z = grid_shape
    zp = z_stride(z)
    r = padded_rows_cm((x, y, z))
    # Sentinels clamp to r - 2 so their (zero) dz-pair deposits at
    # r - 2 / r - 1 stay INSIDE the r-row space — the accumulate then
    # produces exactly r columns and, when r is a flush-block multiple
    # (the make_model_config pack alignment), the combine view below is
    # a layout-free reshape instead of a ~5.7 ms slice copy.  Safe:
    # the largest real content row is r - zp + (z + 1) < r - 2.
    keys_c = jnp.minimum(keys_sorted, r - 2)
    if _use_pallas_combine():
        from fgs_nerf_tpu.ops.pallas.scatter_combine_cm import (
            dense_accumulate_cm_pallas,
        )

        # fine-stage 256^3 valve: the [4C, r] f32 dense buffer is ~6 GB
        # and two of them can be live across the two serve backwards —
        # flush bf16 past 2 GiB (one rounding per row; the in-kernel
        # updates are already bf16)
        out_dtype = (
            jnp.bfloat16 if 4 * c * r * 4 > (2 << 30) else jnp.float32
        )
        dense = dense_accumulate_cm_pallas(
            keys_c, w8_sorted, g, r, out_dtype=out_dtype
        )
    else:
        from fgs_nerf_tpu.ops.pallas.scatter_combine_cm import (
            dense_accumulate_cm_reference,
        )

        dense = dense_accumulate_cm_reference(keys_c, w8_sorted, g, r)
    dense = dense.reshape(4, c, x + 2, y + 2, zp)
    # Node v receives corner (dx, dy, dz) of base v - (dx, dy, dz),
    # deposited at padded row (v0+1-dx, v1+1-dy, v2+1-dz) shifted +dz in
    # z — i.e. ALWAYS z-column v2+1: the dz pair merges in row space and
    # only 4 shifted adds remain.
    dfield = jnp.zeros((c, x, y, z), jnp.float32)
    for k2, (dx, dy) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        sx, sy = 1 - dx, 1 - dy
        dfield = dfield + jax.lax.slice(
            dense, (k2, 0, sx, sy, 1),
            (k2 + 1, c, sx + x, sy + y, 1 + z),
        )[0]
    return (
        dfield,
        np.zeros(keys_sorted.shape, jax.dtypes.float0),
        jnp.zeros_like(w8_sorted),
    )


pack_gather_sorted_cm.defvjp(_pack_gather_cm_fwd, _pack_gather_cm_bwd)


# ---------------------------------------------------------------------------
# Multi-tap serve (fine-stage hierarchical taps, `model/nerf.py:597-637`)
# ---------------------------------------------------------------------------


def tap_bounds(grid_shape3) -> Tuple[int, int]:
    """(maxneg, maxpos) row-offset envelope of displacement-<=2 taps in
    the z-minor row space: z-taps span [-3, +3]; y-taps span
    [-3*zp, 2*zp + 1] (the +1 is the dz pair's second row)."""
    zp = z_stride(grid_shape3[2])
    return 3 * zp + 4, 2 * zp + 4


def tap_deltas_weights(b0, b1, b2, fx, fy, fz, displace, grid_shape3,
                       axes=("z", "y")):
    """Per-tap row offsets, (t, d, k2)-packed corner weights, and
    post-clamp displaced-axis coordinates for axis taps of a z-minor
    sorted stream.

    Inputs are the padded base coords ([M] f32, from
    ``rows_to_coords_cm``) and fracs of the sorted stream.  Taps are
    ordered (axis-, axis+) per requested axis, x displacement
    (tap-major) — the reference's ``sample_sdfs`` ordering restricted
    to the requested axes.  X-axis taps are obtained by calling this on
    the TRANSPOSED ([Z, Y, X]) linearization with permuted arguments
    and ``axes=('z',)``: there the minor axis is x, and the pack groups
    are (dz, dy).  Tap coordinates are clamped to [0, size - 1] per the
    reference (`model/nerf.py:597-637` clip) before row/frac
    derivation.

    Weight semantics — the half-pack group of a row covers offsets
    (a, b) over the two MAJOR axes and the dz pair (kernel's d) covers
    the minor axis:

    * minor-axis tap ("z"): lerp runs over the tap's own minor frac;
      group weights are the sample's (fx, fy).
    * middle-axis tap ("y"): the row jumps whole minor strides; group
      dim b indexes the TAP's y cell (frac fy'), lerp runs over the
      sample's own minor frac fz.

    Returns (delta [T, M] i32, w8t [8T, M] f32, coord [T, M] f32) with
    T = 2 * len(axes) * len(displace).
    """
    x, y, z = grid_shape3
    zp = z_stride(z)
    iy = b1 - 1.0 + fy
    iz = b2 - 1.0 + fz
    wx0, wx1 = 1.0 - fx, fx
    wy0, wy1 = 1.0 - fy, fy

    deltas, w8ts, coords = [], [], []

    def emit(delta, wa0, wa1, wb0, wb1, flerp, coord):
        deltas.append(delta.astype(jnp.int32))
        f0, f1 = 1.0 - flerp, flerp
        # (d, k2) layout: d slowest within the tap, k2 = a*2 + b
        w8ts.extend([
            f0 * wa0 * wb0, f0 * wa0 * wb1, f0 * wa1 * wb0, f0 * wa1 * wb1,
            f1 * wa0 * wb0, f1 * wa0 * wb1, f1 * wa1 * wb0, f1 * wa1 * wb1,
        ])
        coords.append(coord)

    for axis in axes:
        for sign in (-1.0, 1.0):
            for d in displace:
                if axis == "z":
                    zt = jnp.clip(iz + sign * d, 0.0, z - 1.0)
                    i0 = jnp.floor(zt)
                    emit((i0 + 1.0) - b2, wx0, wx1, wy0, wy1, zt - i0, zt)
                elif axis == "y":
                    yt = jnp.clip(iy + sign * d, 0.0, y - 1.0)
                    i0 = jnp.floor(yt)
                    fyt = yt - i0
                    emit(((i0 + 1.0) - b1) * zp, wx0, wx1, 1.0 - fyt, fyt,
                         fz, yt)
                else:
                    raise ValueError(axis)

    return (
        jnp.stack(deltas, axis=0),
        jnp.stack(w8ts, axis=0),
        jnp.stack(coords, axis=0),
    )


def _tap_geometry(grid_shape3, maxneg, maxpos, bs, bw):
    """Shared row-space bookkeeping for the tap serve + its VJP."""
    r = padded_rows_cm(grid_shape3)
    margin = ((maxneg + 127) // 128) * 128
    rp = margin + r + maxpos + 2
    rp = ((rp + bw - 1) // bw) * bw
    sentinel = rp - maxpos - 2
    return r, margin, rp, sentinel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def tap_gather_sorted_cm(field3, keys_sorted, delta, w8t,
                         maxneg, maxpos, bs=1024, bw=None):
    """Multi-tap trilinear serve of a row-sorted stream over a
    1-channel grid — the sorted-engine form of the reference's
    ``sample_sdfs`` tap sampler (`model/nerf.py:597-637`).

    field3: [X, Y, Z] (the grid the taps read; transposed for the
    x-minor pass); keys_sorted: [M] non-decreasing z-minor rows
    (sentinels >= padded_rows_cm serve zeros); delta: [T, M] per-tap
    row offsets within the (maxneg, maxpos) envelope; w8t: [8T, M]
    (t, d, k2)-packed corner weights.  Returns [T, M] f32.

    Custom VJP: the grid cotangent runs the multi-tap dense accumulate
    (deposits at ``row + delta (+d)``) followed by the same 4-shift
    half-pack combine as the base gather.  delta / w8t / key cotangents
    are zero (tap positions are data).
    """
    return _tap_gather_fwd_impl(field3, keys_sorted, delta, w8t,
                                maxneg, maxpos, bs, bw)


def _tap_bw(maxneg, maxpos, bw):
    if bw is not None:
        return bw
    need = maxneg + maxpos + 130
    return max(512, ((need + 127) // 128) * 128)


def _tap_gather_fwd_impl(field3, keys_sorted, delta, w8t, maxneg, maxpos,
                         bs, bw):
    grid3 = field3.shape
    bw = _tap_bw(maxneg, maxpos, bw)
    r, margin, rp, sentinel = _tap_geometry(grid3, maxneg, maxpos, bs, bw)
    pack = build_cell_pack_cm(field3[None], r)  # [4, r]
    pack = jnp.pad(pack, ((0, 0), (margin, rp - margin - r)))
    # shift into the margined row space; sentinels move to the zero tail
    rows = jnp.where(keys_sorted < r, keys_sorted + margin, sentinel)
    m = rows.shape[0]
    pad = (-m) % bs
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.full((pad,), sentinel, rows.dtype)]
        )
        delta = jnp.pad(delta, ((0, 0), (0, pad)))
        w8t = jnp.pad(w8t, ((0, 0), (0, pad)))
    if _use_pallas_combine():
        from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
            tap_window_serve_cm_pallas,
        )

        out = tap_window_serve_cm_pallas(
            pack, rows, delta, w8t, maxneg, maxpos, bs=bs, bw=bw
        )
    else:
        from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
            tap_window_serve_cm_reference,
        )

        out = tap_window_serve_cm_reference(pack, rows, delta, w8t)
    return out[:, :m] if pad else out


def _tap_gather_fwd(field3, keys_sorted, delta, w8t, maxneg, maxpos, bs, bw):
    out = _tap_gather_fwd_impl(field3, keys_sorted, delta, w8t,
                               maxneg, maxpos, bs, bw)
    return out, (field3.shape, keys_sorted, delta, w8t)


def _tap_gather_bwd(maxneg, maxpos, bs, bw, res, g):
    grid3, keys_sorted, delta, w8t = res
    x, y, z = grid3
    zp = z_stride(z)
    bw = _tap_bw(maxneg, maxpos, bw)
    r, margin, rp, _ = _tap_geometry(grid3, maxneg, maxpos, bs, bw)
    cap = margin + r + maxpos + 2
    # backward sentinel: zero-weight deposits parked just past the real
    # rows but INSIDE the accumulate's flush range (cap), so the final
    # flush loop never DMAs past the output
    rows = jnp.where(keys_sorted < r, keys_sorted + margin,
                     cap - maxpos - 2)
    if _use_pallas_combine():
        from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
            tap_dense_accumulate_cm_pallas,
        )

        out_dtype = (
            jnp.bfloat16 if 4 * cap * 4 > (256 << 20) else jnp.float32
        )
        dense = tap_dense_accumulate_cm_pallas(
            rows, delta, w8t, g, cap, maxneg, maxpos, block=512,
            out_dtype=out_dtype,
        )
    else:
        from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
            tap_dense_accumulate_cm_reference,
        )

        dense = tap_dense_accumulate_cm_reference(rows, delta, w8t, g, cap)
    dense = dense[:, margin:margin + r].reshape(4, 1, x + 2, y + 2, zp)
    dfield = jnp.zeros((1, x, y, z), jnp.float32)
    for k2, (da, db) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        sa, sb = 1 - da, 1 - db
        dfield = dfield + jax.lax.slice(
            dense, (k2, 0, sa, sb, 1),
            (k2 + 1, 1, sa + x, sb + y, 1 + z),
        )[0]
    return (
        dfield[0],
        np.zeros(keys_sorted.shape, jax.dtypes.float0),
        np.zeros(delta.shape, jax.dtypes.float0),
        jnp.zeros_like(w8t),
    )


tap_gather_sorted_cm.defvjp(_tap_gather_fwd, _tap_gather_bwd)


def _unsort_ch_impl(iota_sorted, vals):
    return tuple(
        jax.lax.sort((iota_sorted, *vals), dimension=0, num_keys=1)[1:]
    )


@jax.custom_vjp
def unsort_channels(iota_sorted, keys_raymajor, vals: Tuple[jnp.ndarray, ...]):
    """Bring sorted-domain 1-D channels back to ray-major order.

    iota_sorted: [M] i32 — each sorted element's ray-major position (the
    iota payload of the main sort); keys_raymajor: [M] i32 — the
    ORIGINAL (unsorted) key array, whose re-sort rebuilds the exact
    permutation in the VJP; vals: tuple of [M] f32.  Returns the tuple
    in ray-major order.
    """
    return _unsort_ch_impl(iota_sorted, vals)


def _unsort_ch_fwd(iota_sorted, keys_raymajor, vals):
    return _unsort_ch_impl(iota_sorted, vals), (keys_raymajor,)


def _unsort_ch_bwd(res, g):
    (keys_raymajor,) = res
    g_sorted = jax.lax.sort(
        (keys_raymajor, *g), dimension=0, num_keys=1
    )[1:]
    return (
        np.zeros(keys_raymajor.shape, jax.dtypes.float0),
        np.zeros(keys_raymajor.shape, jax.dtypes.float0),
        tuple(g_sorted),
    )


unsort_channels.defvjp(_unsort_ch_fwd, _unsort_ch_bwd)


def _resort_ch_impl(keys_raymajor, vals):
    return tuple(
        jax.lax.sort((keys_raymajor, *vals), dimension=0, num_keys=1)[1:]
    )


@jax.custom_vjp
def resort_channels(keys_raymajor, iota_sorted, vals: Tuple[jnp.ndarray, ...]):
    """Bring ray-major 1-D channels INTO the sorted order of a stable
    key sort (the inverse of ``unsort_channels``).

    keys_raymajor: [M] i32 — the original key array whose stable sort
    defines the order; iota_sorted: [M] i32 — that sort's iota payload
    (each sorted position's ray-major origin), used by the VJP to send
    cotangents back without an XLA scatter.  Returns the tuple in
    sorted order.
    """
    return _resort_ch_impl(keys_raymajor, vals)


def _resort_ch_fwd(keys_raymajor, iota_sorted, vals):
    return _resort_ch_impl(keys_raymajor, vals), (iota_sorted,)


def _resort_ch_bwd(res, g):
    (iota_sorted,) = res
    g_rm = jax.lax.sort((iota_sorted, *g), dimension=0, num_keys=1)[1:]
    return (
        np.zeros(iota_sorted.shape, jax.dtypes.float0),
        np.zeros(iota_sorted.shape, jax.dtypes.float0),
        tuple(g_rm),
    )


resort_channels.defvjp(_resort_ch_fwd, _resort_ch_bwd)
