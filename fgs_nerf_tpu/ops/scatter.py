"""Sort-based deterministic scatter-add for trilinear-gather backwards.

Why: on TPU, XLA's scatter-add costs ~5-6 ns per scattered *element*
(channels multiply the cost), so the grid gradient of the fused
[sdf|grad|k0] gather — 8 corners x rays x samples x 16 channels — is
~1.4 s/step, dominating training (measured via jax.profiler; see
BASELINE.md).  This module replaces it with an MXU formulation:

1. sort the sample stream by base-cell row (one shared sort — every
   corner's rows are the base row plus a constant offset, so base order
   sorts all 8 corner streams);
2. accumulate the sorted stream into the dense (padded) row space with
   the sliding-window one-hot MXU kernel
   (``ops.pallas.scatter_combine.dense_accumulate_pallas``) — each
   dense row is written to HBM exactly once;
3. combine corners as spatially shifted dense adds.

The result is exact (every update lands, fp32 accumulation) and
deterministic (sorted order fixes the duplicate-row reduction order).
On CPU backends (tests / the virtual mesh) the accumulation falls back
to XLA's serial scatter-add over the sorted stream — same values,
no Mosaic dependency.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

BLOCK = 512  # samples per kernel block (best of 256/512/1024/2048 sweep,
# round 3: 13.4 ms vs 16.5 ms at 2048 for the coarse bench backward —
# smaller blocks shrink the [B, B] one-hot's VMEM traffic faster than
# the per-block control overhead grows)


@functools.lru_cache(maxsize=1)
def _use_pallas_combine() -> bool:
    """The fused Pallas kernel runs only on real TPU backends (Mosaic);
    CPU tests and the virtual mesh use the XLA scatter-add path."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _dense_accumulate(rows_sorted: jnp.ndarray, upd: jnp.ndarray, cap: int,
                      out_dtype=jnp.float32):
    """D[row] += upd over a sorted row stream -> dense [cap, C] f32."""
    if _use_pallas_combine():
        from fgs_nerf_tpu.ops.pallas.scatter_combine import dense_accumulate_pallas

        return dense_accumulate_pallas(
            rows_sorted, upd, cap, block=BLOCK, out_dtype=out_dtype
        )
    # CPU path: XLA applies scatter updates serially in operand order,
    # which over the sorted stream matches the kernel's deterministic
    # per-row accumulation order.
    return (
        jnp.zeros((cap, upd.shape[1]), jnp.float32)
        .at[rows_sorted]
        .add(upd.astype(jnp.float32))
    )


# Memory valves for huge row spaces (fine stage, 256^3 grids —
# VERDICT r4 item 2).  The kernel lane-pads C to 128, so a 1-channel
# tap backward at 256^3 would allocate a 16x-padded [17M, 128] f32
# buffer (~8.8 GB); folding F consecutive z-rows into the unused lanes
# divides the row count by F at zero padding cost, and a bf16 flush
# halves whatever remains once the buffer still exceeds the cap.
DENSE_F32_BYTES_CAP = 2 << 30


def _fold_factor(c8: int, n_rows: int) -> int:
    """Largest F with F*c8 <= 128 while the padded f32 buffer is big."""
    fold = 1
    while (
        fold * 2 * c8 <= 128
        and ((n_rows + fold - 1) // fold) * max(fold * c8, 128) * 4
        > DENSE_F32_BYTES_CAP
    ):
        fold *= 2
    return fold


def corner_scatter_grid_grad(
    i0: jnp.ndarray,  # [M, 3] int32 base cell (floor of index coords)
    fracs: jnp.ndarray,  # [M, 3] fractional offsets in [0, 1)
    g: jnp.ndarray,  # [M, C] output cotangent per sample
    grid_shape: Tuple[int, int, int, int],
) -> jnp.ndarray:
    """Gradient of an 8-corner trilinear gather w.r.t. the grid.

    Matches the zero-padding forward: corners outside the grid
    contribute nothing.
    """
    x, y, z, c = grid_shape
    sizes = jnp.asarray((x, y, z), jnp.int32)
    # Base cells live in a virtual (+2)-padded volume so that partially
    # out-of-bounds bases (i0 == -1 on some axis, whose +1 corners are
    # valid) keep the linear corner-offset algebra.  Bases outside
    # [-1, size-1] have no valid corner (every corner is masked), so
    # clipping them into range is harmless.
    xp, yp, zp = x + 2, y + 2, z + 2
    n_rows_ext = xp * yp * zp
    base_p = jnp.clip(i0, -1, sizes - 1) + 1  # padded coords in [0, size]
    rows_base = (base_p[:, 0] * yp + base_p[:, 1]) * zp + base_p[:, 2]

    m = rows_base.shape[0]
    # All 8 corners share the sort; their updates are stacked as channel
    # groups so ONE accumulation machine handles everything.  Updates
    # are built BEFORE the permutation: v5e row-gather cost is bimodal
    # in row width (microbench_gather.py section D — 64-256-byte rows
    # are 3-7x slower per row than 512-byte rows), so ONE 8C-wide
    # permutation gather of the finished updates beats permuting the
    # narrow [i0|fracs|g] pack and building updates afterwards.
    corners = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    # The Pallas accumulate kernel consumes bf16 updates (fp32 window
    # accumulation) — casting BEFORE the build and the permutation
    # gather halves their HBM traffic.  Each individual update is
    # bf16-rounded (~2^-8 relative) vs the CPU fallback, which keeps
    # fp32 end to end; only the accumulation order is identical.
    upd_dtype = jnp.bfloat16 if _use_pallas_combine() else jnp.float32
    w8_cols = []
    for dx, dy, dz in corners:
        ci = i0 + jnp.asarray((dx, dy, dz), jnp.int32)
        inb = jnp.all((ci >= 0) & (ci < sizes), axis=-1)
        w = (
            (fracs[:, 0] if dx else 1.0 - fracs[:, 0])
            * (fracs[:, 1] if dy else 1.0 - fracs[:, 1])
            * (fracs[:, 2] if dz else 1.0 - fracs[:, 2])
        )
        w8_cols.append(w * inb.astype(w.dtype))
    # ONE broadcast outer product [M, 8, C] -> [M, 8C]: the
    # per-corner-concat formulation made XLA feed the cotangent through
    # a serial channel-major relayout while-loop (~4.4 ms/step at the
    # bench shape, HLO while.13)
    w8 = jnp.stack(w8_cols, axis=-1)  # [M, 8]
    upd_unsorted = (
        w8[:, :, None] * g[:, None, :]
    ).reshape(m, -1).astype(upd_dtype)  # [M, 8C]

    # One 2-operand sort yields both the sorted keys and the
    # permutation (an argsort would pay an extra [M] gather for keys).
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    rows_s, order = jax.lax.sort((rows_base, iota), dimension=0, num_keys=1)
    upd_all = jnp.take(upd_unsorted, order, axis=0)

    c8 = 8 * c
    fold = _fold_factor(c8, n_rows_ext) if _use_pallas_combine() else 1
    if fold > 1:
        # fold F consecutive rows into the lane dim AFTER the
        # permutation (the narrow pre-fold rows keep the take in the
        # cheap <=32-byte row-gather regime); sample at row r lands in
        # output row r // F at lane offset (r % F) * 8C.  r // F is
        # monotonic over the sorted stream and each (row, corner) lane
        # still accumulates its samples in the same sorted order, so
        # the unfold reshape below reproduces the unfolded sums exactly.
        rmod = (rows_s % fold)[:, None]
        upd_all = jnp.concatenate(
            [
                upd_all * (rmod == k).astype(upd_all.dtype)
                for k in range(fold)
            ],
            axis=-1,
        )
        rows_acc = rows_s // fold
        cap_f = (n_rows_ext + fold - 1) // fold
    else:
        rows_acc = rows_s
        cap_f = n_rows_ext
    dense_bytes = cap_f * max(((fold * c8 + 127) // 128) * 128, 128) * 4
    out_dtype = (
        jnp.bfloat16
        if _use_pallas_combine() and dense_bytes > DENSE_F32_BYTES_CAP
        else jnp.float32
    )
    dense = _dense_accumulate(rows_acc, upd_all, cap_f, out_dtype=out_dtype)
    if fold > 1:
        dense = dense.reshape(cap_f * fold, c8)[:n_rows_ext]
    dense = dense.reshape(xp, yp, zp, 8 * c)
    # The contribution to node v from corner offset o comes from base
    # v - o, i.e. padded coord v - o + 1: 8 shifted dense adds.
    grid_grad = jnp.zeros((x, y, z, c), jnp.float32)
    for k, (dx, dy, dz) in enumerate(corners):
        sx, sy, sz = 1 - dx, 1 - dy, 1 - dz
        grid_grad = grid_grad + jax.lax.slice(
            dense, (sx, sy, sz, k * c), (sx + x, sy + y, sz + z, (k + 1) * c)
        )
    return grid_grad
