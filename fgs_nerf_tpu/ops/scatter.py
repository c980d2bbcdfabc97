"""Sort-based deterministic scatter-add for trilinear-gather backwards.

Why: on TPU, XLA's scatter-add costs ~5-6 ns per scattered *element*
(channels multiply the cost), so the grid gradient of the fused
[sdf|grad|k0] gather — 8 corners x rays x samples x 16 channels — is
~1.4 s/step, dominating training (measured via jax.profiler; see
BASELINE.md).  This module replaces it with an MXU formulation:

1. sort the sample stream by base-cell row (one shared sort — every
   corner's rows are the base row plus a constant offset, so base order
   sorts all 8 corner streams);
2. rank-compress the sorted rows (ranks advance by <=1 per sample, so
   any block of B consecutive samples spans <= B ranks — a guaranteed
   static window, no spill path needed);
3. accumulate each block into its rank window with a one-hot matmul
   ``onehot[W, B] @ updates[B, C]`` on the MXU via ``lax.scan`` (the
   only sequential part, ~B-sized steps);
4. expand rank space back to the dense grid with a *gather*
   (``D[rank_map[row - corner_offset]]``) — gathers are per-row and
   width-independent, so this is ~10 ms where a scatter would pay per
   element — then combine corners as spatially shifted dense adds.

The result is exact (every update lands, fp32 accumulation) and
deterministic (duplicate rows write identical rank values).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

BLOCK = 2048  # samples per scan step == rank window size


@functools.lru_cache(maxsize=1)
def _use_pallas_combine() -> bool:
    """The fused Pallas combine kernel runs only on real TPU backends
    (Mosaic); CPU tests and the virtual mesh use the XLA scan path."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _rank_compress(rows_sorted: jnp.ndarray) -> jnp.ndarray:
    """Dense ranks of a sorted int array (0-based, ties share a rank)."""
    newseg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (rows_sorted[1:] != rows_sorted[:-1]).astype(jnp.int32)]
    )
    return jnp.cumsum(newseg)


def _block_accumulate(ranks: jnp.ndarray, upd: jnp.ndarray, n_ranks_cap: int):
    """D[rank] += upd via blockwise one-hot matmuls.

    ranks: [M] non-decreasing; upd: [M, C].  Returns D [n_ranks_cap, C].

    Two phases: (1) ONE batched MXU matmul computes every block's
    window contribution ``P[b] = onehot[b]^T @ upd[b]`` — the one-hot
    comparison fuses into the matmul operand, so the [nb, W, B] one-hot
    is never materialized (same fusion XLA performs for the top-K
    shading gather, measured in ``scripts/microbench_gather.py`` A);
    (2) a scan adds each window into the rank buffer at its offset —
    the only sequential part, now just slice+add+update per block
    instead of carrying the matmul serially (was ~16 us/block on v5e,
    the combine alone is ~4 us).
    """
    if _use_pallas_combine():
        from fgs_nerf_tpu.ops.pallas.scatter_combine import block_accumulate_pallas

        return block_accumulate_pallas(ranks, upd, n_ranks_cap, block=BLOCK)
    m, c = upd.shape
    pad = (-m) % BLOCK
    if pad:
        # padded samples point at the last rank with zero updates
        ranks = jnp.concatenate([ranks, jnp.full((pad,), ranks[-1], ranks.dtype)])
        upd = jnp.concatenate([upd, jnp.zeros((pad, c), upd.dtype)])
    nb = ranks.shape[0] // BLOCK
    ranks_b = ranks.reshape(nb, BLOCK)
    upd_b = upd.reshape(nb, BLOCK, c)
    # window start per block, clamped so the window fits the buffer
    w0 = jnp.minimum(ranks_b[:, 0], n_ranks_cap - BLOCK)
    local = ranks_b - w0[:, None]  # in [0, BLOCK)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK, BLOCK), 1)
    onehot = (iota_w == local[:, None, :]).astype(upd.dtype)  # [nb, W, B]
    p = jax.lax.dot_general(
        onehot, upd_b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [nb, W, C]

    def body(d, inp):
        pb, w0b = inp
        win = jax.lax.dynamic_slice(d, (w0b, 0), (BLOCK, c))
        return jax.lax.dynamic_update_slice(d, win + pb, (w0b, 0)), None

    d0 = jnp.zeros((n_ranks_cap, c), jnp.float32)
    d, _ = jax.lax.scan(body, d0, (p, w0))
    return d


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
    cap = max(n_rows_ext, BLOCK)
    # All 8 corners share the sort/ranks; their updates are stacked as
    # channel groups so ONE block scan accumulates everything (the scan
    # is the only sequential part — 8x fewer iterations and the one-hot
    # matmul amortizes over 8C channels).  Updates are built BEFORE the
    # permutation: v5e row-gather cost is bimodal in row width
    # (microbench_gather.py section D — 64-256-byte rows are 3-7x
    # slower per row than 512-byte rows), so ONE 8C-wide permutation
    # gather of the finished updates beats permuting the narrow
    # [i0|fracs|g] pack and building updates afterwards.
    corners = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    upd_groups = []
    for dx, dy, dz in corners:
        ci = i0 + jnp.asarray((dx, dy, dz), jnp.int32)
        inb = jnp.all((ci >= 0) & (ci < sizes), axis=-1)
        w = (
            (fracs[:, 0] if dx else 1.0 - fracs[:, 0])
            * (fracs[:, 1] if dy else 1.0 - fracs[:, 1])
            * (fracs[:, 2] if dz else 1.0 - fracs[:, 2])
        )
        upd_groups.append((w * inb.astype(w.dtype))[:, None] * g)
    upd_unsorted = jnp.concatenate(upd_groups, axis=-1)  # [M, 8C]

    # One 2-operand sort yields both the sorted keys and the
    # permutation (an argsort would pay an extra [M] gather for keys).
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    rows_s, order = jax.lax.sort((rows_base, iota), dimension=0, num_keys=1)
    upd_all = jnp.take(upd_unsorted, order, axis=0)

    ranks = _rank_compress(rows_s)
    # rank+1 scattered into zeros fuses the rank map and the presence
    # mask into one scatter (0 == row absent from the stream).
    rank_map1 = jnp.zeros((n_rows_ext,), jnp.int32).at[rows_s].set(ranks + 1)

    d = _block_accumulate(ranks, upd_all, cap)
    d = jnp.concatenate([jnp.zeros((1, d.shape[1]), d.dtype), d], axis=0)
    # dense expansion by GATHER (per-row, width-free): the contribution
    # to node v from corner offset o comes from base v - o, i.e.
    # padded coord v - o + 1.  Absent rows hit the zero guard row 0.
    dense = jnp.take(d, rank_map1, axis=0)
    dense = dense.reshape(xp, yp, zp, 8 * c)
    grid_grad = jnp.zeros((x, y, z, c), jnp.float32)
    for k, (dx, dy, dz) in enumerate(corners):
        sx, sy, sz = 1 - dx, 1 - dy, 1 - dz
        grid_grad = grid_grad + jax.lax.slice(
            dense, (sx, sy, sz, k * c), (sx + x, sy + y, sz + z, (k + 1) * c)
        )
    return grid_grad
