"""Pallas TPU kernel: sorted streaming window gather — the forward
half of the sorted render engine (mirror of ``scatter_combine``).

Problem: XLA's dynamic row gather costs ~11.5 ns/row on v5e regardless
of index distribution or row width (BASELINE.md) — ~27 ms for the
coarse bench's 2.36M-sample trilinear pass.  This kernel serves a
**row-sorted** sample stream from block-pipelined windows of the
cell-packed grid instead:

* the sample stream is pre-sorted by packed-grid row (the sort is
  shared with the backward scatter, which needs the same order);
* for each block of ``bs`` sorted samples, the pallas pipeline DMAs the
  two ``bw``-row pack blocks covering the block's first row — window
  starts are scalar-prefetched, so loads are double-buffered and
  overlap compute;
* the gather is one-hot MXU matmuls ``onehot[bs, bw] @ window[bw, 8C]``
  followed by an in-register trilinear weight reduction to ``[bs, C]``
  — samples never touch HBM rows individually;
* blocks whose rows span past the fast window (rare: occupancy gaps)
  are completed by an in-body DMA slide loop over the suffix of
  unserved samples (rows are sorted, so the fast-served set is always
  a prefix).  Whether a block needs the slow path is ALSO precomputed
  and scalar-prefetched — the common case never syncs the scalar core
  on a vector reduction.

Out-of-scene samples carry a sentinel row pointing at the zero-padded
pack tail, so they gather exact zeros with no special casing.

This replaces the role of the reference's CUDA ``F.grid_sample``
gather in pass 1 of rendering (SURVEY.md §2.7 N11,
`/root/reference/model/nerf.py:639-672`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(bw: int, c: int, rp: int, slow_path: bool):
    def kernel(wblk_ref, f0_ref, rows_ref, w8_ref, pack_ref,
               win0_ref, win1_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        bs = rows_ref.shape[0]
        base = wblk_ref[b] * bw

        rows = rows_ref[:, 0]
        local = rows - base
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (bs, bw), 1)
        oh0 = (iota_w == local[:, None]).astype(jnp.bfloat16)
        oh1 = (iota_w == (local[:, None] - bw)).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh0, win0_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            oh1, win1_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bs, 8C]

        if slow_path:
            def run_slow():
                def cond(carry):
                    f, _ = carry
                    return f < bs

                def body(carry):
                    f, acc = carry
                    idx = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)[:, 0]
                    unserved = idx >= f
                    w = jnp.min(jnp.where(unserved, rows, rp))
                    qb = jnp.minimum(w // bw, rp // bw - 2)
                    dma = pltpu.make_async_copy(
                        pack_ref.at[
                            pl.ds(pl.multiple_of(qb * bw, bw), 2 * bw), :
                        ],
                        scratch, sem,
                    )
                    dma.start()
                    dma.wait()
                    local2 = rows - qb * bw
                    serve = unserved & (local2 >= 0) & (local2 < 2 * bw)
                    loc = jnp.where(serve, local2, -1)
                    iota2 = jax.lax.broadcasted_iota(
                        jnp.int32, (bs, 2 * bw), 1)
                    oh = (iota2 == loc[:, None]).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        oh, scratch[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return f + jnp.sum(serve.astype(jnp.int32)), acc + contrib

                return jax.lax.while_loop(cond, body, (f0_ref[b], g))[1]

            # the predicate is a PREFETCHED scalar: the fast path never
            # waits on a vector→scalar reduction
            g = jax.lax.cond(f0_ref[b] < bs, run_slow, lambda: g)

        w8 = w8_ref[:]
        out = jnp.zeros((bs, c), jnp.float32)
        for k in range(8):
            out = out + g[:, k * c:(k + 1) * c] * w8[:, k:k + 1]
        out_ref[:] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("bs", "bw", "slow_path"))
def sorted_window_gather_pallas(
    pack: jnp.ndarray,   # [Rp, 8C] bf16, Rp multiple of bw, zero-padded tail
    rows: jnp.ndarray,   # [M] i32 non-decreasing; sentinel rows land in the
                         #     zero tail and therefore gather exact zeros
    w8: jnp.ndarray,     # [M, 8] f32 trilinear corner weights
    bs: int = 1024,
    bw: int = 512,
    slow_path: bool = True,  # False: benchmark-only fast-path floor
) -> jnp.ndarray:
    """out[m] = sum_k w8[m, k] * pack[rows[m], k*C:(k+1)*C] — [M, C] f32."""
    rp, c8 = pack.shape
    c = c8 // 8
    m = rows.shape[0]
    assert rp % bw == 0 and m % bs == 0
    nb = m // bs
    nwb = rp // bw
    # fast-window start block per sample block, clamped so (wblk, wblk+1)
    # stay in range; f0 = how many leading samples the fast window serves
    # (block rows are sorted, so served samples are a prefix)
    wblk = jnp.minimum(rows[::bs] // bw, nwb - 2).astype(jnp.int32)
    local = rows.reshape(nb, bs) - (wblk * bw)[:, None]
    f0 = jnp.sum(local < 2 * bw, axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bs, 1), lambda b, *pref: (b, 0)),
            pl.BlockSpec((bs, 8), lambda b, *pref: (b, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # whole pack (slow path)
            pl.BlockSpec((1, bw, c8), lambda b, wref, fref: (wref[b], 0, 0)),
            pl.BlockSpec((1, bw, c8),
                         lambda b, wref, fref: (wref[b] + 1, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, c), lambda b, *pref: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * bw, c8), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(bw, c, rp, slow_path),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.float32),
    )(wblk, f0, rows.reshape(m, 1), w8,
      pack, pack.reshape(nwb, bw, c8), pack.reshape(nwb, bw, c8))


def sorted_window_gather_reference(pack, rows, w8):
    """Pure-XLA reference / CPU fallback: identical values."""
    c8 = pack.shape[1]
    c = c8 // 8
    v = jnp.take(pack, rows, axis=0).astype(jnp.float32)  # [M, 8C]
    out = jnp.zeros((rows.shape[0], c), jnp.float32)
    for k in range(8):
        out = out + v[:, k * c:(k + 1) * c] * w8[:, k:k + 1]
    return out
