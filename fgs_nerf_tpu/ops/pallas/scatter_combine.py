"""Pallas TPU kernel: blockwise one-hot accumulate with a sliding VMEM
window — the segment-accumulation phase of the deterministic scatter
(``ops.scatter._block_accumulate``).

The XLA formulation pays a batched matmul (P materialized to HBM,
~1.2 GB round trip) plus a ``lax.scan`` whose per-iteration
slice+add+update costs ~8-12 us of loop overhead on v5e.  This kernel
fuses both: each grid step loads one sorted sample block's ranks and
updates, forms the [B, B] one-hot on the fly, runs the MXU matmul, and
adds the result into a 2B-rank VMEM accumulator.  Because ranks are
non-decreasing and advance by <= 1 per sample, every block's window
[w0, w0 + B) fits the accumulator after flushing at most a few B-sized
segments to HBM — each rank row is written to HBM exactly once.

This replaces the role of the reference's CUDA scatter-add backward of
``F.grid_sample`` (`model/cuda/render_utils_kernel.cu` has no grid
backward of its own; ATen's nondeterministic atomicAdd kernel is the
analog — SURVEY.md §2.7 N11).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _combine_kernel(w0_ref, ranks_ref, upd_ref, out_ref, acc, a0_ref, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    block = acc.shape[0] // 2
    c = acc.shape[1]
    cap = out_ref.shape[0]

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        a0_ref[0] = 0

    w0 = w0_ref[b]

    # Flush completed B-segments until the block's window [w0, w0+B)
    # fits in acc's coverage [a0, a0+2B).  w0 is non-decreasing over
    # blocks, so flushed segments are final.
    def flush_cond(a0):
        return w0 >= a0 + block

    def flush_body(a0):
        dma = pltpu.make_async_copy(
            acc.at[pl.ds(0, block), :], out_ref.at[pl.ds(a0, block), :], sem
        )
        dma.start()
        dma.wait()
        acc[pl.ds(0, block), :] = acc[pl.ds(block, block), :]
        acc[pl.ds(block, block), :] = jnp.zeros((block, c), acc.dtype)
        return a0 + block

    a0 = jax.lax.while_loop(flush_cond, flush_body, a0_ref[0])
    a0_ref[0] = a0

    # One-hot MXU accumulation of this block into its window.  Ranks
    # arrive as [1, B//128, 128] (tiling-friendly); the one-hot is
    # built in that 3-D layout and collapsed to [W, B] — a pure
    # minor-dims collapse, memory-layout free.
    local = ranks_ref[0] - w0  # [B//128, 128] in [0, B)
    sub = local.shape[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (block, sub, 128), 0)
    onehot = (iota_w == local[None]).astype(jnp.bfloat16).reshape(block, block)
    contrib = jax.lax.dot_general(
        onehot, upd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [W, C]
    off = w0 - a0  # in [0, B]
    acc[pl.ds(off, block), :] += contrib

    # Final block: flush the remaining coverage and zero-fill the tail.
    @pl.when(b == nb - 1)
    def _():
        def tail_body(a0t):
            dma = pltpu.make_async_copy(
                acc.at[pl.ds(0, block), :],
                out_ref.at[pl.ds(a0t, block), :],
                sem,
            )
            dma.start()
            dma.wait()
            acc[pl.ds(0, block), :] = acc[pl.ds(block, block), :]
            acc[pl.ds(block, block), :] = jnp.zeros((block, c), acc.dtype)
            return a0t + block

        jax.lax.while_loop(lambda a0t: a0t < cap, tail_body, a0)


@functools.partial(jax.jit, static_argnames=("n_ranks_cap", "block"))
def block_accumulate_pallas(
    ranks: jnp.ndarray,  # [M] s32 non-decreasing
    upd: jnp.ndarray,  # [M, C]
    n_ranks_cap: int,
    block: int = 1024,
) -> jnp.ndarray:
    """D[rank] += upd, D zero elsewhere; returns [n_ranks_cap, C] f32.

    ``n_ranks_cap`` is rounded up to a multiple of ``block`` internally;
    callers get exactly ``n_ranks_cap`` rows back.
    """
    m, c = upd.shape
    pad = (-m) % block
    if pad:
        ranks = jnp.concatenate([ranks, jnp.full((pad,), ranks[-1], ranks.dtype)])
        upd = jnp.concatenate([upd, jnp.zeros((pad, c), upd.dtype)])
    nb = ranks.shape[0] // block
    cap = n_ranks_cap + ((-n_ranks_cap) % block)
    ranks_b = ranks.reshape(nb, block // 128, 128)
    upd_b = upd.astype(jnp.bfloat16).reshape(nb, block, c)
    w0 = jnp.minimum(ranks_b[:, 0, 0], cap - block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block // 128, 128), lambda b, w0_ref: (b, 0, 0)),
            pl.BlockSpec((1, block, c), lambda b, w0_ref: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * block, c), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _combine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0, ranks_b, upd_b)
    return out[:n_ranks_cap]
