"""Pallas TPU kernel: sorted scatter-add straight into the dense row
space — the accumulation phase of the deterministic grid-gradient
scatter (``ops.scatter.corner_scatter_grid_grad``).

Input is the sample stream sorted by dense (padded-grid) row.  Each
grid step consumes one block of B samples and serves them in row order
through a sliding 2B-row VMEM accumulator:

* ``w`` = smallest unserved row of the block (a masked min — no
  dynamic scalar indexing needed);
* rows in ``[w, w + B)`` are accumulated in ONE one-hot MXU matmul
  ``onehot[B, B] @ upd[B, C]`` added at offset ``w - a0``;
* when the window outruns the accumulator, completed B-row segments
  are flushed to HBM (every dense row is written exactly once over the
  whole run — gaps flush as zeros — so the total flush traffic is the
  output size, independent of the gap structure).

Compared to the previous rank-compressed scheme this writes the dense
[R, C] buffer directly, eliminating the rank-map scatter and the
rank->dense expansion gather that dominated the backward
(~25 ms/step at the coarse bench workload, see BASELINE.md).

This plays the role of ATen's nondeterministic atomicAdd grid backward
of ``F.grid_sample`` in the reference (SURVEY.md §2.7 N11).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _dense_kernel(rows_ref, upd_ref, out_ref, acc, lo, a0_ref, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    block = acc.shape[0] // 2
    c = acc.shape[1]
    cap = out_ref.shape[0]
    sub = block // 128

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        a0_ref[0] = 0

    rows2 = rows_ref[0]  # [sub, 128] int32, non-decreasing in flat order
    idx2 = (
        jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
    )

    def flush(a0):
        # accumulation stays fp32 in VMEM; a narrower out dtype (the
        # memory valve for fine-stage 256^3 buffers) rounds each dense
        # row ONCE at flush time
        if lo is not None:
            lo[:] = acc[pl.ds(0, block), :].astype(lo.dtype)
            src = lo
        else:
            src = acc.at[pl.ds(0, block), :]
        # a0 only ever advances by `block`; the hint lets Mosaic prove
        # the HBM destination offset is tile-aligned (bf16 sublane
        # packing needs 16-row alignment it cannot infer from SMEM)
        dma = pltpu.make_async_copy(
            src, out_ref.at[pl.ds(pl.multiple_of(a0, block), block), :], sem
        )
        dma.start()
        dma.wait()
        acc[pl.ds(0, block), :] = acc[pl.ds(block, block), :]
        acc[pl.ds(block, block), :] = jnp.zeros((block, c), acc.dtype)
        return a0 + block

    def cond(carry):
        f, _ = carry
        return f < block

    def body(carry):
        f, a0 = carry
        unserved = idx2 >= f
        w = jnp.min(jnp.where(unserved, rows2, 2**30))
        # Quantize the serve base to a sublane multiple so the dynamic
        # accumulator offset below is provably 8-aligned (Mosaic rejects
        # unaligned dynamic vector loads for block sizes where the
        # [B, C] access lowers to a single vector op).  Serving from w8
        # instead of w only shrinks the covered range by w - w8 < 8
        # rows, all of which are already-served (< w) and thus excluded
        # by ``unserved`` anyway.
        w8 = (w // 8) * 8
        # slide the accumulator until [w8, w8 + B) fits at offset <= B
        a0 = jax.lax.while_loop(lambda a: w8 - a > block, flush, a0)
        serve = unserved & (rows2 < w8 + block)
        local = jnp.where(serve, rows2 - w8, -1)  # [sub, 128] in [0, B)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (block, sub, 128), 0)
        onehot = (iota_w == local[None]).astype(jnp.bfloat16).reshape(block, block)
        contrib = jax.lax.dot_general(
            onehot, upd_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, C]
        off = pl.multiple_of(w8 - a0, 8)  # in [0, B]
        acc[pl.ds(off, block), :] += contrib
        # rows are sorted, so the served set is the contiguous run at f
        return f + jnp.sum(serve.astype(jnp.int32)), a0

    _, a0 = jax.lax.while_loop(cond, body, (jnp.int32(0), a0_ref[0]))
    a0_ref[0] = a0

    # final block: flush the remaining coverage (zeros fill the tail)
    @pl.when(b == nb - 1)
    def _():
        jax.lax.while_loop(lambda a: a < cap, flush, a0)


@functools.partial(
    jax.jit, static_argnames=("n_rows_cap", "block", "interpret", "out_dtype")
)
def dense_accumulate_pallas(
    rows: jnp.ndarray,  # [M] s32 non-decreasing dense-row ids, < n_rows_cap
    upd: jnp.ndarray,  # [M, C]
    n_rows_cap: int,
    block: int = 2048,
    interpret: bool = False,  # run the kernel body on CPU (CI parity tests)
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """D[row] += upd, D zero elsewhere; returns [n_rows_cap, C] f32.

    ``n_rows_cap`` is rounded up to a multiple of ``block`` internally;
    callers get exactly ``n_rows_cap`` rows back.

    ``out_dtype=bfloat16`` halves the dense buffer (accumulation is
    still fp32 in VMEM; each row is rounded once at flush) — used when
    the dense row space is huge (fine-stage 256^3 grids).
    """
    m, c0 = upd.shape
    # lane tiling: VMEM slices and DMA shapes must be 128-wide multiples
    cpad = (-c0) % 128
    if cpad:
        upd = jnp.concatenate([upd, jnp.zeros((m, cpad), upd.dtype)], axis=-1)
    c = c0 + cpad
    pad = (-m) % block
    if pad:
        # padded samples repeat the last row with zero updates
        rows = jnp.concatenate([rows, jnp.full((pad,), rows[-1], rows.dtype)])
        upd = jnp.concatenate([upd, jnp.zeros((pad, c), upd.dtype)])
    nb = rows.shape[0] // block
    cap = n_rows_cap + ((-n_rows_cap) % block)
    rows_b = rows.reshape(nb, block // 128, 128)
    upd_b = upd.astype(jnp.bfloat16).reshape(nb, block, c)

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block // 128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, block, c), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * block, c), jnp.float32),
        ] + (
            [pltpu.VMEM((block, c), out_dtype)]
            if out_dtype != jnp.float32 else []
        ) + [
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = _dense_kernel
    if out_dtype == jnp.float32:
        kernel = functools.partial(_dense_f32_kernel)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, c), out_dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rows_b, upd_b)
    return out[:n_rows_cap, :c0]


def _dense_f32_kernel(rows_ref, upd_ref, out_ref, acc, a0_ref, sem):
    return _dense_kernel(rows_ref, upd_ref, out_ref, acc, None, a0_ref, sem)
