"""Pallas TPU kernel: channel-major sorted scatter-add with in-kernel
update construction — the backward accumulate of the channel-major
sorted engine (mirror of ``scatter_combine.py``; see that module for
the sliding-window scheme and `/root/reference/model/nerf.py:639-672`
/ SURVEY.md §2.7 N11 for the CUDA role).

Differences from the row-major kernel:

* **Updates are built in VMEM from their factors.**  The grid update of
  sample s is the outer product ``w8[k, s] * g[c, s]`` (corner weight x
  output cotangent).  The row-major kernel streams the materialized
  ``[M, 8C]`` product from HBM (~600 MB bf16 at the bench shape); here
  the kernel reads ``w8 [8, M]`` + ``g [C, M]`` (~190 MB f32) and forms
  the block products on-chip — the update tensor never exists in HBM.
* **Half-pack row space.**  Mirroring ``window_gather_cm``, only the 4
  ``(dx, dy)`` corner groups have channels; the dz pair deposits into
  rows r (dz = 0) and r + 1 (dz = 1) of the same group — two shifted
  one-hots:

      contrib[4C, 2B] = upd0 @ onehot(loc) + upd1 @ onehot(loc + 1)

* **Full-window serve.**  The accumulator is ``[4C, 2B]`` channel-major
  and every serve iteration covers the whole window with native dots —
  no dynamic vector offsets (a sample is servable when ``loc + 1`` is
  still inside, hence the ``2B - 1`` bounds).
* Rows are passed twice: lane-major ``[sub, 128]`` for the masked-min
  window computation, column ``[B, 1]`` so the one-hot compare puts the
  sample dim on sublanes without an in-kernel relayout.
* Flushes DMA whole ``[4C, B]`` blocks to the LEADING dim of a
  ``[cap//B, 4C, B]`` output — the one DMA-destination form the Mosaic
  compiler accepts here (dynamic minor-dim offsets and static
  middle-dim indices both crash it; bisected on hardware).

Output is reassembled to channel-major dense ``[4C, cap]`` f32; every
dense row is written exactly once (gaps flush zeros).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dense_cm_kernel(rows_ref, w8e_ref, w8o_ref, g_ref, zeros_ref, out_ref,
                     acc, lo, a0_ref, sem, g_sub=1):
    del zeros_ref  # aliased INTO out_ref (pre-zeroed skip regions)
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    c4 = acc.shape[0]
    c = c4 // 4
    block = acc.shape[1] // 2
    cap = out_ref.shape[0] * block
    sub = block // 128

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        a0_ref[0] = 0

    def flush(a0):
        # fp32 VMEM accumulation; a narrower out dtype (the fine-stage
        # 256^3 memory valve) rounds each dense row once at flush
        if lo is not None:
            lo[:] = acc[:, pl.ds(0, block)].astype(lo.dtype)
            src = lo
        else:
            src = acc.at[:, pl.ds(0, block)]
        dma = pltpu.make_async_copy(
            src, out_ref.at[a0 // block], sem
        )
        dma.start()
        dma.wait()
        acc[:, pl.ds(0, block)] = acc[:, pl.ds(block, block)]
        acc[:, pl.ds(block, block)] = jnp.zeros((c4, block), acc.dtype)
        return a0 + block

    idx2 = (
        jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
    )

    def cond(carry):
        f, _ = carry
        return f < block

    # g_sub sub-blocks per grid step (unrolled): amortizes the
    # per-grid-step pipeline cost (4 small input DMAs + prologue,
    # measured ~2-3 us/step) over g_sub serve loops while keeping the
    # one-hot volume at the B=512 sweet spot
    rows_all = rows_ref[0]  # [g_sub*sub, 128] i32, non-decreasing flat
    g_all = g_ref[:]
    w8e_all = w8e_ref[:]
    w8o_all = w8o_ref[:]
    a0_carry = a0_ref[0]
    for gs in range(g_sub):
        rows2 = rows_all[gs * sub:(gs + 1) * sub]
        g_blk = g_all[:, gs * block:(gs + 1) * block]
        # per-sub-block outer-product updates (dz = 0 / 1), built in VMEM
        upd0 = (
            w8e_all[:, gs * block:(gs + 1) * block][:, None, :]
            * g_blk[None, :, :]
        ).reshape(c4, block).astype(jnp.bfloat16)
        upd1 = (
            w8o_all[:, gs * block:(gs + 1) * block][:, None, :]
            * g_blk[None, :, :]
        ).reshape(c4, block).astype(jnp.bfloat16)

        def body(carry, rows2=rows2, upd0=upd0, upd1=upd1):
            f, a0 = carry
            unserved = idx2 >= f
            w = jnp.min(jnp.where(unserved, rows2, 2**30))
            # TELEPORT over large occupancy gaps (see tap_serve_cm):
            # flush the dirty window, then jump — skipped rows stay at
            # the pre-zeroed aliased output.  Inert on dense streams.
            def teleport(a0):
                a0 = jax.lax.while_loop(
                    lambda a: a < a0 + 2 * block, flush, a0
                )
                return (w // block) * block

            a0 = jax.lax.cond(
                w >= a0 + 3 * block, teleport, lambda a: a, a0
            )
            # slide until rows w and w + 1 both fit the 2B window at a0
            a0 = jax.lax.while_loop(
                lambda a: w - a >= 2 * block - 1, flush, a0
            )
            serve2 = unserved & (rows2 < a0 + 2 * block - 1)  # [sub, 128]
            loc2 = jnp.where(serve2, rows2 - a0, -2)
            # ONE one-hot straight from the natural [sub, 128] tile: the
            # 3-D iota puts rows on the minor (2B, lane-aligned) dim and
            # the contiguous reshape restores [B(s), 2B(r)].  The dz = 1
            # deposit (row loc + 1) reuses it: shift the [4C, 2B] dot
            # RESULT right one lane — ~8x less VPU work than a second
            # [B, 2B] compare + cast.  Column 2B - 1 of the unshifted
            # dz = 1 product corresponds to loc = 2B - 1, which the
            # serve predicate excludes, so dropping it is exact.
            iota3 = jax.lax.broadcasted_iota(
                jnp.int32, (sub, 128, 2 * block), 2
            )
            oh0 = (iota3 == loc2[:, :, None]).astype(jnp.bfloat16).reshape(
                block, 2 * block
            )
            c0 = jax.lax.dot_general(
                upd0, oh0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            c1 = jax.lax.dot_general(
                upd1, oh0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            contrib = c0 + jnp.concatenate(
                [jnp.zeros_like(c1[:, :1]), c1[:, :-1]], axis=1
            )  # [4C, 2B]
            acc[:, :] += contrib
            # rows are sorted: the served set is the contiguous run at f
            return f + jnp.sum(serve2.astype(jnp.int32)), a0

        _, a0_carry = jax.lax.while_loop(
            cond, body, (jnp.int32(0), a0_carry)
        )
    a0_ref[0] = a0_carry

    # final block: flush only the dirty window (the zero-aliased
    # output already covers the tail)
    @pl.when(b == nb - 1)
    def _():
        jax.lax.while_loop(
            lambda a: a < jnp.minimum(a0_carry + 2 * block, cap), flush,
            a0_carry,
        )


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_cap", "block", "interpret", "out_dtype",
                     "g_sub"),
)
def dense_accumulate_cm_pallas(
    rows: jnp.ndarray,  # [M] s32 non-decreasing, rows + 1 < n_rows_cap
    w8: jnp.ndarray,    # [8, M] corner weights (zero => no deposit)
    g: jnp.ndarray,     # [C, M] output cotangent
    n_rows_cap: int,
    block: int = 512,
    interpret: bool = False,  # run the kernel body on CPU (CI parity tests)
    out_dtype=jnp.float32,
    g_sub: int = 4,  # 512-sample sub-blocks per grid step
) -> jnp.ndarray:
    """D[k2*C+c, row + dz] += w8[2 k2 + dz, s] * g[c, s]; returns
    [4C, cap] channel-major (half-pack row space).

    ``out_dtype=bfloat16`` halves the dense buffer (fp32 VMEM
    accumulation, one rounding per row at flush) — the memory valve for
    fine-stage 256^3 grids whose f32 buffer is ~6 GB.  ``g_sub`` serve
    loops share one grid step (larger, fewer input DMAs)."""
    c = g.shape[0]
    c4 = 4 * c
    m = rows.shape[0]
    step = g_sub * block
    pad = (-m) % step
    if pad:
        # padded samples repeat the last row with zero weights
        rows = jnp.concatenate([rows, jnp.full((pad,), rows[-1], rows.dtype)])
        w8 = jnp.pad(w8, ((0, 0), (0, pad)))
        g = jnp.pad(g, ((0, 0), (0, pad)))
    mp = rows.shape[0]
    nb = mp // step
    cap = n_rows_cap + ((-n_rows_cap) % block)

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, step // 128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((4, step), lambda b: (0, b)),
            pl.BlockSpec((4, step), lambda b: (0, b)),
            pl.BlockSpec((c, step), lambda b: (0, b)),
            pl.BlockSpec(memory_space=pl.ANY),  # zero-aliased output
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((c4, 2 * block), jnp.float32),
        ] + (
            [pltpu.VMEM((c4, block), out_dtype)]
            if out_dtype != jnp.float32 else []
        ) + [
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    if out_dtype != jnp.float32:
        kernel = functools.partial(_dense_cm_kernel, g_sub=g_sub)
    else:
        kernel = (
            lambda r, we, wo, gr, z, o, acc, a0, sem: _dense_cm_kernel(
                r, we, wo, gr, z, o, acc, None, a0, sem, g_sub=g_sub
            )
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap // block, c4, block), out_dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
        input_output_aliases={4: 0},
    )(
        rows.reshape(nb, step // 128, 128),
        w8[0::2].astype(jnp.float32),
        w8[1::2].astype(jnp.float32),
        g.astype(jnp.float32),
        jnp.zeros((cap // block, c4, block), out_dtype),
    )
    # [cap//B, c4, B] -> [c4, cap]: a major-dim permutation (the
    # (sublane, lane) tiling is untouched) followed by a free merge —
    # one tile-granular bandwidth-bound copy
    return jnp.transpose(out, (1, 0, 2)).reshape(c4, cap)[:, :n_rows_cap]


def dense_accumulate_cm_reference(rows, w8, g, n_rows_cap):
    """Pure-XLA reference / CPU fallback: identical accumulation order
    per row (XLA scatter applies updates serially in operand order)."""
    c = g.shape[0]
    m = rows.shape[0]
    upd0 = (w8[0::2][:, None, :] * g[None, :, :]).reshape(4 * c, m)
    upd1 = (w8[1::2][:, None, :] * g[None, :, :]).reshape(4 * c, m)
    dense = (
        jnp.zeros((n_rows_cap, 4 * c), jnp.float32)
        .at[rows]
        .add(upd0.T.astype(jnp.float32))
        .at[rows + 1]
        .add(upd1.T.astype(jnp.float32))
    )
    return dense.T
