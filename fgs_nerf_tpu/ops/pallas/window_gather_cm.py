"""Pallas TPU kernel: channel-major sorted streaming window gather.

The round-3 sorted engine kept the sample stream in channel-last
``[M, C]`` layouts and lost ~180 ms/step to small-lane elementwise work
(PROFILE_r03.md §3).  This is the prescribed channel-major rewrite: the
pack lives as ``[8C, Rp]`` (channels on sublanes, rows on lanes), the
serve emits ``[C, M]``, and every dot is in the MXU-native
``A[m, k] @ B[k, n]`` orientation:

    g[8C, bs] = win[8C, bw] @ onehot[bw, bs]
    out[C, bs] = sum_k g[k] * w8[k]          (free reshape [8, C, bs])

With the render field's C = 16 the pack's 8C = 128 fills the sublane
tile exactly.  Structure (scalar-prefetched window starts, double
bufferred window blocks, precomputed slow-path predicate, DMA slide
loop for occupancy gaps) mirrors ``window_gather.py``; see that module
and `/root/reference/model/nerf.py:639-672` (the CUDA `F.grid_sample`
role this replaces).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(bw: int, c: int, rp: int, slow_path: bool):
    c8 = 8 * c

    def kernel(wblk_ref, f0_ref, rows_ref, w8_ref, pack_ref,
               win0_ref, win1_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        bs = rows_ref.shape[2]
        base = wblk_ref[b] * bw

        rows = rows_ref[0, 0]  # [bs] int32, non-decreasing
        local = rows - base
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (bw, bs), 0)
        oh0 = (iota_w == local[None, :]).astype(jnp.bfloat16)
        oh1 = (iota_w == (local[None, :] - bw)).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            win0_ref[:], oh0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            win1_ref[:], oh1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8C, bs]

        if slow_path:
            def run_slow():
                def cond(carry):
                    f, _ = carry
                    return f < bs

                def body(carry):
                    f, acc = carry
                    idx = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)[0]
                    unserved = idx >= f
                    w = jnp.min(jnp.where(unserved, rows, rp))
                    qb = jnp.minimum(w // bw, rp // bw - 2)
                    dma = pltpu.make_async_copy(
                        pack_ref.at[
                            :, pl.ds(pl.multiple_of(qb * bw, bw), 2 * bw)
                        ],
                        scratch, sem,
                    )
                    dma.start()
                    dma.wait()
                    local2 = rows - qb * bw
                    serve = unserved & (local2 >= 0) & (local2 < 2 * bw)
                    loc = jnp.where(serve, local2, -1)
                    iota2 = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * bw, bs), 0)
                    oh = (iota2 == loc[None, :]).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        scratch[:], oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return f + jnp.sum(serve.astype(jnp.int32)), acc + contrib

                return jax.lax.while_loop(cond, body, (f0_ref[b], g))[1]

            # the predicate is a PREFETCHED scalar: the fast path never
            # waits on a vector->scalar reduction
            g = jax.lax.cond(f0_ref[b] < bs, run_slow, lambda: g)

        g3 = g.reshape(8, c, bs)
        w8 = w8_ref[:]  # [8, bs]
        out = jnp.zeros((c, bs), jnp.float32)
        for k in range(8):
            out = out + g3[k] * w8[k:k + 1, :]
        out_ref[:] = out

    return kernel


@functools.partial(
    jax.jit, static_argnames=("bs", "bw", "slow_path", "interpret")
)
def sorted_window_gather_cm_pallas(
    pack: jnp.ndarray,   # [8C, Rp] bf16, Rp multiple of bw, zero column tail
    rows: jnp.ndarray,   # [M] i32 non-decreasing; sentinels -> zero tail
    w8: jnp.ndarray,     # [8, M] f32 trilinear corner weights
    bs: int = 1024,
    bw: int = 512,
    slow_path: bool = True,
    interpret: bool = False,  # run the kernel body on CPU (CI parity tests)
) -> jnp.ndarray:
    """out[:, m] = sum_k w8[k, m] * pack[k*C:(k+1)*C, rows[m]] — [C, M]."""
    c8, rp = pack.shape
    c = c8 // 8
    m = rows.shape[0]
    assert rp % bw == 0 and m % bs == 0
    nb = m // bs
    nwb = rp // bw
    wblk = jnp.minimum(rows[::bs] // bw, nwb - 2).astype(jnp.int32)
    local = rows.reshape(nb, bs) - (wblk * bw)[:, None]
    f0 = jnp.sum(local < 2 * bw, axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            # (1, 1, bs): the trailing two block dims equal the array
            # dims, satisfying the Mosaic (8, 128)-divisibility rule
            # while keeping the sample dim on lanes
            pl.BlockSpec((1, 1, bs), lambda b, *pref: (b, 0, 0)),
            pl.BlockSpec((8, bs), lambda b, *pref: (0, b)),
            pl.BlockSpec(memory_space=pl.ANY),  # whole pack (slow path)
            pl.BlockSpec((c8, bw), lambda b, wref, fref: (0, wref[b])),
            pl.BlockSpec((c8, bw), lambda b, wref, fref: (0, wref[b] + 1)),
        ],
        out_specs=pl.BlockSpec((c, bs), lambda b, *pref: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((c8, 2 * bw), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(bw, c, rp, slow_path),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, m), jnp.float32),
        interpret=interpret,
    )(wblk, f0, rows.reshape(nb, 1, bs), w8, pack, pack, pack)


def sorted_window_gather_cm_reference(pack, rows, w8):
    """Pure-XLA reference / CPU fallback: identical values."""
    c8 = pack.shape[0]
    c = c8 // 8
    v = jnp.take(pack, rows, axis=1).astype(jnp.float32)  # [8C, M]
    v8 = v.reshape(8, c, rows.shape[0])
    out = jnp.zeros((c, rows.shape[0]), jnp.float32)
    for k in range(8):
        out = out + v8[k] * w8[k:k + 1, :]
    return out
