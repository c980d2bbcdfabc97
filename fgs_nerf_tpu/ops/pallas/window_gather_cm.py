"""Pallas TPU kernel: channel-major sorted streaming window gather
over the HALF cell pack.

The round-3 sorted engine kept the sample stream in channel-last
``[M, C]`` layouts and lost ~180 ms/step to small-lane elementwise work
(PROFILE_r03.md §3).  This is the channel-major rewrite with the
half-pack refinement: the pack stores only the 4 ``(dx, dy)`` corner
groups at z-offset 0 (``[4C, Rp]``, channels on sublanes, rows on
lanes) — in the lane-strided row space the z neighbor is the NEXT ROW,
so the dz = 1 corners are served by a second one-hot shifted by one
(``local + 1``) against the same window:

    g0[4C, bs] = win[4C, bw] @ onehot(local)      # dz = 0 corners
    g1[4C, bs] = win[4C, bw] @ onehot(local + 1)  # dz = 1 corners
    out[C, bs] = sum_k2 g0[k2] * w8[2 k2] + g1[k2] * w8[2 k2 + 1]

Every dot is MXU-native ``A[m, k] @ B[k, n]``.  Halving the pack also
halves the window DMA traffic and removes the lane-misaligned z slices
from the pack build (the measured ~10 ms relayout of the full pack).
A sample is fully servable only when ``local + 1`` is still inside the
window, so the serve predicate uses ``2 bw - 1``; window starts are
scalar-prefetched, loads double-buffered, occupancy gaps completed by
an in-body DMA slide loop.  See `/root/reference/model/nerf.py:639-672`
(the CUDA `F.grid_sample` role this replaces).
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
        bs = rows_ref.shape[2]
        base = wblk_ref[b] * bw

        rows = rows_ref[0, 0]  # [bs] int32, non-decreasing
        # full service needs local + 1 in-window too; rows past that
        # are masked OUT of the fast dots (the slow path would
        # otherwise double-count their dz = 0 half)
        local_raw = rows - base
        local = jnp.where(local_raw < 2 * bw - 1, local_raw, -2)

        def serve_pair(win_a, win_b, loc):
            """dz0 + dz1 gathers of ``loc`` from the (win_a, win_b)
            double window -> ([4C, bs], [4C, bs]).

            Only the dz = 0 one-hots are BUILT (the [bw, bs] compare +
            cast is the kernel's dominant VPU cost): dz = 1 reads
            row + 1, which equals serving the SAME one-hot from the
            windows shifted left one lane — a [4C, bw] shuffle, ~8x
            smaller than a second one-hot pair."""
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (bw, bs), 0)
            oh_a = (iota_w == loc[None, :]).astype(jnp.bfloat16)
            oh_b = (iota_w == (loc[None, :] - bw)).astype(jnp.bfloat16)
            # row + 1 windows: win_a loses row 0 and gains win_b's row 0;
            # win_b's new last lane (row 2 bw) is never read (served locs
            # satisfy loc + 1 <= 2 bw - 2)
            win_a1 = jnp.concatenate([win_a[:, 1:], win_b[:, :1]], axis=1)
            win_b1 = jnp.concatenate(
                [win_b[:, 1:], jnp.zeros_like(win_b[:, :1])], axis=1
            )
            outs = []
            for wa, wb in ((win_a, win_b), (win_a1, win_b1)):
                outs.append(
                    jax.lax.dot_general(
                        wa, oh_a, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        wb, oh_b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            return outs

        g0, g1 = serve_pair(win0_ref[:], win1_ref[:], local)

        if slow_path:
            def run_slow():
                def cond(carry):
                    f, _, _ = carry
                    return f < bs

                def body(carry):
                    f, a0, a1 = carry
                    idx = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)[0]
                    unserved = idx >= f
                    w = jnp.min(jnp.where(unserved, rows, rp - 2))
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
                    # full service needs local2 + 1 in-window too
                    serve = unserved & (local2 >= 0) & (local2 < 2 * bw - 1)
                    loc = jnp.where(serve, local2, -2)
                    iota2 = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * bw, bs), 0)
                    # one one-hot; dz = 1 via the lane-shifted window
                    # (see serve_pair) — max served loc + 1 = 2 bw - 2,
                    # so the shifted window's zero last lane is unread
                    oh = (iota2 == loc[None, :]).astype(jnp.bfloat16)
                    scr = scratch[:]
                    scr1 = jnp.concatenate(
                        [scr[:, 1:], jnp.zeros_like(scr[:, :1])], axis=1
                    )
                    contribs = []
                    for src in (scr, scr1):
                        contribs.append(jax.lax.dot_general(
                            src, oh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))
                    return (
                        f + jnp.sum(serve.astype(jnp.int32)),
                        a0 + contribs[0], a1 + contribs[1],
                    )

                return jax.lax.while_loop(
                    cond, body, (f0_ref[b], g0, g1)
                )[1:]

            # the predicate is a PREFETCHED scalar: the fast path never
            # waits on a vector->scalar reduction
            g0_, g1_ = jax.lax.cond(
                f0_ref[b] < bs, run_slow, lambda: (g0, g1)
            )
        else:
            g0_, g1_ = g0, g1

        g0_3 = g0_.reshape(4, c, bs)
        g1_3 = g1_.reshape(4, c, bs)
        w8 = w8_ref[:]  # [8, bs]
        out = jnp.zeros((c, bs), jnp.float32)
        for k2 in range(4):
            out = out + g0_3[k2] * w8[2 * k2:2 * k2 + 1, :]
            out = out + g1_3[k2] * w8[2 * k2 + 1:2 * k2 + 2, :]
        out_ref[:] = out

    return kernel


@functools.partial(
    jax.jit, static_argnames=("bs", "bw", "slow_path", "interpret")
)
def sorted_window_gather_cm_pallas(
    pack: jnp.ndarray,   # [4C, Rp] bf16, Rp multiple of bw, zero column tail
    rows: jnp.ndarray,   # [M] i32 non-decreasing, <= Rp - 2 (row + 1 is read)
    w8: jnp.ndarray,     # [8, M] f32 trilinear corner weights
    bs: int = 1024,
    bw: int = 512,
    slow_path: bool = True,
    interpret: bool = False,  # run the kernel body on CPU (CI parity tests)
) -> jnp.ndarray:
    """out[:, m] = sum_k w8[k, m] * pack[(k//2)*C:(k//2+1)*C,
    rows[m] + (k & 1)] — [C, M] f32."""
    c4, rp = pack.shape
    c = c4 // 4
    m = rows.shape[0]
    assert rp % bw == 0 and m % bs == 0
    nb = m // bs
    nwb = rp // bw
    wblk = jnp.minimum(rows[::bs] // bw, nwb - 2).astype(jnp.int32)
    local = rows.reshape(nb, bs) - (wblk * bw)[:, None]
    f0 = jnp.sum(local < 2 * bw - 1, axis=1).astype(jnp.int32)

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
            pl.BlockSpec((c4, bw), lambda b, wref, fref: (0, wref[b])),
            pl.BlockSpec((c4, bw), lambda b, wref, fref: (0, wref[b] + 1)),
        ],
        out_specs=pl.BlockSpec((c, bs), lambda b, *pref: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((c4, 2 * bw), jnp.bfloat16),
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
    c4 = pack.shape[0]
    c = c4 // 4
    m = rows.shape[0]
    v0 = jnp.take(pack, rows, axis=1).astype(jnp.float32).reshape(4, c, m)
    v1 = jnp.take(pack, rows + 1, axis=1).astype(jnp.float32).reshape(4, c, m)
    out = jnp.zeros((c, m), jnp.float32)
    for k2 in range(4):
        out = out + v0[k2] * w8[2 * k2:2 * k2 + 1, :]
        out = out + v1[k2] * w8[2 * k2 + 1:2 * k2 + 2, :]
    return out
