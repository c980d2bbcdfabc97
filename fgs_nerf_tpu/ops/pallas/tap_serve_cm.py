"""Pallas TPU kernels: multi-tap sorted window serve + accumulate over
a 1-channel half cell pack — the fine stage's hierarchical tap sampler
(`/root/reference/model/nerf.py:597-637` ``sample_sdfs``) in the
channel-major sorted-stream formulation.

Key identity (see ``ops/sorted_cm.py`` for the row space): a tap of
sample s displaced by d along an axis is a STANDARD trilinear serve at
``rows[s] + delta_t[s]`` with per-tap corner weights —

* z-taps move |delta| <= 3 rows (z is the row stride-1 axis),
* y-taps move |delta| <= 2*zp + 1 rows (zp = lane-aligned z stride),
* x-taps are served from a second, x-minor linearization where the
  same bound holds with the x stride.

So ONE window pass per sorted block serves every tap: per tap t,
``loc_t = local + delta_t[s]`` and the usual dz pair of one-hots
against a WIDER window that covers ``[-maxneg, +maxpos]`` around the
block rows; window starts are positioned ``maxneg`` below the first
block row.

Weight layout: ``w8t[(t, d, k2)]`` flattened to ``[8T, M]`` — per tap
t and z-corner d, the 4 ``(dx, dy)``-group weights are CONTIGUOUS
sublanes (an aligned [4, bs] slice in kernel).

Tap coordinates are pre-clamped to the grid (the reference's tap
clamp), so real tap rows never leave the real row range; sentinel
samples carry zero weights and in-range rows.

The backward kernel mirrors ``scatter_combine_cm``: deposits
``w8_t * g_t`` at ``rows + delta_t (+ dz)`` into a sliding dense
window whose size must exceed the full tap span (asserted); output is
the 1-channel half-pack dense row space consumed by the same 4-shift
combine as the base gather's VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# forward: multi-tap window serve
# ---------------------------------------------------------------------------


def _make_tap_kernel(bw: int, rp: int, n_taps: int, maxneg: int,
                     maxpos: int, slow_path: bool):
    def kernel(wblk_ref, f0_ref, rows_ref, delta_ref, w8t_ref, pack_ref,
               win0_ref, win1_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        bs = rows_ref.shape[2]
        base = wblk_ref[b] * bw

        rows = rows_ref[0, 0]           # [bs] i32, non-decreasing
        delta = delta_ref[:]            # [T, bs] i32
        w8t = w8t_ref[:]                # [8T, bs] f32, (t, d, k2) layout
        local = rows - base

        def serve_all(win_a, win_b, loc_all, ok):
            """All taps against one (win_a|win_b) double window."""
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (bw, bs), 0)
            outs = []
            for t in range(n_taps):
                lt = jnp.where(ok, loc_all + delta[t], -(maxneg + 2))
                acc_t = jnp.zeros((1, bs), jnp.float32)
                for d in (0, 1):
                    ld = lt + d
                    oh_a = (iota_w == ld[None, :]).astype(jnp.bfloat16)
                    oh_b = (iota_w == (ld[None, :] - bw)).astype(jnp.bfloat16)
                    g = jax.lax.dot_general(
                        win_a, oh_a, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        win_b, oh_b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [4, bs]
                    w4 = w8t[8 * t + 4 * d:8 * t + 4 * d + 4]  # [4, bs]
                    acc_t = acc_t + jnp.sum(g * w4, axis=0, keepdims=True)
                outs.append(acc_t)
            return jnp.concatenate(outs, axis=0)  # [T, bs]

        # fast path: the whole tap span inside the prefetched window
        fast = (local >= maxneg) & (local + maxpos < 2 * bw - 1)
        out = serve_all(win0_ref[:], win1_ref[:], local, fast)

        if slow_path:
            def run_slow():
                def cond(carry):
                    f, _ = carry
                    return f < bs

                def body(carry):
                    f, acc = carry
                    idx = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)[0]
                    unserved = idx >= f
                    w = jnp.min(jnp.where(unserved, rows, rp - maxpos - 2))
                    qb = jnp.clip((w - maxneg) // bw, 0, rp // bw - 2)
                    dma = pltpu.make_async_copy(
                        pack_ref.at[
                            :, pl.ds(pl.multiple_of(qb * bw, bw), 2 * bw)
                        ],
                        scratch, sem,
                    )
                    dma.start()
                    dma.wait()
                    local2 = rows - qb * bw
                    serve = (
                        unserved & (local2 >= maxneg)
                        & (local2 + maxpos < 2 * bw - 1)
                    )
                    iota2 = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * bw, bs), 0
                    )
                    tap_rows = []
                    for t in range(n_taps):
                        lt = jnp.where(
                            serve, local2 + delta[t], -(maxneg + 2)
                        )
                        acc_t = jnp.zeros((1, bs), jnp.float32)
                        for d in (0, 1):
                            oh = (iota2 == (lt + d)[None, :]).astype(
                                jnp.bfloat16
                            )
                            g = jax.lax.dot_general(
                                scratch[:], oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [4, bs]
                            w4 = w8t[8 * t + 4 * d:8 * t + 4 * d + 4]
                            acc_t = acc_t + jnp.sum(
                                g * w4, axis=0, keepdims=True
                            )
                        tap_rows.append(acc_t)
                    return (
                        f + jnp.sum(serve.astype(jnp.int32)),
                        acc + jnp.concatenate(tap_rows, axis=0),
                    )

                return jax.lax.while_loop(cond, body, (f0_ref[b], out))[1]

            # prefetched scalar predicate — fast blocks never reduce
            out_ = jax.lax.cond(f0_ref[b] < bs, run_slow, lambda: out)
        else:
            out_ = out

        out_ref[:] = out_

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("maxneg", "maxpos", "bs", "bw", "slow_path", "interpret"),
)
def tap_window_serve_cm_pallas(
    pack: jnp.ndarray,    # [4, Rp] bf16, zero tail past the real rows
    rows: jnp.ndarray,    # [M] i32 non-decreasing base rows
    delta: jnp.ndarray,   # [T, M] i32 per-tap row offsets in [-maxneg, maxpos-1]
    w8t: jnp.ndarray,     # [8T, M] f32, (t, d, k2) layout
    maxneg: int,
    maxpos: int,
    bs: int = 1024,
    bw: int = 1024,
    slow_path: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[t, m] = sum_{k2, d} w8t[8t + 4d + k2, m] *
    pack[k2, rows[m] + delta[t, m] + d] — [T, M] f32."""
    c4, rp = pack.shape
    assert c4 == 4
    n_taps = delta.shape[0]
    m = rows.shape[0]
    assert rp % bw == 0 and m % bs == 0
    assert 2 * bw - 1 > maxneg + maxpos, (bw, maxneg, maxpos)
    nb = m // bs
    nwb = rp // bw
    wblk = jnp.clip((rows[::bs] - maxneg) // bw, 0, nwb - 2).astype(jnp.int32)
    local = rows.reshape(nb, bs) - (wblk * bw)[:, None]
    f0 = jnp.sum(
        (local >= maxneg) & (local + maxpos < 2 * bw - 1), axis=1
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, bs), lambda b, *pref: (b, 0, 0)),
            pl.BlockSpec((n_taps, bs), lambda b, *pref: (0, b)),
            pl.BlockSpec((8 * n_taps, bs), lambda b, *pref: (0, b)),
            pl.BlockSpec(memory_space=pl.ANY),  # whole pack (slow path)
            pl.BlockSpec((4, bw), lambda b, wref, fref: (0, wref[b])),
            pl.BlockSpec((4, bw), lambda b, wref, fref: (0, wref[b] + 1)),
        ],
        out_specs=pl.BlockSpec((n_taps, bs), lambda b, *pref: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((4, 2 * bw), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_tap_kernel(bw, rp, n_taps, maxneg, maxpos, slow_path),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_taps, m), jnp.float32),
        interpret=interpret,
    )(wblk, f0, rows.reshape(nb, 1, bs), delta, w8t, pack, pack, pack)


def tap_window_serve_cm_reference(pack, rows, delta, w8t):
    """Pure-XLA reference / CPU fallback: identical values."""
    n_taps = delta.shape[0]
    m = rows.shape[0]
    outs = []
    for t in range(n_taps):
        rt = rows + delta[t]
        acc = jnp.zeros((1, m), jnp.float32)
        for d in (0, 1):
            v = jnp.take(pack, rt + d, axis=1).astype(jnp.float32)  # [4, M]
            w4 = w8t[8 * t + 4 * d:8 * t + 4 * d + 4]
            acc = acc + jnp.sum(v * w4, axis=0, keepdims=True)
        outs.append(acc)
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# backward: multi-tap dense accumulate
# ---------------------------------------------------------------------------


def _make_tap_acc_kernel(n_taps: int, maxneg: int, maxpos: int, win: int,
                         out_dtype=None):
    """``win`` (window rows) is DECOUPLED from the sample block: the
    tap span needs ``win >= maxneg + maxpos + block + 1`` while the
    one-hot [block, win] must stay inside the scoped-VMEM stack (a
    [2B, 2B] coupling at B~2048 was 16+ MB per one-hot and OOMed)."""

    def kernel(rows_ref, delta_ref, w8t_ref, g_ref, zeros_ref, out_ref,
               acc, *rest):
        del zeros_ref  # aliased INTO out_ref (pre-zeroed skip regions)
        if out_dtype is not None:
            lo, a0_ref, sem = rest
        else:
            lo = None
            a0_ref, sem = rest
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        block = g_ref.shape[1]
        cap = out_ref.shape[0] * block
        sub = block // 128

        @pl.when(b == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            a0_ref[0] = 0

        rows2 = rows_ref[0]   # [sub, 128] i32, non-decreasing flat
        idx2 = (
            jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        )
        delta_all = delta_ref[:]  # [T, 1, sub, 128] (natural row tiles)
        g_blk = g_ref[:]          # [T, block]
        w8t = w8t_ref[:]          # [8T, block]

        def flush(a0):
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
            acc[:, pl.ds(0, win - block)] = acc[:, pl.ds(block, win - block)]
            acc[:, pl.ds(win - block, block)] = jnp.zeros(
                (4, block), acc.dtype
            )
            return a0 + block

        def cond(carry):
            f, _ = carry
            return f < block

        def body(carry):
            f, a0 = carry
            unserved = idx2 >= f
            w = jnp.min(jnp.where(unserved, rows2, 2**30))
            # TELEPORT over large occupancy gaps: once the whole live
            # window is strictly behind the next deposit span, flush the
            # dirty rows and JUMP a0 — skipped rows stay at the
            # pre-zeroed aliased output, so sparse streams pay flush
            # DMAs only for touched windows, not cap/block of them.
            def teleport(a0):
                a0 = jax.lax.while_loop(
                    lambda a: a < a0 + win, flush, a0
                )
                return ((w - maxneg) // block) * block

            a0 = jax.lax.cond(
                w - maxneg >= a0 + win + block, teleport, lambda a: a, a0
            )
            # slide until the whole tap span of w fits the window
            a0 = jax.lax.while_loop(
                lambda a: w + maxpos - a >= win - 1, flush, a0
            )
            serve2 = unserved & (rows2 + maxpos < a0 + win - 1)
            # one-hots straight from the natural [sub, 128] tiles (see
            # scatter_combine_cm: a [B, 1]/[B, T] column input would
            # physically lane-pad to 512 B/sample in HBM)
            iota3 = jax.lax.broadcasted_iota(
                jnp.int32, (sub, 128, win), 2
            )
            for t in range(n_taps):
                dt = delta_all[t, 0]
                loc2 = jnp.where(serve2, rows2 + dt - a0, -2)
                gt = g_blk[t:t + 1]  # [1, block]
                contrib = None
                for d in (0, 1):
                    oh = (iota3 == (loc2 + d)[:, :, None]).astype(
                        jnp.bfloat16
                    ).reshape(block, win)
                    upd = (
                        w8t[8 * t + 4 * d:8 * t + 4 * d + 4] * gt
                    ).astype(jnp.bfloat16)  # [4, block]
                    term = jax.lax.dot_general(
                        upd, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    contrib = term if contrib is None else contrib + term
                # per-tap accumulation keeps at most one [block, win]
                # one-hot live at a time (scoped-VMEM stack budget)
                acc[:, :] += contrib
            return f + jnp.sum(serve2.astype(jnp.int32)), a0

        _, a0 = jax.lax.while_loop(cond, body, (jnp.int32(0), a0_ref[0]))
        a0_ref[0] = a0

        # final block: flush only the DIRTY window (the zero-aliased
        # output already covers everything else)
        @pl.when(b == nb - 1)
        def _():
            jax.lax.while_loop(
                lambda a: a < jnp.minimum(a0 + win, cap), flush, a0
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_cap", "maxneg", "maxpos", "block", "interpret",
                     "out_dtype"),
)
def tap_dense_accumulate_cm_pallas(
    rows: jnp.ndarray,   # [M] i32 non-decreasing base rows
    delta: jnp.ndarray,  # [T, M] i32
    w8t: jnp.ndarray,    # [8T, M] f32, (t, d, k2) layout
    g: jnp.ndarray,      # [T, M] tap cotangents
    n_rows_cap: int,
    maxneg: int,
    maxpos: int,
    block: int = 512,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """D[k2, row + delta_t + d] += w8t[8t+4d+k2] * g[t]; [4, cap].

    ``out_dtype=bfloat16`` halves the dense buffer (fp32 VMEM
    accumulation, one rounding per row at flush)."""
    n_taps = delta.shape[0]
    m = rows.shape[0]
    # the window must hold the whole tap span of any sample while the
    # slide keeps the earliest (most-negative) deposit in range
    win = ((maxneg + maxpos + block + 130 + 127) // 128) * 128
    pad = (-m) % block
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad,), rows[-1], rows.dtype)])
        delta = jnp.pad(delta, ((0, 0), (0, pad)))
        w8t = jnp.pad(w8t, ((0, 0), (0, pad)))
        g = jnp.pad(g, ((0, 0), (0, pad)))
    mp = rows.shape[0]
    nb = mp // block
    cap = n_rows_cap + ((-n_rows_cap) % block)

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, block // 128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((n_taps, 1, block // 128, 128),
                         lambda b: (0, b, 0, 0)),
            pl.BlockSpec((8 * n_taps, block), lambda b: (0, b)),
            pl.BlockSpec((n_taps, block), lambda b: (0, b)),
            pl.BlockSpec(memory_space=pl.ANY),  # zero-aliased output
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, win), jnp.float32),
        ] + (
            [pltpu.VMEM((4, block), out_dtype)]
            if out_dtype != jnp.float32 else []
        ) + [
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _make_tap_acc_kernel(
            n_taps, maxneg, maxpos, win,
            out_dtype=None if out_dtype == jnp.float32 else out_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap // block, 4, block), out_dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
        input_output_aliases={4: 0},
    )(
        rows.reshape(nb, block // 128, 128),
        delta.reshape(n_taps, nb, block // 128, 128),
        w8t.astype(jnp.float32),
        g.astype(jnp.float32),
        jnp.zeros((cap // block, 4, block), out_dtype),
    )
    return jnp.transpose(out, (1, 0, 2)).reshape(4, cap)[:, :n_rows_cap]


def tap_dense_accumulate_cm_reference(rows, delta, w8t, g, n_rows_cap):
    """Pure-XLA reference / CPU fallback."""
    n_taps = delta.shape[0]
    dense = jnp.zeros((n_rows_cap, 4), jnp.float32)
    for t in range(n_taps):
        rt = rows + delta[t]
        for d in (0, 1):
            upd = (
                w8t[8 * t + 4 * d:8 * t + 4 * d + 4]
                * g[t:t + 1]
            ).T.astype(jnp.float32)  # [M, 4]
            dense = dense.at[rt + d].add(upd)
    return dense.T
