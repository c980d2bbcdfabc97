"""Interpret-mode CI coverage for the Mosaic kernel BODIES.

The CPU suite normally exercises only the XLA reference fallbacks of
the Pallas kernels — a bad edit to a kernel body would ship green and
surface on real TPU as a silently wrong *number* (VERDICT r3 weak #3).
These tests run the actual kernel functions under
``pl.pallas_call(..., interpret=True)`` on CPU against the references,
over the structurally hard cases: occupancy gaps that force the DMA
slide loop, sentinel rows in the zero tail, block boundaries, flush
cadence, and the final-block tail.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fgs_nerf_tpu.ops.pallas.scatter_combine import dense_accumulate_pallas
from fgs_nerf_tpu.ops.pallas.scatter_combine_cm import (
    dense_accumulate_cm_pallas,
    dense_accumulate_cm_reference,
)
from fgs_nerf_tpu.ops.pallas.window_gather_cm import (
    sorted_window_gather_cm_pallas,
    sorted_window_gather_cm_reference,
)


BS, BW = 256, 128  # small blocks keep interpret mode fast
C = 16


def _pack(rng, rp):
    # HALF pack: 4 (dx, dy) corner groups; the serve reads rows r and
    # r + 1 (the dz pair), so the zero tail covers both
    pack = rng.normal(size=(4 * C, rp)).astype(np.float32)
    pack[:, -BW:] = 0.0  # zero tail for sentinels
    return jnp.asarray(pack.astype(jnp.bfloat16))


def _w8(rng, m):
    return jnp.asarray(rng.uniform(0.0, 1.0, size=(8, m)).astype(np.float32))


def _run_gather(pack, rows, w8):
    got = sorted_window_gather_cm_pallas(
        pack, rows, w8, bs=BS, bw=BW, interpret=True
    )
    want = sorted_window_gather_cm_reference(pack, rows, w8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_window_gather_cm_fast_path_dense_rows():
    """Contiguous sorted rows: every block served by its fast window."""
    rng = np.random.default_rng(0)
    rp = 16 * BW
    m = 4 * BS
    rows = jnp.asarray(np.sort(rng.integers(0, 2 * BW - 4, size=m))
                       .astype(np.int32))
    _run_gather(_pack(rng, rp), rows, _w8(rng, m))


def test_window_gather_cm_slow_path_gaps():
    """Rows jumping far past the fast window force the DMA slide loop
    (multiple iterations within one sample block)."""
    rng = np.random.default_rng(1)
    rp = 32 * BW
    m = 2 * BS
    # three clusters separated by >> 2*BW rows, all inside one bs block
    clusters = np.concatenate([
        rng.integers(0, BW, size=m // 2),
        rng.integers(10 * BW, 11 * BW, size=m // 4),
        rng.integers(25 * BW, 26 * BW, size=m - m // 2 - m // 4),
    ])
    rows = jnp.asarray(np.sort(clusters).astype(np.int32))
    _run_gather(_pack(rng, rp), rows, _w8(rng, m))


def test_window_gather_cm_sentinels_and_boundaries():
    """Sentinel rows (zero tail) mixed with rows at exact window/block
    boundaries gather exact zeros / correct values."""
    rng = np.random.default_rng(2)
    rp = 16 * BW
    m = 2 * BS
    vals = np.concatenate([
        np.full(8, 0), np.full(8, BW - 1), np.full(8, BW),
        np.full(8, 2 * BW - 1), np.full(8, 2 * BW),
        rng.integers(0, 14 * BW, size=m - 48),
        np.full(8, rp - 2),  # sentinel in the zero tail (r + 1 is read)
    ])
    rows = jnp.asarray(np.sort(vals).astype(np.int32))
    pack = _pack(rng, rp)
    w8 = _w8(rng, m)
    _run_gather(pack, rows, w8)
    # sentinel outputs are exact zeros
    got = sorted_window_gather_cm_pallas(
        pack, rows, w8, bs=BS, bw=BW, interpret=True
    )
    n_sent = 8
    assert np.all(np.asarray(got)[:, -n_sent:] == 0.0)


def _run_accum_cm(rows, w8, g, cap, block=BS):
    got = dense_accumulate_cm_pallas(
        rows, w8, g, cap, block=block, interpret=True
    )
    # exact model of the kernel: bf16-rounded outer-product updates
    # (half-pack layout: dz pair deposits at rows r and r + 1), fp32
    # accumulation (tolerance covers reassociation only)
    m = rows.shape[0]
    c4 = 4 * g.shape[0]
    upd0 = ((w8[0::2][:, None, :] * g[None, :, :]).reshape(c4, m)
            .astype(jnp.bfloat16).astype(jnp.float32))
    upd1 = ((w8[1::2][:, None, :] * g[None, :, :]).reshape(c4, m)
            .astype(jnp.bfloat16).astype(jnp.float32))
    want_bf16 = (
        jnp.zeros((cap, c4), jnp.float32)
        .at[rows].add(upd0.T).at[rows + 1].add(upd1.T).T
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_bf16), rtol=1e-3, atol=1e-3
    )
    # and the fp32 CPU fallback agrees to bf16 rounding noise scaled by
    # the worst per-row duplicate count
    want_f32 = dense_accumulate_cm_reference(rows, w8, g, cap)
    dup = int(np.bincount(np.asarray(rows), minlength=cap).max())
    scale = float(np.abs(np.asarray(want_f32)).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_f32),
        atol=2e-2 * scale * max(np.sqrt(dup), 1.0) / 4, rtol=2e-2,
    )


def test_dense_accumulate_cm_dense_rows():
    rng = np.random.default_rng(3)
    m = 3 * BS
    cap = 4 * BS
    rows = jnp.asarray(np.sort(rng.integers(0, cap - 2, size=m))
                       .astype(np.int32))
    _run_accum_cm(rows, _w8(rng, m),
                  jnp.asarray(rng.normal(size=(C, m)).astype(np.float32)),
                  cap)


def test_dense_accumulate_cm_gaps_and_duplicates():
    """Large row gaps (multi-flush slides), heavy duplicates (one-hot
    columns with many hits), and a cap tail past the last row."""
    rng = np.random.default_rng(4)
    m = 2 * BS
    cap = 40 * BS
    vals = np.concatenate([
        np.full(m // 2, 7),                      # duplicate burst
        rng.integers(20 * BS, 21 * BS, size=m // 4),
        np.full(m - m // 2 - m // 4, 33 * BS),   # far cluster
    ])
    rows = jnp.asarray(np.sort(vals).astype(np.int32))
    _run_accum_cm(rows, _w8(rng, m),
                  jnp.asarray(rng.normal(size=(C, m)).astype(np.float32)),
                  cap)


def test_dense_accumulate_cm_bf16_flush():
    """The cm accumulate's bf16-flush variant (fine-stage memory
    valve): fp32 VMEM accumulation, one rounding per dense row."""
    rng = np.random.default_rng(8)
    m = 2 * BS
    cap = 4 * BS
    rows = jnp.asarray(np.sort(rng.integers(0, cap - 2, size=m))
                       .astype(np.int32))
    w8 = _w8(rng, m)
    g = jnp.asarray(rng.normal(size=(C, m)).astype(np.float32))
    got32 = dense_accumulate_cm_pallas(rows, w8, g, cap, block=BS,
                                       interpret=True)
    got16 = dense_accumulate_cm_pallas(rows, w8, g, cap, block=BS,
                                       interpret=True,
                                       out_dtype=jnp.bfloat16)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got16, dtype=np.float32), np.asarray(got32),
        rtol=2e-2, atol=2e-2,
    )


def test_dense_accumulate_cm_final_tail_zeros():
    """Rows confined to the head: the final-block flush must zero-fill
    everything after them."""
    rng = np.random.default_rng(5)
    m = BS
    cap = 8 * BS
    rows = jnp.asarray(np.sort(rng.integers(0, 16, size=m)).astype(np.int32))
    w8 = _w8(rng, m)
    g = jnp.asarray(rng.normal(size=(C, m)).astype(np.float32))
    got = dense_accumulate_cm_pallas(rows, w8, g, cap, block=BS,
                                     interpret=True)
    assert np.all(np.asarray(got)[:, 17:] == 0.0)  # rows + 1 reach 16
    _run_accum_cm(rows, w8, g, cap)


def test_dense_accumulate_rowmajor_interpret():
    """The lattice engine's row-major accumulate kernel body, same
    treatment (gaps + duplicates + tail)."""
    rng = np.random.default_rng(6)
    m = 3 * 512
    cap = 20 * 512
    c = 128
    vals = np.concatenate([
        np.full(m // 3, 5),
        rng.integers(512, 2 * 512, size=m // 3),
        rng.integers(15 * 512, 16 * 512, size=m - 2 * (m // 3)),
    ])
    rows = jnp.asarray(np.sort(vals).astype(np.int32))
    upd = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    got = dense_accumulate_pallas(rows, upd, cap, block=512, interpret=True)
    want = (
        jnp.zeros((cap, c), jnp.float32)
        .at[rows]
        .add(upd.astype(jnp.bfloat16).astype(jnp.float32))
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    # bf16-flush variant (the fine-stage 256^3 memory valve): fp32 VMEM
    # accumulation, one rounding per dense row at flush
    got_bf = dense_accumulate_pallas(
        rows, upd, cap, block=512, interpret=True, out_dtype=jnp.bfloat16
    )
    assert got_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_bf, dtype=np.float32), np.asarray(want),
        rtol=3e-2, atol=3e-2,
    )


def _tap_case(seed, m, rp, n_taps, maxneg, maxpos, spread):
    rng = np.random.default_rng(seed)
    rows = np.sort(
        rng.integers(maxneg, rp - maxpos - 2, size=m)
    ).astype(np.int32)
    delta = rng.integers(-spread, spread + 1, size=(n_taps, m)).astype(
        np.int32
    )
    # keep every tap inside the legal envelope and the row range
    delta = np.clip(delta, -(rows[None, :] - 0), rp - maxpos - 2 - rows)
    w8t = rng.uniform(0, 1, size=(8 * n_taps, m)).astype(np.float32)
    pack = rng.normal(size=(4, rp)).astype(np.float32)
    pack[:, -(maxpos + 4):] = 0.0
    return (
        jnp.asarray(pack).astype(jnp.bfloat16), jnp.asarray(rows),
        jnp.asarray(delta), jnp.asarray(w8t),
    )


def test_tap_window_serve_interpret():
    """Multi-tap serve kernel body vs reference: gaps, negative deltas,
    block boundaries, slow-path slides."""
    from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
        tap_window_serve_cm_pallas, tap_window_serve_cm_reference,
    )

    bs, bw = 256, 512
    maxneg, maxpos = 200, 180
    pack, rows, delta, w8t = _tap_case(
        11, 4 * bs, 16 * bw, 8, maxneg, maxpos, 150
    )
    got = tap_window_serve_cm_pallas(
        pack, rows, delta, w8t, maxneg, maxpos, bs=bs, bw=bw, interpret=True
    )
    want = tap_window_serve_cm_reference(pack, rows, delta, w8t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_tap_window_serve_interpret_gapped():
    """Occupancy gaps force the DMA slide loop across windows."""
    from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
        tap_window_serve_cm_pallas, tap_window_serve_cm_reference,
    )

    bs, bw = 256, 512
    maxneg, maxpos = 200, 180
    rng = np.random.default_rng(12)
    rp = 24 * bw
    vals = np.concatenate([
        rng.integers(maxneg, 2 * bw, size=bs),
        rng.integers(9 * bw, 10 * bw, size=bs),
        rng.integers(20 * bw, rp - maxpos - 2, size=bs),
    ])
    rows = jnp.asarray(np.sort(vals).astype(np.int32))
    delta = jnp.asarray(
        rng.integers(-150, 151, size=(8, 3 * bs)).astype(np.int32)
    )
    w8t = jnp.asarray(
        rng.uniform(0, 1, size=(64, 3 * bs)).astype(np.float32)
    )
    pack = rng.normal(size=(4, rp)).astype(np.float32)
    pack = jnp.asarray(pack).astype(jnp.bfloat16)
    got = tap_window_serve_cm_pallas(
        pack, rows, delta, w8t, maxneg, maxpos, bs=bs, bw=bw, interpret=True
    )
    want = tap_window_serve_cm_reference(pack, rows, delta, w8t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_tap_dense_accumulate_interpret():
    """Multi-tap accumulate kernel body vs reference (deposits at
    row + delta (+dz), sliding window, final-tail flush)."""
    from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
        tap_dense_accumulate_cm_pallas, tap_dense_accumulate_cm_reference,
    )

    rng = np.random.default_rng(13)
    m = 3 * 512
    cap = 20 * 512
    n_taps = 8
    maxneg, maxpos = 200, 180
    block = 512
    rows = np.sort(
        rng.integers(maxneg, cap - maxpos - 2, size=m)
    ).astype(np.int32)
    delta = rng.integers(-150, 151, size=(n_taps, m)).astype(np.int32)
    w8t = rng.uniform(0, 1, size=(8 * n_taps, m)).astype(np.float32)
    g = rng.normal(size=(n_taps, m)).astype(np.float32)
    got = tap_dense_accumulate_cm_pallas(
        jnp.asarray(rows), jnp.asarray(delta), jnp.asarray(w8t),
        jnp.asarray(g), cap, maxneg, maxpos, block=block, interpret=True,
    )
    want = tap_dense_accumulate_cm_reference(
        jnp.asarray(rows), jnp.asarray(delta), jnp.asarray(w8t),
        jnp.asarray(g), cap,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_tap_dense_accumulate_teleport_gaps():
    """Row clusters separated by gaps far larger than the window must
    trigger the TELEPORT flush (jump over pre-zeroed regions) and still
    produce exact deposits + zeros in the skipped spans."""
    from fgs_nerf_tpu.ops.pallas.tap_serve_cm import (
        tap_dense_accumulate_cm_pallas, tap_dense_accumulate_cm_reference,
    )

    rng = np.random.default_rng(14)
    m = 512
    cap = 400 * 512  # ~205k rows, clusters at three distant spots
    n_taps = 8
    maxneg, maxpos = 200, 180
    rows = np.sort(np.concatenate([
        rng.integers(maxneg, maxneg + 300, size=m // 4),
        rng.integers(150_000, 150_300, size=m // 2),
        rng.integers(200_000, 200_300, size=m - m // 4 - m // 2),
    ])).astype(np.int32)
    delta = rng.integers(-150, 151, size=(n_taps, m)).astype(np.int32)
    w8t = rng.uniform(0, 1, size=(8 * n_taps, m)).astype(np.float32)
    g = rng.normal(size=(n_taps, m)).astype(np.float32)
    got = tap_dense_accumulate_cm_pallas(
        jnp.asarray(rows), jnp.asarray(delta), jnp.asarray(w8t),
        jnp.asarray(g), cap, maxneg, maxpos, block=512, interpret=True,
    )
    want = tap_dense_accumulate_cm_reference(
        jnp.asarray(rows), jnp.asarray(delta), jnp.asarray(w8t),
        jnp.asarray(g), cap,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    # the skipped middle span is exactly zero
    assert np.all(np.asarray(got)[:, 5_000:140_000] == 0.0)


def test_corner_scatter_fold_matches_unfolded():
    """The z-fold path of ``corner_scatter_grid_grad`` (small-C memory
    valve) must reproduce the unfolded accumulation exactly: same
    per-lane sorted accumulation order, just relocated lanes."""
    from fgs_nerf_tpu.ops.pallas.scatter_combine import dense_accumulate_pallas

    rng = np.random.default_rng(7)
    m = 2 * 512
    cap = 8 * 512
    c8 = 8  # a 1-channel tap backward
    fold = 4
    rows = jnp.asarray(
        np.sort(rng.integers(0, cap - 1, size=m)).astype(np.int32)
    )
    upd = jnp.asarray(rng.normal(size=(m, c8)).astype(np.float32))

    plain = dense_accumulate_pallas(rows, upd, cap, block=512, interpret=True)

    rmod = (rows % fold)[:, None]
    upd_f = jnp.concatenate(
        [upd * (rmod == k).astype(upd.dtype) for k in range(fold)], axis=-1
    )
    cap_f = cap // fold
    folded = dense_accumulate_pallas(
        rows // fold, upd_f, cap_f, block=512, interpret=True
    )
    unfolded = folded.reshape(cap_f * fold, c8)
    np.testing.assert_allclose(
        np.asarray(unfolded), np.asarray(plain), rtol=2e-2, atol=2e-2
    )
