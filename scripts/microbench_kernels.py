"""Isolate the per-block cost structure of the two sorted-cm kernels.

Builds a bench-shaped dense sorted stream (2.36M samples over ~1.7M
rows) and times each kernel standalone under variants (slow_path on/off,
block sizes, g_sub) to locate the ~2-3 us/block fixed cost that the
one-hot halving did not move.  Run on the real TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(make_call, perturb_arg, iters=8):
    """Device-time per call: run ``iters`` chained calls inside ONE jit
    (each call's perturbable argument depends on the previous output's
    first element, defeating the axon tunnel's per-buffer execution
    memoization), minus the 1-call baseline."""
    def run(n):
        @jax.jit
        def body(arg):
            def step(_, a):
                out = make_call(a)
                return perturb_arg(a, out)
            return jax.lax.fori_loop(0, n, step, arg)
        return body

    f1, fn = run(1), run(iters + 1)
    a0 = perturb_arg(None, None)
    jax.block_until_ready(f1(a0)); jax.block_until_ready(fn(a0))
    t0 = time.perf_counter()
    jax.block_until_ready(f1(a0))
    t1 = time.perf_counter()
    jax.block_until_ready(fn(a0))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1e3


def main():
    from fgs_nerf_tpu.ops.pallas.scatter_combine_cm import (
        dense_accumulate_cm_pallas,
    )
    from fgs_nerf_tpu.ops.pallas.window_gather_cm import (
        sorted_window_gather_cm_pallas,
    )

    rng = np.random.default_rng(0)
    m = 8192 * 288  # bench stream
    c = 16
    r_rows = 117 * 119 * 256  # ~ (X+2)(Y+2)*zp of the 115^3 grid
    rp = ((r_rows + 511) // 512 + 1) * 512
    # dense non-decreasing rows (uniform over the row space, sorted)
    rows = np.sort(rng.integers(0, r_rows - 2, size=m)).astype(np.int32)
    w8 = rng.random((8, m), np.float32)
    g = rng.random((c, m), np.float32)
    pack = rng.random((4 * c, rp), np.float32).astype(jnp.bfloat16)
    rows_j = jnp.asarray(rows)
    w8_j = jnp.asarray(w8)
    g_j = jnp.asarray(g)
    pack_j = jnp.asarray(pack)

    for bs, bw, sp in [(1024, 512, True), (1024, 512, False)]:
        try:
            def mk(w, bs=bs, bw=bw, sp=sp):
                return sorted_window_gather_cm_pallas(
                    pack_j, rows_j, w, bs=bs, bw=bw, slow_path=sp)

            def pert(w, out):
                if w is None:
                    return w8_j
                return w + out[0, 0] * 1e-30

            ms = timeit_chained(mk, pert)
            print(f"serve bs={bs} bw={bw} slow_path={sp}: {ms:.2f} ms")
        except Exception as e:
            print(f"serve bs={bs} bw={bw} slow_path={sp}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")

    cap = r_rows + 2
    for block, gsub in [(512, 4), (1024, 2)]:
        try:
            def mk(gg, block=block, gsub=gsub):
                return dense_accumulate_cm_pallas(
                    rows_j, w8_j, gg, cap, block=block, g_sub=gsub)

            def pert(gg, out):
                if gg is None:
                    return g_j
                return gg + out[0, 0] * 1e-30

            ms = timeit_chained(mk, pert)
            print(f"accum block={block} g_sub={gsub}: {ms:.2f} ms")
        except Exception as e:
            print(f"accum block={block} g_sub={gsub}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
