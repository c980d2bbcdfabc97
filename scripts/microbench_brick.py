"""Microbenchmark the brick-gather design primitives on the real TPU.

Design under test: group 4 consecutive ray samples (span <= 1.5 voxels
at stepsize 0.5), gather ONE 5^3-node pack row per group from a
stride-2 anchor table, interpolate within the brick on-chip.  Trades
the per-row take latency floor (~11.5 ns/row, BASELINE.md) for 4x fewer
rows at 16x width.

Measured from jax.profiler traces (host wall-clock is unreliable
through the axon tunnel — executions are memoized per argument buffer),
with a varying int arg folded into each body to defeat memoization.
"""
import functools
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M = 2_359_296            # 8192 x 288 samples
G = M // 4               # groups
R_TAB_CUR = 116 ** 3     # current cell-pack rows
R_TAB_BRK = 59 ** 3      # brick anchor rows (stride-2, 115^3 grid)


def device_ms(fn, args, n=4):
    fn_j = jax.jit(fn)
    out = fn_j(jnp.int32(0), *args)
    jax.block_until_ready(out)
    logdir = "/tmp/fgs_brick_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    for i in range(1, n + 1):
        out = fn_j(jnp.int32(i), *args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if "TPU" not in pid_names.get(ev.get("pid"), ""):
            continue
        if ev.get("name", "").startswith("jit_"):
            continue
        total += ev["dur"]
    return total / 1e3 / n


def bench(name, body, *args):
    try:
        ms = device_ms(body, args)
        print(f"{name:42s} {ms:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main():
    sections = set(sys.argv[1]) if len(sys.argv) > 1 else set("ABCDEFGH")
    rng = np.random.default_rng(0)

    if "A" in sections:
        tab = jnp.asarray(rng.normal(size=(R_TAB_CUR, 128)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, R_TAB_CUR, size=(M,)), jnp.int32)
        bench(f"A  take [{R_TAB_CUR},128]bf16 x {M}",
              lambda i, t, x: jnp.take(t, (x + i) % R_TAB_CUR, axis=0), tab, idx)

    if "B" in sections:
        idx = jnp.asarray(rng.integers(0, R_TAB_BRK, size=(G,)), jnp.int32)
        for cw in (1024, 2048):
            tab = jnp.asarray(rng.normal(size=(R_TAB_BRK, cw)), jnp.bfloat16)
            bench(f"B  take [{R_TAB_BRK},{cw}]bf16 x {G}",
                  lambda i, t, x: jnp.take(t, (x + i) % R_TAB_BRK, axis=0),
                  tab, idx)
        idx2 = jnp.asarray(
            (np.arange(G) // 8 + rng.integers(-2, 3, size=(G,))) % R_TAB_BRK,
            jnp.int32)
        bench(f"B2 take [{R_TAB_BRK},2048]bf16 walk",
              lambda i, t, x: jnp.take(t, (x + i) % R_TAB_BRK, axis=0),
              tab, idx2)

    if "C" in sections:
        A4 = jnp.asarray(rng.normal(size=(G, 4, 128)), jnp.bfloat16)
        V = jnp.asarray(rng.normal(size=(G, 128, 16)), jnp.bfloat16)
        bench(f"C  einsum gjn,gnc->gjc ({G}x4x128x16)",
              lambda i, a, v: jnp.einsum(
                  "gjn,gnc->gjc", a + i.astype(jnp.bfloat16), v,
                  preferred_element_type=jnp.float32), A4, V)
        wx = jnp.asarray(rng.normal(size=(G, 4, 5)), jnp.float32)
        wy = jnp.asarray(rng.normal(size=(G, 4, 5)), jnp.float32)
        wz = jnp.asarray(rng.normal(size=(G, 4, 5)), jnp.float32)

        def c2(i, wx, wy, wz, v):
            a = ((wx[:, :, :, None, None] + i.astype(jnp.float32))
                 * wy[:, :, None, :, None]
                 * wz[:, :, None, None, :]).reshape(G, 4, 125)
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 3))).astype(jnp.bfloat16)
            return jnp.einsum("gjn,gnc->gjc", a, v,
                              preferred_element_type=jnp.float32)
        bench("C2 A-build + einsum", c2, wx, wy, wz, V)

    if "D" in sections:
        S = 115
        grid = jnp.asarray(rng.normal(size=(S + 5, S + 5, S + 5, 16)),
                           jnp.bfloat16)
        w = np.zeros((5, 5, 5, 16, 2048), np.float32)
        for i in range(5):
            for j in range(5):
                for k in range(5):
                    nn = (i * 5 + j) * 5 + k
                    w[i, j, k, np.arange(16), nn * 16 + np.arange(16)] = 1.0
        wj = jnp.asarray(w, jnp.bfloat16)

        def d(i, g, w):
            return jax.lax.conv_general_dilated(
                (g + i.astype(jnp.bfloat16))[None], w, window_strides=(2, 2, 2),
                padding="VALID", dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
                preferred_element_type=jnp.bfloat16)[0]
        bench("D  pack conv 5^3 s2 -> 58^3x2048", d, grid, wj)

    if "E" in sections:
        A4 = jnp.asarray(rng.normal(size=(G, 4, 128)), jnp.bfloat16)
        ct = jnp.asarray(rng.normal(size=(G, 4, 16)), jnp.bfloat16)
        bench("E  einsum gjn,gjc->gnc",
              lambda i, a, c: jnp.einsum(
                  "gjn,gjc->gnc", a, c + i.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32), A4, ct)

    if "F" in sections:
        dv = jnp.asarray(rng.normal(size=(G, 2048)), jnp.bfloat16)
        order = jnp.asarray(rng.permutation(G).astype(np.int32))
        bench(f"F  take [{G},2048]bf16 x {G}",
              lambda i, t, x: jnp.take(t, (x + i) % G, axis=0), dv, order)

    if "G" in sections:
        from fgs_nerf_tpu.ops.pallas.scatter_combine import (
            dense_accumulate_pallas,
        )
        dv = jnp.asarray(rng.normal(size=(G, 2048)), jnp.bfloat16)
        rows_sorted = jnp.sort(jnp.asarray(
            rng.integers(0, R_TAB_BRK, size=(G,)), jnp.int32))
        for blk in (256, 512):
            bench(f"G  accumulate C=2048 B={blk}",
                  lambda i, r, u, blk=blk: dense_accumulate_pallas(
                      r, u + i.astype(jnp.bfloat16), R_TAB_BRK, block=blk),
                  rows_sorted, dv)

    if "H" in sections:
        iota = jnp.arange(G, dtype=jnp.int32)
        rows = jnp.asarray(rng.integers(0, R_TAB_BRK, size=(G,)), jnp.int32)
        bench(f"H  pair sort {G}",
              lambda i, r, x: jax.lax.sort(((r + i) % R_TAB_BRK, x),
                                           dimension=0, num_keys=1),
              rows, iota)


if __name__ == "__main__":
    main()
