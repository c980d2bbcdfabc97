"""Microbenchmarks for the gather formulations on the real TPU.

Host wall-clock is unreliable through the axon tunnel (executions are
memoized per argument buffer and small-output programs get algebraically
collapsed), so each variant is measured from a ``jax.profiler`` trace:
run the op once under trace, sum TPU-track device durations.

Questions:
  A. top-K slot gather [8192,288,19] -> [8192,256,19]: flat row take vs
     one-hot batched matmul vs take_along_axis.
  B. full permutation gather of a packed [2.36M,22] array: take vs
     multi-operand lax.sort carrying the payload.
  C. 8 separate corner gathers of [1.48M,16] vs ONE gather of a
     cell-packed [1.48M,128] grid (packing cost included).
"""
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

N, S, K, C = 8192, 288, 256, 19
M = N * S
GX = GY = GZ = 114
GC = 16


def device_ms(fn, args, n=4):
    """Total device-op ms per run of jitted ``fn`` (from profiler trace)."""
    fn_j = jax.jit(fn)
    out = fn_j(jnp.int32(0), *args)
    jax.block_until_ready(out)
    logdir = "/tmp/fgs_microbench_trace"
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
        if ev.get("name", "").startswith("jit_"):  # outer span, avoid double count
            continue
        total += ev["dur"]
    return total / 1e3 / n


def bench(name, body, *args):
    ms = device_ms(body, args)
    print(f"{name:30s} {ms:8.2f} ms", flush=True)


def main():
    sections = set(sys.argv[1]) if len(sys.argv) > 1 else set("ABCDEF")
    unknown = sections - set("ABCDEF")
    if unknown:
        raise SystemExit(
            f"unknown section(s) {sorted(unknown)}; usage: "
            f"{sys.argv[0]} [sections from 'ABCDEF', e.g. 'AD']"
        )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    bench("sanity matmul 4096^3 fp32",
          lambda i, a: (a + i.astype(jnp.float32)) @ a, a)

    x = jnp.asarray(rng.normal(size=(N, S, C)).astype(np.float32))
    idx0 = jnp.asarray(
        np.sort(rng.integers(0, S, size=(N, K)), axis=1).astype(np.int32)
    )

    def flat_take(i, x, idx):
        idx = (idx + i) % S
        rows = (jnp.arange(N, dtype=jnp.int32)[:, None] * S + idx).reshape(-1)
        return jnp.take(x.reshape(M, C), rows, axis=0)

    def onehot_mm(i, x, idx):
        idx = (idx + i) % S
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, K, S), 2)
        onehot = (idx[..., None] == iota_s).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            onehot, x.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def taa(i, x, idx):
        idx = (idx + i) % S
        return jnp.take_along_axis(x, idx[..., None], axis=1)

    if "A" in sections:
        bench("A. flat row take", flat_take, x, idx0)
        bench("A. one-hot batched mm", onehot_mm, x, idx0)
        bench("A. take_along_axis", taa, x, idx0)

    P = 22
    packed = jnp.asarray(rng.normal(size=(M, P)).astype(np.float32))
    keys0 = jnp.asarray(rng.integers(0, 1_500_000, size=(M,)).astype(np.int32))

    def perm_take(i, packed, keys):
        keys = keys + i
        order = jnp.argsort(keys)
        return jnp.take(keys, order), jnp.take(packed, order, axis=0)

    def sort_payload(i, packed, keys):
        keys = keys + i
        ops = (keys,) + tuple(packed[:, j] for j in range(P))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=-1)

    if "B" in sections:
        bench("B. argsort + take", perm_take, packed, keys0)
        bench("B. lax.sort payload", sort_payload, packed, keys0)

    grid = jnp.asarray(rng.normal(size=(GX * GY * GZ, GC)).astype(np.float32))
    rows0 = jnp.asarray(
        rng.integers(0, (GX - 2) * (GY - 2) * (GZ - 2), size=(M,)).astype(np.int32)
    )
    offs = np.array(
        [(dx * GY + dy) * GZ + dz for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        np.int32,
    )

    def eight_gathers(i, grid, rows):
        rows = rows + i
        outs = [jnp.take(grid, rows + int(o), axis=0) for o in offs]
        return sum(outs)

    def packed_cell(i, grid, rows):
        rows = rows + i
        g3 = grid.reshape(GX, GY, GZ, GC)
        parts = []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    parts.append(
                        jax.lax.slice(
                            g3, (dx, dy, dz, 0),
                            (GX - 1 + dx, GY - 1 + dy, GZ - 1 + dz, GC),
                        )
                    )
        cells = jnp.concatenate(parts, axis=-1).reshape(-1, 8 * GC)
        rx = rows // (GY * GZ)
        rem = rows % (GY * GZ)
        ry = rem // GZ
        rz = rem % GZ
        crows = (rx * (GY - 1) + ry) * (GZ - 1) + rz
        v = jnp.take(cells, crows, axis=0)
        return sum(v[:, j * GC:(j + 1) * GC] for j in range(8))

    if "C" in sections:
        bench("C. 8 corner gathers", eight_gathers, grid, rows0)
        bench("C. packed-cell 1 gather", packed_cell, grid, rows0)

    # D. row-gather cost vs row width: the step trace shows 16ch gathers
    # at ~6 ns/row but 19ch/22ch at ~45 ns/row.  104ch (416 B) covers
    # the fine-stage packed-field row width, which sits in the
    # 256-512 B region between the two measured regimes.
    if "D" in sections:
        rows_flat = jnp.asarray(rng.integers(0, M, size=(M,)).astype(np.int32))
        for w in (8, 16, 19, 22, 24, 32, 64, 104, 128):
            src = jnp.asarray(rng.normal(size=(M, w)).astype(np.float32))
            bench(f"D. take {M}x{w} f32",
                  lambda i, s, r: jnp.take(s, (r + i) % M, axis=0), src, rows_flat)
        for w in (16, 32, 128):
            src = jnp.asarray(rng.normal(size=(M, w)).astype(np.float32)).astype(jnp.bfloat16)
            bench(f"D. take {M}x{w} bf16",
                  lambda i, s, r: jnp.take(s, (r + i) % M, axis=0), src, rows_flat)

    # E. row-gather cost vs INDEX DISTRIBUTION at the pass-1 row width
    # (512 B).  Decides whether a locality-preserving pack layout
    # (bricked / Morton cells) can speed the hot gather without any
    # sample sort: if the engine rewards line reuse, ray-coherent index
    # streams should price well below random.
    if "E" in sections:
        nsrc = GX * GY * GZ
        src = jnp.asarray(rng.normal(size=(nsrc, 128)).astype(np.float32))
        take = lambda i, s, r: jnp.take(s, (r + i) % nsrc, axis=0)

        r_rand = jnp.asarray(rng.integers(0, nsrc, size=(M,)).astype(np.int32))
        bench("E. 512B rows random", take, src, r_rand)
        bench("E. 512B rows sorted", take, src, jnp.sort(r_rand))
        # per-ray walks: base + s*stride for each of N rays, S steps
        base = rng.integers(0, nsrc - S * 300, size=(N, 1)).astype(np.int32)
        for stride, tag in ((1, "z-walk +1"), (GZ, "y-walk +114"),
                            (GY * GZ, "x-walk +12996"), (64, "brick-walk +64")):
            walk = (base + np.arange(S, dtype=np.int32)[None, :] * stride)
            bench(f"E. 512B rows {tag}", take, src,
                  jnp.asarray(walk.reshape(-1) % nsrc))
        # same-row repeats (step 0.5 voxel: ~2 samples/cell)
        rep = np.repeat(rng.integers(0, nsrc, size=(M // 2,)), 2).astype(np.int32)
        bench("E. 512B rows pairwise-dup", take, src, jnp.asarray(rep))
        srcb = src.astype(jnp.bfloat16)
        bench("E. 256B bf16 rows random", take, srcb, r_rand)
        # scalar unsort candidates
        vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
        perm = jnp.asarray(rng.permutation(M).astype(np.int32))
        bench("E. scatter-rows Mx8 f32",
              lambda i, v, p: jnp.zeros((M, 8), jnp.float32).at[(p + i) % M].set(v),
              vals, perm)


    # F. permutation-crossing candidates for the sorted-window redesign:
    # (1) pair sort baseline; (2) lax.sort carrying a payload of
    # width P (the "un-permute via key sort" trick — cost should scale
    # with payload bytes, unlike the 11.5 ns/row take floor);
    # (3) split takes (2x8ch vs 1x16ch — section D showed 8ch f32 is
    # the only cheap narrow width); (4) small-table takes (per-ray
    # lookups: viewdirs/ray A|B tables).
    if "F" in sections:
        keys0f = jnp.asarray(rng.integers(0, 1_500_000, size=(M,)).astype(np.int32))
        iota = jnp.arange(M, dtype=jnp.int32)

        def pair_sort(i, keys):
            return jax.lax.sort((keys + i, iota), dimension=0, num_keys=1)

        bench("F. pair sort (key,i32)", pair_sort, keys0f)

        for p in (2, 4, 8, 16):
            pay = tuple(
                jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
                for _ in range(p)
            )

            def pay_sort(i, keys, *pay):
                return jax.lax.sort((keys + i,) + pay, dimension=0, num_keys=1)

            bench(f"F. sort + {p}xf32 payload", pay_sort, keys0f, *pay)

        pay16b = tuple(
            jnp.asarray(rng.normal(size=(M,)).astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(16)
        )

        def pay_sort_b(i, keys, *pay):
            return jax.lax.sort((keys + i,) + pay, dimension=0, num_keys=1)

        bench("F. sort + 16xbf16 payload", pay_sort_b, keys0f, *pay16b)

        # payload packed as wide rows instead of separate operands
        pack16 = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))

        def pay_sort_packed(i, keys, pk):
            ops = (keys + i,) + tuple(pk[:, j] for j in range(16))
            return jax.lax.sort(ops, dimension=0, num_keys=1)

        bench("F. sort + packed16 cols", pay_sort_packed, keys0f, pack16)

        rows_flat = jnp.asarray(rng.integers(0, M, size=(M,)).astype(np.int32))
        src16 = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
        bench(
            "F. take 16ch as 2x8ch",
            lambda i, s, r: jnp.concatenate(
                [jnp.take(s[:, :8], (r + i) % M, axis=0),
                 jnp.take(s[:, 8:], (r + i) % M, axis=0)], axis=-1
            ),
            src16, rows_flat,
        )
        small = jnp.asarray(rng.normal(size=(8192, 8)).astype(np.float32))
        rray = jnp.asarray(rng.integers(0, 8192, size=(M,)).astype(np.int32))
        bench("F. small-table take 8192x8",
              lambda i, s, r: jnp.take(s, (r + i) % 8192, axis=0), small, rray)

        def onehot_raytab(i, s, r):
            r = (r + i) % 8192
            rb = r.reshape(-1, 2048)
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, 2048, 8192), 2)
            oh = (rb[..., None] == iota_t).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, jnp.broadcast_to(s.astype(jnp.bfloat16), (rb.shape[0], 8192, 8)),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        bench("F. raytab one-hot mm", onehot_raytab, small, rray)


if __name__ == "__main__":
    main()
