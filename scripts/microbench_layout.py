"""Microbenchmarks for the channel-major sorted-engine layouts (round 4).

Questions this answers on the real chip:
  A. what do [M, C] channel-last elementwise chains cost vs [C, M]
     channel-major and 1-D per-channel forms (the PROFILE_r03 §3
     "small-lane" hypothesis, quantified);
  B. what does a standalone [*, C] -> [C, *] transpose cost (the k0 /
     pack transposes the engine needs if params stay channel-last);
  C. sincos positional encoding in both layouts;
  D. MLP matmul in both layouts ([M, Cin] @ [Cin, W] vs
     [W, Cin] @ [Cin, M]);
  E. lax.sort with k payload columns at stream scale (crossing budget).

Device time from jax.profiler traces (host wall-clock is unreliable
through the axon tunnel — executions are memoized per argument buffer),
with a varying int arg folded into each body to defeat memoization.

Usage: python scripts/microbench_layout.py [abcde]
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

M = 8192 * 288  # bench stream size


def device_ms(fn, args, n=4):
    fn_j = jax.jit(fn)
    out = fn_j(jnp.int32(0), *args)
    jax.block_until_ready(out)
    logdir = "/tmp/fgs_layout_trace"
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
        print(f"{name:44s} {ms:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def section_a(rng):
    print(f"== A. elementwise chain layouts (M = {M}) ==")
    x_mc = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    x_cm = jnp.asarray(np.ascontiguousarray(np.asarray(x_mc).T))
    xs = tuple(jnp.asarray(np.asarray(x_mc)[:, i].copy()) for i in range(3))

    def chain_mc(i, x):
        x = x + i
        y = jnp.tanh(x * 1.1 + 0.3) * x
        n = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True) + 1e-9)
        return y / n

    def chain_cm(i, x):
        x = x + i
        y = jnp.tanh(x * 1.1 + 0.3) * x
        n = jnp.sqrt(jnp.sum(y * y, axis=0, keepdims=True) + 1e-9)
        return y / n

    def chain_1d(i, a, b, c):
        ts = (a + i, b + i, c + i)
        ys = [jnp.tanh(t * 1.1 + 0.3) * t for t in ts]
        n = jnp.sqrt(ys[0] ** 2 + ys[1] ** 2 + ys[2] ** 2 + 1e-9)
        return tuple(y / n for y in ys)

    bench("  [M, 3] channel-last", chain_mc, x_mc)
    bench("  [3, M] channel-major", chain_cm, x_cm)
    bench("  3 x [M] 1-D", chain_1d, *xs)

    y16 = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
    y16t = jnp.asarray(np.ascontiguousarray(np.asarray(y16).T))

    def ew16(i, x):
        x = x + i
        return jnp.tanh(x * 1.1 + 0.3) * x

    bench("  [M, 16] elementwise", ew16, y16)
    bench("  [16, M] elementwise", ew16, y16t)


def section_b(rng):
    print("== B. transposes ==")
    g = jnp.asarray(rng.normal(size=(1_520_875, 16)).astype(np.float32))
    p = jnp.asarray(
        rng.normal(size=(1_750_000, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    m3 = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    m16 = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
    for name, a in [("[1.52M, 16] f32", g), ("[1.75M, 128] bf16", p),
                    ("[M, 3] f32", m3), ("[M, 16] f32", m16)]:
        bench(f"  {name} -> T", lambda i, x: (x + i).T + 0.0, a)


def section_c(rng):
    print("== C. sincos encoding (pe=5 -> 33ch) ==")
    x_mc = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    x_cm = jnp.asarray(np.ascontiguousarray(np.asarray(x_mc).T))
    freqs = jnp.asarray(2.0 ** np.arange(5), jnp.float32)

    def enc_mc(i, x):
        x = x + i
        xf = x[..., None] * freqs  # [M, 3, F]
        return jnp.concatenate(
            [x, jnp.sin(xf).reshape(M, -1), jnp.cos(xf).reshape(M, -1)], -1
        )

    def enc_cm(i, x):  # x [3, M]
        x = x + i
        xf = x[None, :, :] * freqs[:, None, None]  # [F, 3, M]
        return jnp.concatenate(
            [x, jnp.sin(xf).reshape(-1, M), jnp.cos(xf).reshape(-1, M)], 0
        )

    bench("  [M, 3] -> [M, 33]", enc_mc, x_mc)
    bench("  [3, M] -> [33, M]", enc_cm, x_cm)


def section_d(rng):
    print("== D. MLP matmuls (60 -> 192 -> 192 -> 3, bf16)")
    x_mc = jnp.asarray(rng.normal(size=(M, 60)).astype(np.float32))
    x_cm = jnp.asarray(np.ascontiguousarray(np.asarray(x_mc).T))
    w0 = jnp.asarray(rng.normal(size=(60, 192)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(192, 192)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(192, 3)).astype(np.float32))

    def mlp_mc(i, x, w0, w1, w2):
        h = (x + i).astype(jnp.bfloat16)
        h = jax.nn.relu(h @ w0.astype(jnp.bfloat16))
        h = jax.nn.relu(h @ w1.astype(jnp.bfloat16))
        return (h @ w2.astype(jnp.bfloat16)).astype(jnp.float32)

    def mlp_cm(i, x, w0, w1, w2):
        h = (x + i).astype(jnp.bfloat16)
        h = jax.nn.relu(w0.astype(jnp.bfloat16).T @ h)
        h = jax.nn.relu(w1.astype(jnp.bfloat16).T @ h)
        return (w2.astype(jnp.bfloat16).T @ h).astype(jnp.float32)

    bench("  [M, C]: x @ W", mlp_mc, x_mc, w0, w1, w2)
    bench("  [C, M]: W.T @ x", mlp_cm, x_cm, w0, w1, w2)


def section_e(rng):
    print("== E. sort payload scaling ==")
    keys = jnp.asarray(rng.integers(0, 1_600_000, size=M).astype(np.int32))
    cols = [jnp.asarray(rng.normal(size=M).astype(np.float32))
            for _ in range(8)]

    def mk(k):
        def body(i, kk, *cs):
            return jax.lax.sort((kk + i, *cs), dimension=0, num_keys=1)
        return body

    for k in (1, 2, 4, 5, 7):
        bench(f"  sort + {k} payload cols", mk(k), keys, *cols[:k])


def section_f(rng):
    print("== F. channel-major feature concat variants ==")
    m = M
    hs = [12, 33, 33, 3, 9]   # the coarse refnet input blocks
    hs8 = [16, 40, 40, 8, 16]  # sublane-aligned padding
    blocks = [jnp.asarray(rng.normal(size=(h, m)).astype(np.float32))
              .astype(jnp.bfloat16) for h in hs]
    blocks8 = [jnp.asarray(rng.normal(size=(h, m)).astype(np.float32))
               .astype(jnp.bfloat16) for h in hs8]
    w = jnp.asarray(rng.normal(size=(90, 192)).astype(np.float32))
    w8_ = jnp.asarray(rng.normal(size=(120, 192)).astype(np.float32))

    def cat_mm(i, wm, *bs):
        x = jnp.concatenate([b + jnp.bfloat16(i) for b in bs], axis=0)
        return jax.lax.dot_general(
            wm.astype(jnp.bfloat16), x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    bench("  misaligned cat (12/33/33/3/9) + mm", cat_mm, w, *blocks)
    bench("  aligned cat (16/40/40/8/16) + mm", cat_mm, w8_, *blocks8)

    def cat_only(i, *bs):
        return jnp.concatenate([b + jnp.bfloat16(i) for b in bs], axis=0)

    bench("  misaligned cat only", cat_only, *blocks)
    bench("  aligned cat only", cat_only, *blocks8)


if __name__ == "__main__":
    want = sys.argv[1] if len(sys.argv) > 1 else "abcdef"
    rng = np.random.default_rng(0)
    for s in want:
        {"a": section_a, "b": section_b, "c": section_c,
         "d": section_d, "e": section_e, "f": section_f}[s](rng)
