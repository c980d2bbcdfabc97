"""Measure lax.sort cost vs payload count/width at the bench stream
size (M = 2.36M, i32 keys over ~1.7M distinct rows) on the real TPU.

Decides whether packing the sorted engine's f32 payloads into u32
16-bit pairs (8 -> 5 operands) buys real step time: per-COLUMN pricing
says yes, per-BYTE pricing says no.  Chained inside one jit to defeat
the axon tunnel's per-buffer execution memoization.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(make_call, seed_arg, iters=8):
    def run(n):
        @jax.jit
        def body(arg):
            def step(_, a):
                outs = make_call(a)
                return a + outs * 1e-30
            return jax.lax.fori_loop(0, n, step, arg)
        return body

    f1, fn = run(1), run(iters + 1)
    jax.block_until_ready(f1(seed_arg)); jax.block_until_ready(fn(seed_arg))
    t0 = time.perf_counter()
    jax.block_until_ready(f1(seed_arg))
    t1 = time.perf_counter()
    jax.block_until_ready(fn(seed_arg))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    m = 8192 * 288
    keys = jnp.asarray(rng.integers(0, 1_700_000, size=m), jnp.int32)
    iota = jnp.arange(m, dtype=jnp.int32)
    f32s = [jnp.asarray(rng.random(m), jnp.float32) for _ in range(6)]
    u32s = [jnp.asarray(rng.integers(0, 2**32, size=m, dtype=np.uint32))
            for _ in range(3)]
    u16s = [jnp.asarray(rng.integers(0, 2**16, size=m, dtype=np.uint16))
            for _ in range(6)]
    bf16s = [v.astype(jnp.bfloat16) for v in f32s]

    cases = {
        "8op_f32 (main sort today)": lambda p: jax.lax.sort(
            (keys + (p[:1] * 0).astype(jnp.int32), iota, *f32s),
            num_keys=1)[2][0],
        "5op_u32packed": lambda p: jax.lax.sort(
            (keys + (p[:1] * 0).astype(jnp.int32), iota, *u32s),
            num_keys=1)[2][0].astype(jnp.float32),
        "8op_u16 (keys+iota+6xu16)": lambda p: jax.lax.sort(
            (keys + (p[:1] * 0).astype(jnp.int32), iota, *u16s),
            num_keys=1)[2][0].astype(jnp.float32),
        "8op_bf16 (keys+iota+6xbf16)": lambda p: jax.lax.sort(
            (keys + (p[:1] * 0).astype(jnp.int32), iota, *bf16s),
            num_keys=1)[2][0].astype(jnp.float32),
        "2op (keys+iota only)": lambda p: jax.lax.sort(
            (keys + (p[:1] * 0).astype(jnp.int32), iota),
            num_keys=1)[1][0].astype(jnp.float32),
        "6op_f32 (unsort today)": lambda p: jax.lax.sort(
            (iota + (p[:1] * 0).astype(jnp.int32), *f32s[:5]),
            num_keys=1)[1][0],
        "4op_unsort (f32+2xu32)": lambda p: jax.lax.sort(
            (iota + (p[:1] * 0).astype(jnp.int32), f32s[0], *u32s[:2]),
            num_keys=1)[1][0],
    }
    seed = jnp.zeros((8,), jnp.float32)
    for name, fn in cases.items():
        try:
            ms = chained_ms(fn, seed)
            print(f"{name}: {ms:.2f} ms")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
