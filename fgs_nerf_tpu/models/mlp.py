"""Plain MLP parameter trees with torch-Linear-compatible init.

The reference's shading heads are small ``nn.Sequential`` stacks of
Linear+ReLU (`model/nerf.py:125-144`).  Parameters here are flat dicts
``{'w0': [in, out], 'b0': [out], ...}``; init draws from
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and biases, which
is exactly torch's Linear default (kaiming_uniform with a=sqrt(5)).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def init_mlp(key, dims: Sequence[int]) -> Dict[str, jnp.ndarray]:
    """dims = [in, hidden, ..., out]; len(dims)-1 linear layers."""
    params = {}
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(jnp.asarray(d_in, jnp.float32))
        params[f"w{i}"] = jax.random.uniform(
            kw, (d_in, d_out), jnp.float32, -bound, bound
        )
        params[f"b{i}"] = jax.random.uniform(
            kb, (d_out,), jnp.float32, -bound, bound
        )
    return params


def mlp_apply(
    params: Dict[str, jnp.ndarray], x: jnp.ndarray, bf16: bool = False
) -> jnp.ndarray:
    """ReLU between layers, no activation after the last (the callers
    apply their own sigmoid, `model/nerf.py:884, 1009`).

    ``bf16=True`` runs the matmuls in bfloat16 with fp32 accumulation
    (fp32 master weights kept by the optimizer) — the v5e MXU runs
    bf16 at 4x the fp32 rate and the shading heads tolerate the ~0.3%
    activation noise.
    """
    n = len(params) // 2
    if bf16:
        x = x.astype(jnp.bfloat16)
    for i in range(n):
        w, b = params[f"w{i}"], params[f"b{i}"]
        if bf16:
            # Hidden activations stay bf16 end to end: the MXU
            # accumulates fp32 internally regardless of the requested
            # output dtype, and materializing fp32 [M, W] intermediates
            # between layers made the heads HBM-bound (measured 31 ms
            # -> the matmul flops alone are ~4 ms).  Only the final
            # layer emits fp32 for the caller's sigmoid/compositing.
            last = i == n - 1
            out_t = jnp.float32 if last else jnp.bfloat16
            x = jnp.dot(
                x, w.astype(jnp.bfloat16), preferred_element_type=out_t
            ) + b.astype(out_t)
            if not last:
                x = jax.nn.relu(x)
        else:
            x = x @ w + b
            if i < n - 1:
                x = jax.nn.relu(x)
    return x


def refnet_dims(d_in: int, width: int, depth: int) -> list:
    """Linear(d,W) + (depth-2) x Linear(W,W) + Linear(W,3)
    (`model/nerf.py:125-132`)."""
    return [d_in] + [width] * (depth - 1) + [3]


def rgbnet_dims(d_in: int, width: int, depth: int) -> list:
    """Same stack but the head outputs ``width`` features instead of RGB
    (`model/nerf.py:134-142`)."""
    return [d_in] + [width] * (depth - 1) + [width]
