"""Masked transmittance scan with early-exit semantics and a hand-written VJP.

Replaces the serial per-ray CUDA scan ``alpha2weight`` /
``alpha2weight_backward`` (`model/cuda/render_utils_kernel.cu:577-707`).
On TPU the per-ray loop becomes an exclusive cumulative product along
the (static) sample axis.  Two reference quirks are reproduced exactly:

* **Early exit**: the CUDA forward stops a ray once the running
  transmittance drops below 1e-3 (`render_utils_kernel.cu:597-601`) and
  truncates the backward range accordingly — samples past the cutoff
  get zero weight *and* zero gradient.  Here that is a prefix mask
  ``T_exclusive >= 1e-3`` (the loop processes sample i iff no earlier
  post-multiply dropped below the threshold, i.e. iff the exclusive
  transmittance at i is still >= 1e-3).
* **Backward guard**: the reference divides by ``1 - alpha + 1e-10``
  (`render_utils_kernel.cu:673`); the custom VJP keeps that guard so
  alpha == 1.0 exactly does not produce NaNs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EARLY_EXIT_T = 1e-3
_GUARD = 1e-10


def _scan_last(x: jnp.ndarray, op, identity: float, reverse: bool = False):
    """Hillis-Steele inclusive scan along the last axis.

    XLA's native ``cumprod``/``cumsum`` lower to serial while-loops on
    TPU (~12 ms/step for the two 8192x288 scans of the bench workload,
    per the jax.profiler trace); log2(S) statically-shifted elementwise
    passes over the same arrays cost well under 1 ms.  Products are
    reassociated exactly as in any parallel scan — the tests' golden
    serial model agrees to fp32 reassociation tolerance.
    """
    s = x.shape[-1]
    pad_cfg = [(0, 0)] * (x.ndim - 1)
    y = x
    shift = 1
    while shift < s:
        if reverse:
            shifted = jnp.pad(
                y[..., shift:], pad_cfg + [(0, shift)], constant_values=identity
            )
        else:
            shifted = jnp.pad(
                y[..., :-shift], pad_cfg + [(shift, 0)], constant_values=identity
            )
        y = op(y, shifted)
        shift *= 2
    return y


def _exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """cumprod shifted right by one, starting at 1."""
    assert axis == -1 or axis == x.ndim - 1
    c = _scan_last(x, jnp.multiply, 1.0)
    one = jnp.ones_like(c[..., :1])
    return jnp.concatenate([one, c[..., :-1]], axis=-1)


def _forward(alpha: jnp.ndarray, valid: jnp.ndarray):
    a = jnp.where(valid, alpha, 0.0)
    t_excl = _exclusive_cumprod(1.0 - a, axis=-1)
    # NB: the parallel scan's reassociation perturbs t_excl by ~1e-6
    # relative, which can discretely flip this predicate for rays whose
    # transmittance sits exactly at the cutoff — a step change in which
    # samples receive weight/gradient vs the serial reference, bounded
    # in impact by the flipped samples' own transmittance (~1e-3).
    processed = (t_excl >= EARLY_EXIT_T) & valid
    a_eff = jnp.where(processed, a, 0.0)
    # Prefix property: zeroing post-cutoff alphas leaves T unchanged on
    # the processed prefix, and makes the full product equal the
    # reference's alphainv_last at the break point.
    t = _exclusive_cumprod(1.0 - a_eff, axis=-1)
    weights = t * a_eff
    alphainv_last = jnp.prod(1.0 - a_eff, axis=-1)
    return weights, alphainv_last, t, processed, a_eff


@jax.custom_vjp
def alpha_to_weights(alpha: jnp.ndarray, valid: jnp.ndarray):
    """[N, S] alphas (+ validity) -> per-sample weights, per-ray residual T.

    Returns:
      weights:        [N, S] compositing weights ``T_i * alpha_i``.
      alphainv_last:  [N]    residual transmittance after the last
                      processed sample (background weight).
    """
    weights, alphainv_last, _, _, _ = _forward(alpha, valid)
    return weights, alphainv_last


def _fwd(alpha, valid):
    weights, alphainv_last, t, processed, a_eff = _forward(alpha, valid)
    return (weights, alphainv_last), (weights, alphainv_last, t, processed, a_eff)


def _bwd(res, grads):
    weights, alphainv_last, t, processed, a_eff = res
    g_w, g_last = grads
    g_w = jnp.where(processed, g_w, 0.0)
    # back_cum_i = g_last * alphainv_last + sum_{j>i} g_w_j * w_j
    # (reference accumulation order, `render_utils_kernel.cu:671-675`).
    gww = g_w * weights
    suffix = _scan_last(gww, jnp.add, 0.0, reverse=True) - gww
    back_cum = g_last[..., None] * alphainv_last[..., None] + suffix
    # maximum() rather than the reference's `(1-alpha)+1e-10`: XLA may
    # reassociate the literal add into `(1+1e-10)-alpha`, which rounds
    # back to `1-alpha` in fp32 and reintroduces the 0/0 at alpha == 1.
    grad_alpha = g_w * t - back_cum / jnp.maximum(1.0 - a_eff, _GUARD)
    grad_alpha = jnp.where(processed, grad_alpha, 0.0)
    return grad_alpha, None


alpha_to_weights.defvjp(_fwd, _bwd)


def cumprod_exclusive_reference(alpha: jnp.ndarray) -> jnp.ndarray:
    """Dense golden model: exclusive cumprod of (1 - alpha) with the
    leading-ones convention of `model/dvgo.py:409-413`."""
    return _exclusive_cumprod(1.0 - alpha, axis=-1)
