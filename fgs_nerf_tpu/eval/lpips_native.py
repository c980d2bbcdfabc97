"""Torch-free LPIPS (v0.1, AlexNet trunk) on jax CPU.

The reference computes LPIPS via the `lpips` pip package
(`/root/reference/model/evaluation.py:59-74`), which needs a torchvision
backbone download — impossible in a zero-egress environment.  This
module reimplements the metric natively: the AlexNet feature trunk +
the LPIPS linear heads as plain `lax.conv` calls, with all weights
loaded from ONE local `.npz` pointed at by ``FGS_LPIPS_WEIGHTS``.

Produce the weights file once in any environment that has
`lpips` + `torchvision` installed (it embeds both the ImageNet backbone
and the LPIPS linear heads, ~9 MB):

    python scripts/export_lpips_weights.py /path/to/lpips_alex.npz

Math (LPIPS v0.1, `lpips/lpips.py` upstream): images scaled to [-1, 1],
ImageNet shift/scale, AlexNet convs with taps after each ReLU,
per-channel unit normalization, squared difference, non-negative 1x1
linear head per tap, spatial mean, sum over taps.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# AlexNet feature trunk (torchvision layout): (out, in, k, stride, pad),
# with 3x3/stride-2 max pools after taps 0 and 1.
_ALEX = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_CACHE: Dict[str, object] = {}


def weights_path() -> Optional[str]:
    p = os.environ.get("FGS_LPIPS_WEIGHTS")
    return p if p and os.path.exists(p) else None


def fallback_enabled() -> bool:
    """Weights-free fallback gate (on unless FGS_LPIPS_FALLBACK=0)."""
    return os.environ.get("FGS_LPIPS_FALLBACK", "1") not in (
        "0", "False", "false"
    )


def _fallback_weights() -> Dict[str, np.ndarray]:
    """Deterministic random-feature weights (seed 0, He-init convs,
    uniform linear heads).

    Zero-egress stand-in for the pretrained AlexNet+LPIPS weights: a
    fixed randomly-initialized conv trunk with the same architecture
    and the same normalized-feature squared-difference math.  Random
    conv features are a known serviceable perceptual distance (they
    respond to edges/texture scale like early conv layers), and the
    fixed seed makes values reproducible across runs/machines — usable
    for regression tracking and relative comparisons, NOT comparable to
    published LPIPS numbers (`/root/reference/model/evaluation.py:59-74`
    uses the pretrained net; export real weights with
    ``scripts/export_lpips_weights.py`` to match it exactly).
    """
    rng = np.random.default_rng(0)
    w: Dict[str, np.ndarray] = {}
    for i, (co, ci, k, _, _) in enumerate(_ALEX):
        w[f"conv{i}_w"] = (
            rng.normal(size=(co, ci, k, k)).astype(np.float32)
            * np.sqrt(2.0 / (ci * k * k))
        )
        w[f"conv{i}_b"] = np.zeros(co, np.float32)
        w[f"lin{i}"] = np.full((co,), 1.0 / co, np.float32)
    return w


def load_weights(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        w = {k: z[k] for k in z.files}
    for i, (co, ci, k, _, _) in enumerate(_ALEX):
        if w[f"conv{i}_w"].shape != (co, ci, k, k):
            raise ValueError(
                f"conv{i}_w shape {w[f'conv{i}_w'].shape} != {(co, ci, k, k)}"
            )
        if w[f"lin{i}"].shape != (co,):
            raise ValueError(f"lin{i} shape {w[f'lin{i}'].shape} != ({co},)")
    return w


def _features(x, w):
    """x: [1, 3, H, W] in [-1, 1] -> list of 5 tap tensors."""
    import jax
    import jax.numpy as jnp

    h = (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
    taps = []
    for i, (_, _, _, stride, pad) in enumerate(_ALEX):
        h = jax.lax.conv_general_dilated(
            h, jnp.asarray(w[f"conv{i}_w"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(w[f"conv{i}_b"]).reshape(1, -1, 1, 1)
        h = jax.nn.relu(h)
        taps.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, 3, 3),
                window_strides=(1, 1, 2, 2), padding="VALID",
            )
    return taps


def _distance(im0, im1, w):
    import jax.numpy as jnp

    t0 = _features(im0, w)
    t1 = _features(im1, w)
    total = jnp.zeros(())
    for i, (a, b) in enumerate(zip(t0, t1)):
        na = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2  # [1, C, H', W']
        lin = jnp.asarray(np.maximum(w[f"lin{i}"], 0.0)).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total


def lpips_native(np_gt: np.ndarray, np_im: np.ndarray) -> Optional[float]:
    """LPIPS(alex) of two [H, W, 3] float images in [0, 1].

    Uses the exported pretrained weights when ``FGS_LPIPS_WEIGHTS`` is
    set; otherwise the deterministic random-feature fallback (loud
    one-time warning).  Returns None only when the fallback is disabled
    via ``FGS_LPIPS_FALLBACK=0`` and no weights file exists."""
    path = weights_path()
    if path is None and not fallback_enabled():
        return None
    import jax

    key = path or "<fallback>"
    if "w" not in _CACHE or _CACHE.get("path") != key:
        if path is None:
            import warnings

            warnings.warn(
                "FGS_LPIPS_WEIGHTS is not set — LPIPS is running on the "
                "DETERMINISTIC RANDOM-FEATURE fallback (fixed-seed conv "
                "trunk, same metric math).  Values are reproducible and "
                "usable for regression tracking, but NOT comparable to "
                "published LPIPS numbers.  Export the pretrained weights "
                "once with scripts/export_lpips_weights.py to match the "
                "reference metric exactly.",
                stacklevel=2,
            )
            _CACHE["w"] = _fallback_weights()
        else:
            _CACHE["w"] = load_weights(path)
        _CACHE["path"] = key

        def f(a, b):
            return _distance(a, b, _CACHE["w"])

        _CACHE["fn"] = jax.jit(f, backend="cpu")

    def chw(x):
        return np.transpose(
            np.asarray(x, np.float32) * 2.0 - 1.0, (2, 0, 1)
        )[None]

    return float(_CACHE["fn"](chw(np_gt), chw(np_im)))
