"""Directional / positional encodings: sin-cos PE, mirror reflection,
and the ref-NeRF integrated directional encoding (IDE).

Parity notes: the reference builds power-of-two frequency banks
(`model/nerf.py:98-100`) and concatenates ``[x, sin(x*f), cos(x*f)]``
inline in its forwards (`model/nerf.py:837-839, 870-872, 879-881`).
The IDE (`model/utils.py:515-574`) is instantiated by the reference but
never called from any forward; it is provided here for capability
parity and is exercised by tests only.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def freq_bank(n: int) -> jnp.ndarray:
    """[2^0, ..., 2^(n-1)] (`model/nerf.py:98-100`)."""
    return jnp.asarray([2.0**i for i in range(n)], jnp.float32)


def sincos_encode(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """[..., D] -> [..., D + 2*D*F]: identity, then interleaved-by-freq
    sin and cos (torch ``(x.unsqueeze(-1)*freqs).flatten(-2)`` layout:
    for each component, all frequencies contiguous)."""
    xf = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(xf), jnp.cos(xf)], axis=-1)


def reflect(viewdirs: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection ``d - 2(d.n)n`` (`model/nerf.py:879, 998`).
    Note the reference reflects the *camera-to-point* direction."""
    return viewdirs - 2.0 * jnp.sum(viewdirs * normal, axis=-1, keepdims=True) * normal


def l2_normalize(x: jnp.ndarray, eps: float = float(np.finfo(np.float32).eps)):
    """Unit-normalize along the last axis (`model/nerf.py:480-483`)."""
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), eps))


# ---------------------------------------------------------------------------
# Integrated directional encoding (ref-NeRF eq. 6-8), from the spherical
# harmonic coefficient construction of `model/utils.py:168-210, 515-574`.
# ---------------------------------------------------------------------------


def _generalized_binomial_coeff(a: float, k: int) -> float:
    return float(np.prod(a - np.arange(k)) / math.factorial(k))


def _assoc_legendre_coeff(l: int, m: int, k: int) -> float:
    return float(
        (-1) ** m
        * 2**l
        * math.factorial(l)
        / math.factorial(k)
        / math.factorial(l - k - m)
        * _generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l)
    )


def _sph_harm_coeff(l: int, m: int, k: int) -> float:
    return float(
        np.sqrt(
            (2.0 * l + 1.0)
            * math.factorial(l - m)
            / (4.0 * np.pi * math.factorial(l + m))
        )
        * _assoc_legendre_coeff(l, m, k)
    )


def make_ide_fn(deg_view: int):
    """Integrated directional encoding closure (`model/utils.py:515-574`).

    Returns ``ide(xyz [..., 3], kappa_inv [..., 1]) -> [..., 2*K]``
    (real parts then imaginary parts).
    """
    if deg_view > 5:
        raise ValueError("deg_view > 5 is numerically unstable")
    ml_list = []
    for i in range(deg_view):
        l = 2**i
        for m in range(l + 1):
            ml_list.append((m, l))
    ml_array = np.array(ml_list).T  # [2, K]
    l_max = 2 ** (deg_view - 1)

    mat = np.zeros((l_max + 1, ml_array.shape[1]), np.float32)
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)
    mat_j = jnp.asarray(mat)
    m_arr = jnp.asarray(ml_array[0], jnp.float32)
    l_arr = jnp.asarray(ml_array[1], jnp.float32)
    m_int = np.asarray(ml_array[0])

    def ide(xyz: jnp.ndarray, kappa_inv: jnp.ndarray) -> jnp.ndarray:
        x = xyz[..., 0:1]
        y = xyz[..., 1:2]
        z = xyz[..., 2:3]
        vmz = jnp.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
        xy = x + 1j * y
        vmxy = jnp.concatenate([xy**int(m) for m in m_int], axis=-1)
        sph_harms = vmxy * (vmz @ mat_j)
        sigma = 0.5 * l_arr * (l_arr + 1.0)
        ide_c = sph_harms * jnp.exp(-sigma * kappa_inv)
        return jnp.concatenate([jnp.real(ide_c), jnp.imag(ide_c)], axis=-1)

    del m_arr
    return ide
