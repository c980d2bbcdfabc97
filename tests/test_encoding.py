"""Encodings vs torch goldens (`model/nerf.py:837-839`,
`model/utils.py:515-574`)."""
import numpy as np
import jax.numpy as jnp
import torch

from fgs_nerf_tpu.ops.encoding import (
    freq_bank, l2_normalize, make_ide_fn, reflect, sincos_encode,
)


def test_sincos_layout_matches_torch(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    n = 5
    ours = np.asarray(sincos_encode(jnp.asarray(x), freq_bank(n)))
    xt = torch.from_numpy(x)
    freqs = torch.FloatTensor([2.0**i for i in range(n)])
    emb = (xt.unsqueeze(-1) * freqs).flatten(-2)
    gold = torch.cat([xt, emb.sin(), emb.cos()], -1).numpy()
    np.testing.assert_allclose(ours, gold, atol=1e-6)
    assert ours.shape == (10, 3 + 3 * n * 2)


def test_reflect(rng):
    v = rng.normal(size=(20, 3)).astype(np.float32)
    n = rng.normal(size=(20, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    r = np.asarray(reflect(jnp.asarray(v), jnp.asarray(n)))
    gold = v - 2.0 * (v * n).sum(-1, keepdims=True) * n
    np.testing.assert_allclose(r, gold, atol=1e-6)
    # reflection preserves norm for unit normals
    np.testing.assert_allclose(
        np.linalg.norm(r, axis=-1), np.linalg.norm(v, axis=-1), atol=1e-5
    )


def test_l2_normalize(rng):
    x = rng.normal(size=(30, 3)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    z = np.asarray(l2_normalize(jnp.zeros((2, 3))))
    assert np.isfinite(z).all()


def test_ide_basic_properties(rng):
    ide = make_ide_fn(4)
    d = rng.normal(size=(12, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    kappa_inv = np.zeros((12, 1), np.float32)
    out = np.asarray(ide(jnp.asarray(d), jnp.asarray(kappa_inv)))
    # K = sum over i<deg of (2^i + 1) = 2+3+5+9 = 19 components, x2 (re+im)
    assert out.shape == (12, 38)
    assert np.isfinite(out).all()
    # attenuation: larger kappa_inv shrinks high-degree components
    out_wide = np.asarray(ide(jnp.asarray(d), jnp.full((12, 1), 1.0, np.float32)))
    assert np.abs(out_wide).sum() < np.abs(out).sum()
