"""Masked transmittance scan vs a serial golden model of the CUDA
``alpha2weight`` forward/backward (`render_utils_kernel.cu:577-707`)."""
import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.ops.transmittance import alpha_to_weights, EARLY_EXIT_T


def golden_scan(alpha_rows):
    """Serial per-ray scan with the reference's 1e-3 early exit."""
    weights = np.zeros_like(alpha_rows)
    T = np.ones_like(alpha_rows)
    alphainv_last = np.ones(alpha_rows.shape[0], np.float64)
    i_end = np.zeros(alpha_rows.shape[0], np.int64)
    for r, row in enumerate(alpha_rows):
        T_cum = 1.0
        i = 0
        for i in range(len(row)):
            T[r, i] = T_cum
            weights[r, i] = T_cum * row[i]
            T_cum *= 1.0 - row[i]
            if T_cum < EARLY_EXIT_T:
                i += 1
                break
        else:
            i = len(row)
        i_end[r] = i
        alphainv_last[r] = T_cum
    return weights, T, alphainv_last, i_end


def golden_backward(alpha, weights, T, alphainv_last, i_end, gw, glast):
    grad = np.zeros_like(alpha)
    for r in range(alpha.shape[0]):
        back_cum = glast[r] * alphainv_last[r]
        for i in range(i_end[r] - 1, -1, -1):
            grad[r, i] = gw[r, i] * T[r, i] - back_cum / (1 - alpha[r, i] + 1e-10)
            back_cum += gw[r, i] * weights[r, i]
    return grad


def random_alphas(rng, n, s, spicy=False):
    a = rng.uniform(0.0, 0.35, size=(n, s))
    if spicy:
        # force some rays through the early-exit threshold and include
        # exact-one alphas (the clip in sdf2alpha can emit 1.0)
        a[: n // 2, : s // 2] = rng.uniform(0.5, 1.0, size=(n // 2, s // 2))
        a[0, 3] = 1.0
    return a.astype(np.float64)


def test_forward_matches_serial(rng):
    a = random_alphas(rng, 16, 40, spicy=True)
    valid = np.ones_like(a, bool)
    w, ainv = alpha_to_weights(jnp.asarray(a, jnp.float32), jnp.asarray(valid))
    gw, gT, gainv, _ = golden_scan(a)
    np.testing.assert_allclose(np.asarray(w), gw, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ainv), gainv, atol=2e-6)


def test_forward_respects_validity_mask(rng):
    a = random_alphas(rng, 8, 30)
    valid = rng.uniform(size=a.shape) > 0.4
    # Golden: the ragged stream only contains valid samples.
    w, ainv = alpha_to_weights(jnp.asarray(a, jnp.float32), jnp.asarray(valid))
    for r in range(a.shape[0]):
        live = np.where(valid[r])[0]
        gw, _, gainv, _ = golden_scan(a[r, live][None])
        np.testing.assert_allclose(np.asarray(w)[r, live], gw[0], atol=2e-6)
        assert not np.asarray(w)[r, ~valid[r]].any()
        np.testing.assert_allclose(np.asarray(ainv)[r], gainv[0], atol=2e-6)


def test_backward_matches_serial(rng):
    a = random_alphas(rng, 12, 24, spicy=True)
    valid = np.ones_like(a, bool)
    gw_in = rng.normal(size=a.shape)
    glast_in = rng.normal(size=a.shape[0])

    def scalar_fn(alpha):
        w, ainv = alpha_to_weights(alpha, jnp.asarray(valid))
        return jnp.sum(w * jnp.asarray(gw_in, jnp.float32)) + jnp.sum(
            ainv * jnp.asarray(glast_in, jnp.float32)
        )

    grad = jax.grad(scalar_fn)(jnp.asarray(a, jnp.float32))
    weights, T, ainv, i_end = golden_scan(a)
    ggrad = golden_backward(a, weights, T, ainv, i_end, gw_in, glast_in)
    np.testing.assert_allclose(np.asarray(grad), ggrad, atol=3e-4)


def test_no_nan_at_alpha_one():
    a = jnp.zeros((1, 8)).at[0, 2].set(1.0)
    valid = jnp.ones((1, 8), bool)

    def f(alpha):
        w, ainv = alpha_to_weights(alpha, valid)
        return jnp.sum(w) + jnp.sum(ainv)

    g = jax.grad(f)(a)
    assert np.isfinite(np.asarray(g)).all()
