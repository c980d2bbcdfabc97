"""Sort-based grid-gradient scatter vs the autodiff (XLA scatter-add)
golden: exact agreement incl. duplicates, OOB corners, and boundaries."""
import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.ops.interp import (
    _trilinear_sample_index_impl, trilinear_sample, trilinear_sample_index,
)
from fgs_nerf_tpu.ops.scatter import corner_scatter_grid_grad


def golden_grid_grad(grid_shape, idx, g):
    grid0 = jnp.zeros(grid_shape, jnp.float32)

    def f(grid):
        return jnp.sum(_trilinear_sample_index_impl(grid, idx) * g)

    return jax.grad(f)(grid0)


def run_case(rng, grid_shape, m, idx_maker):
    idx = idx_maker(rng, m).astype(np.float32)
    g = rng.normal(size=(m, grid_shape[-1])).astype(np.float32)
    gold = np.asarray(golden_grid_grad(grid_shape, jnp.asarray(idx), jnp.asarray(g)))
    i0 = np.floor(idx).astype(np.int32)
    fr = idx - i0
    ours = np.asarray(
        corner_scatter_grid_grad(
            jnp.asarray(i0), jnp.asarray(fr), jnp.asarray(g), grid_shape
        )
    )
    np.testing.assert_allclose(ours, gold, atol=5e-4, rtol=1e-4)


def test_uniform_random(rng):
    run_case(
        rng, (9, 8, 7, 3), 5000,
        lambda r, m: r.uniform(0, 6.99, size=(m, 3)),
    )


def test_heavy_duplicates(rng):
    # many samples landing in very few cells (stress the rank windows)
    def maker(r, m):
        cells = r.integers(0, 3, size=(m, 3)).astype(np.float64)
        return cells + r.uniform(0, 1, size=(m, 3))
    run_case(rng, (6, 6, 6, 2), 4000, maker)


def test_out_of_bounds_and_borders(rng):
    def maker(r, m):
        base = r.uniform(-3.0, 9.0, size=(m, 3))  # includes OOB
        base[: m // 8] = 0.0          # exactly on the low corner
        base[m // 8: m // 4] = 4.0    # exactly on the high corner (5-grid)
        return base
    run_case(rng, (5, 5, 5, 4), 3000, maker)


def test_more_samples_than_block(rng):
    run_case(
        rng, (4, 4, 4, 1), 6000,
        lambda r, m: r.uniform(0, 2.99, size=(m, 3)),
    )


def test_custom_vjp_end_to_end(rng):
    box = SceneBox.create(
        np.array([-1.0, -1.0, -1.0], np.float32),
        np.array([1.0, 1.0, 1.0], np.float32),
    )
    grid = jnp.asarray(rng.normal(size=(8, 8, 8, 2)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-1.1, 1.1, size=(2000, 3)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2000, 2)).astype(np.float32))

    def loss(g):
        return jnp.sum(trilinear_sample(g, xyz, box) * cot)

    def loss_ref(g):
        sizes = jnp.asarray(g.shape[:3], jnp.float32)
        idx = box.normalize(xyz) * (sizes - 1.0)
        return jnp.sum(_trilinear_sample_index_impl(g, idx) * cot)

    np.testing.assert_allclose(float(loss(grid)), float(loss_ref(grid)), rtol=1e-5)
    g1 = np.asarray(jax.grad(loss)(grid))
    g2 = np.asarray(jax.grad(loss_ref)(grid))
    np.testing.assert_allclose(g1, g2, atol=5e-4, rtol=1e-4)


def test_gather_slots_vjp_matches_autodiff(rng):
    from fgs_nerf_tpu.models.sdf_voxel import _gather_slots_3d

    n, s, c, k = 4, 16, 3, 5
    x = jnp.asarray(rng.normal(size=(n, s, c)).astype(np.float32))
    idx = jnp.asarray(
        np.stack([rng.choice(s, size=k, replace=False) for _ in range(n)])
    ).astype(jnp.int32)
    cot = jnp.asarray(rng.normal(size=(n, k, c)).astype(np.float32))

    g1 = jax.grad(lambda xx: jnp.sum(_gather_slots_3d(xx, idx) * cot))(x)
    g2 = jax.grad(
        lambda xx: jnp.sum(jnp.take_along_axis(xx, idx[..., None], axis=1) * cot)
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
