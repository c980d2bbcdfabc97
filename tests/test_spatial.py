"""Spatial grid sharding (`parallel/spatial.py`): halo exchange,
sharded stencils, and the sharded trilinear gather all match their
dense single-device counterparts on the virtual CPU mesh — including
the backward through ppermute/psum (VJP parity vs the dense grid
gradient).  Edge cases: global border planes, out-of-range samples,
shard counts 2/4/8.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fgs_nerf_tpu.ops.interp import trilinear_sample_index
from fgs_nerf_tpu.ops.stencils import sdf_gradient, smooth_grid
from fgs_nerf_tpu.parallel.spatial import (
    halo_exchange,
    pad_to_multiple,
    sharded_sdf_gradient,
    sharded_stencil,
    sharded_trilinear_sample,
)

shard_map = jax.shard_map


def sp_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


def shard_x(mesh, grid):
    return jax.device_put(grid, NamedSharding(mesh, P("sp")))


def run_sharded(mesh, fn, grid, *repl_args, out_spec=P("sp")):
    """shard_map ``fn(slab, *repl)`` with the grid x-sharded."""
    f = shard_map(
        fn, mesh=mesh,
        in_specs=(P("sp"),) + (P(),) * len(repl_args),
        out_specs=out_spec,
    )
    return jax.jit(f)(shard_x(mesh, grid), *repl_args)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("halo", [1, 2])
def test_halo_exchange_zero(rng, n_shards, halo):
    x = 16
    grid = jnp.asarray(rng.normal(size=(x, 3, 4, 2)).astype(np.float32))
    mesh = sp_mesh(n_shards)
    ext = run_sharded(
        mesh, lambda s: halo_exchange(s, halo, "sp", edge="zero"), grid
    )
    ext = np.asarray(ext).reshape(n_shards, -1, 3, 4, 2)
    xl = x // n_shards
    gp = np.pad(np.asarray(grid), ((halo, halo), (0, 0), (0, 0), (0, 0)))
    for i in range(n_shards):
        np.testing.assert_array_equal(ext[i], gp[i * xl : i * xl + xl + 2 * halo])


@pytest.mark.parametrize("n_shards", [2, 4])
def test_halo_exchange_replicate(rng, n_shards):
    x, halo = 8, 2
    grid = jnp.asarray(rng.normal(size=(x, 3, 3, 1)).astype(np.float32))
    mesh = sp_mesh(n_shards)
    ext = run_sharded(
        mesh, lambda s: halo_exchange(s, halo, "sp", edge="replicate"), grid
    )
    ext = np.asarray(ext).reshape(n_shards, -1, 3, 3, 1)
    g = np.asarray(grid)
    gp = np.concatenate([np.repeat(g[:1], halo, 0), g, np.repeat(g[-1:], halo, 0)])
    xl = x // n_shards
    for i in range(n_shards):
        np.testing.assert_array_equal(ext[i], gp[i * xl : i * xl + xl + 2 * halo])


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_smooth_matches_dense(rng, n_shards):
    grid = jnp.asarray(rng.normal(size=(16, 7, 6, 2)).astype(np.float32))
    dense = smooth_grid(grid, 5, 0.8)
    out = run_sharded(
        mesh := sp_mesh(n_shards),
        lambda s: sharded_stencil(
            lambda g: smooth_grid(g, 5, 0.8), s, 2, "sp", edge="replicate"
        ),
        grid,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-6)


@pytest.mark.parametrize("mode", ["interpolate", "raw", "grad_conv"])
@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_sdf_gradient_matches_dense(rng, mode, n_shards):
    sdf = jnp.asarray(rng.normal(size=(12, 6, 5, 1)).astype(np.float32))
    vs = 0.37
    dense = sdf_gradient(sdf, vs, mode)
    out = run_sharded(
        sp_mesh(n_shards),
        lambda s: sharded_sdf_gradient(s, vs, "sp", mode=mode),
        sdf,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def _sample_idx(rng, x, y, z, m):
    """Fractional index coords covering interior, borders, and
    out-of-range (the zero-padding semantics)."""
    idx = np.stack(
        [
            rng.uniform(-1.5, x + 0.5, size=m),
            rng.uniform(-1.5, y + 0.5, size=m),
            rng.uniform(-1.5, z + 0.5, size=m),
        ],
        axis=-1,
    ).astype(np.float32)
    # exact node / exact border hits
    idx[0] = [0.0, 0.0, 0.0]
    idx[1] = [x - 1.0, y - 1.0, z - 1.0]
    idx[2] = [x - 1.5, 0.5, z - 1.0]
    idx[3] = [-0.5, 0.0, 0.0]  # base -1, corner 0 valid
    return idx


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_trilinear_matches_dense(rng, n_shards):
    x, y, z, c = 16, 6, 5, 3
    grid = jnp.asarray(rng.normal(size=(x, y, z, c)).astype(np.float32))
    idx = jnp.asarray(_sample_idx(rng, x, y, z, 257))
    dense = trilinear_sample_index(grid, idx)
    out = run_sharded(
        sp_mesh(n_shards),
        lambda s, i: sharded_trilinear_sample(s, i, x, "sp"),
        grid,
        idx,
        out_spec=P(),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_trilinear_grid_grad_matches_dense(rng, n_shards):
    """VJP parity: d/d(grid) of a scalar loss through the sharded gather
    equals the dense sort-scatter gradient (ppermute transpose routes
    halo-plane cotangents back to their owner)."""
    x, y, z, c = 8, 5, 4, 2
    grid = jnp.asarray(rng.normal(size=(x, y, z, c)).astype(np.float32))
    idx = jnp.asarray(_sample_idx(rng, x, y, z, 129))
    cot = jnp.asarray(rng.normal(size=(129, c)).astype(np.float32))

    g_dense = jax.grad(
        lambda g: jnp.sum(trilinear_sample_index(g, idx) * cot)
    )(grid)

    mesh = sp_mesh(n_shards)

    def loss_slab(slab, idx, cot):
        vals = sharded_trilinear_sample(slab, idx, x, "sp")
        return jax.lax.psum(jnp.sum(vals * cot) / n_shards, "sp")

    g_sh = jax.jit(
        shard_map(
            jax.grad(loss_slab), mesh=mesh,
            in_specs=(P("sp"), P(), P()), out_specs=P("sp"),
        )
    )(shard_x(mesh, grid), idx, cot)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_dense), atol=1e-4)


def test_pad_to_multiple(rng):
    g = jnp.asarray(rng.normal(size=(10, 3, 3, 1)).astype(np.float32))
    padded, orig = pad_to_multiple(g, 4)
    assert orig == 10 and padded.shape[0] == 12
    np.testing.assert_array_equal(np.asarray(padded[:10]), np.asarray(g))
    assert float(jnp.abs(padded[10:]).sum()) == 0.0
    same, orig2 = pad_to_multiple(g, 5)
    assert same.shape[0] == 10 and orig2 == 10
