"""TensoRF VM grid: decomposition consistency (sampling the factored
representation == trilinear sampling its densified grid at lattice
nodes) and shape checks."""
import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.core.grids import (
    init_tensorf_params, tensorf_densify, tensorf_sample,
)


def test_sample_matches_densified_at_nodes(rng):
    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    box = SceneBox.create(xyz_min, xyz_max)
    ws = (6, 7, 5)
    for channels in (1, 4):
        params = init_tensorf_params(jax.random.PRNGKey(0), channels, ws, n_comp=3)
        dense = tensorf_densify(params, channels)
        assert dense.shape == (*ws, channels)
        # query exactly at lattice nodes: factored == densified
        ii = rng.integers(0, ws[0], 20)
        jj = rng.integers(0, ws[1], 20)
        kk = rng.integers(0, ws[2], 20)
        xyz = np.stack(
            [
                xyz_min[0] + ii / (ws[0] - 1) * 2.0,
                xyz_min[1] + jj / (ws[1] - 1) * 2.0,
                xyz_min[2] + kk / (ws[2] - 1) * 2.0,
            ],
            -1,
        ).astype(np.float32)
        out = tensorf_sample(params, jnp.asarray(xyz), box, channels)
        gold = np.asarray(dense)[ii, jj, kk]
        if channels == 1:
            gold = gold[..., 0]
        np.testing.assert_allclose(np.asarray(out), gold, atol=1e-4)


def test_sample_interpolates_smoothly(rng):
    xyz_min = np.array([0.0, 0.0, 0.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    box = SceneBox.create(xyz_min, xyz_max)
    params = init_tensorf_params(jax.random.PRNGKey(1), 2, (8, 8, 8), n_comp=2)
    a = tensorf_sample(params, jnp.asarray([[0.5, 0.5, 0.5]]), box, 2)
    b = tensorf_sample(params, jnp.asarray([[0.5 + 1e-4, 0.5, 0.5]]), box, 2)
    assert float(jnp.abs(a - b).max()) < 1e-2
