"""Fixed-shape sampler vs a ragged numpy golden model of the CUDA sampler
(`model/cuda/render_utils_kernel.cu:12-242` semantics)."""
import numpy as np
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox, max_samples_per_ray, grid_resolution
from fgs_nerf_tpu.ops.ray_sample import ray_box_intersect, sample_along_rays


def golden_ragged_sampler(rays_o, rays_d, xyz_min, xyz_max, near, far, stepdist):
    """Numpy re-statement of the ragged sampler contract."""
    out = []
    for o, d in zip(rays_o, rays_d):
        vec = np.where(d == 0, 1e-6, d)
        rate_a = (xyz_max - o) / vec
        rate_b = (xyz_min - o) / vec
        t_min = np.minimum(rate_a, rate_b).max()
        t_max = np.maximum(rate_a, rate_b).min()
        t_min = max(min(t_min, far), near)
        t_max = max(min(t_max, far), near)
        rnorm = np.linalg.norm(d)
        n_steps = max(int(np.ceil((t_max - t_min) * rnorm / stepdist)), 1)
        start = o + d * t_min
        du = d / rnorm
        pts = start[None] + du[None] * (stepdist * np.arange(n_steps))[:, None]
        inb = np.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
        out.append((t_min, t_max, n_steps, pts, inb))
    return out


def make_rays(rng, n):
    rays_o = rng.normal(size=(n, 3)).astype(np.float32) * 2.0 + np.array(
        [0, 0, 4], np.float32
    )
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    rays_d = (target - rays_o) * rng.uniform(0.5, 2.0, size=(n, 1)).astype(np.float32)
    return rays_o, rays_d


def test_slab_matches_golden(rng):
    xyz_min = np.array([-1.2, -1.0, -1.1], np.float32)
    xyz_max = np.array([1.1, 1.3, 1.0], np.float32)
    box = SceneBox.create(xyz_min, xyz_max)
    rays_o, rays_d = make_rays(rng, 64)
    t_min, t_max = ray_box_intersect(
        jnp.asarray(rays_o), jnp.asarray(rays_d), box, near=0.2, far=1e9
    )
    gold = golden_ragged_sampler(rays_o, rays_d, xyz_min, xyz_max, 0.2, 1e9, 0.05)
    np.testing.assert_allclose(np.asarray(t_min), [g[0] for g in gold], rtol=2e-6)
    np.testing.assert_allclose(np.asarray(t_max), [g[1] for g in gold], rtol=2e-6)


def test_fixed_shape_sampler_matches_ragged(rng):
    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    box = SceneBox.create(xyz_min, xyz_max)
    stepdist = 0.11
    rays_o, rays_d = make_rays(rng, 32)
    s_max = 64
    rs = sample_along_rays(
        jnp.asarray(rays_o), jnp.asarray(rays_d), box, near=0.2,
        step_dist=stepdist, s_max=s_max,
    )
    gold = golden_ragged_sampler(rays_o, rays_d, xyz_min, xyz_max, 0.2, 1e9, stepdist)
    pts = np.asarray(rs.pts)
    valid = np.asarray(rs.valid)
    n_steps = np.asarray(rs.n_steps)
    for i, (t0, t1, ns, gpts, ginb) in enumerate(gold):
        assert n_steps[i] == ns
        # valid slots == in-range AND in-bbox, same count as ragged stream
        np.testing.assert_array_equal(valid[i, :ns], ginb)
        assert not valid[i, ns:].any()
        live = np.where(ginb)[0]
        np.testing.assert_allclose(pts[i, live], gpts[live], atol=1e-5)


def test_s_max_bound_is_sufficient(rng):
    xyz_min = np.array([-1.0, -1.0, -1.0], np.float32)
    xyz_max = np.array([1.0, 1.0, 1.0], np.float32)
    ws, vs = grid_resolution(xyz_min, xyz_max, 120**3)
    assert ws == (120, 120, 120)
    stepsize = 0.5
    s_max = max_samples_per_ray(ws, stepsize)
    stepdist = stepsize * vs
    box = SceneBox.create(xyz_min, xyz_max)
    rays_o, rays_d = make_rays(rng, 256)
    rs = sample_along_rays(
        jnp.asarray(rays_o), jnp.asarray(rays_d), box, near=0.05,
        step_dist=stepdist, s_max=s_max,
    )
    assert int(np.asarray(rs.n_steps).max()) <= s_max
    assert s_max % 8 == 0
