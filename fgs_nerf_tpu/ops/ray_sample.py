"""Fixed-shape ray sampling: the TPU-native replacement for the ragged
CUDA point-stream sampler.

The reference generates a flat, data-dependent stream of samples
(``sample_pts_on_rays``, `model/cuda/render_utils_kernel.cu:196-242`):
per-ray slab intersection, per-ray sample counts, and a cumsum-based
ragged allocation, followed by boolean compaction in Python
(`model/nerf.py:674-698`).  Data-dependent shapes defeat XLA, so here
every ray gets a static ``s_max`` sample slots and a validity mask; a
masked sample contributes exactly nothing downstream (alpha is zeroed
before the transmittance scan), which is mathematically identical to
removing it from the stream.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox


class RaySamples(NamedTuple):
    """A fixed-shape lattice of sample points.

    pts:       [N, S, 3] world-space sample positions.
    valid:     [N, S]    True where the slot holds a real in-bbox sample.
    t_min:     [N]       entry distance (in units of |rays_d|).
    t_max:     [N]       exit distance.
    n_steps:   [N]       per-ray live sample count (== reference N_steps).
    step_dist: []        world-space distance between consecutive samples.
    """

    pts: jnp.ndarray
    valid: jnp.ndarray
    t_min: jnp.ndarray
    t_max: jnp.ndarray
    n_steps: jnp.ndarray
    step_dist: jnp.ndarray


def ray_box_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    box: SceneBox,
    near: float,
    far: float,
):
    """Slab test clamped to [near, far].

    Parity with ``infer_t_minmax`` (`render_utils_kernel.cu:12-35`):
    zero direction components are replaced by 1e-6, and both t values
    are clamped as ``max(min(v, far), near)``.
    """
    vec = jnp.where(rays_d == 0.0, 1e-6, rays_d)
    rate_a = (box.xyz_max - rays_o) / vec
    rate_b = (box.xyz_min - rays_o) / vec
    t_min = jnp.max(jnp.minimum(rate_a, rate_b), axis=-1)
    t_max = jnp.min(jnp.maximum(rate_a, rate_b), axis=-1)
    t_min = jnp.maximum(jnp.minimum(t_min, far), near)
    t_max = jnp.maximum(jnp.minimum(t_max, far), near)
    return t_min, t_max


def sample_along_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    box: SceneBox,
    near: float,
    step_dist: float,
    s_max: int,
    far: float = 1e9,
) -> RaySamples:
    """Uniform sampling from box entry, one slot per step.

    Parity with ``sample_pts_on_rays`` + the in-bbox compaction
    (`render_utils_kernel.cu:196-242`, `model/nerf.py:690-698`): the
    ray marches from ``o + d * t_min`` along the *unit* direction with
    a fixed world-space step, taking ``max(ceil((t_max-t_min)*|d| /
    step_dist), 1)`` steps; slots past that count or outside the box
    are masked out.  The reference passes far=1e9 regardless of the
    dataset far plane (`model/nerf.py:686`), which we inherit via the
    default.
    """
    t_min, t_max = ray_box_intersect(rays_o, rays_d, box, near, far)
    d_norm = jnp.linalg.norm(rays_d, axis=-1)
    n_steps = jnp.maximum(
        jnp.ceil((t_max - t_min) * d_norm / step_dist), 1.0
    ).astype(jnp.int32)

    start = rays_o + rays_d * t_min[..., None]
    dir_unit = rays_d / d_norm[..., None]

    step_ids = jnp.arange(s_max, dtype=jnp.float32)  # [S]
    dist = step_ids * step_dist  # [S]
    pts = start[:, None, :] + dir_unit[:, None, :] * dist[None, :, None]

    in_range = step_ids[None, :] < n_steps[:, None].astype(jnp.float32)
    in_bbox = jnp.all(
        (pts >= box.xyz_min) & (pts <= box.xyz_max), axis=-1
    )
    valid = in_range & in_bbox
    return RaySamples(
        pts=pts,
        valid=valid,
        t_min=t_min,
        t_max=t_max,
        n_steps=n_steps,
        step_dist=jnp.asarray(step_dist, jnp.float32),
    )
