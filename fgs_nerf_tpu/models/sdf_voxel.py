"""The SDF voxel renderer — TPU-native equivalent of the reference
``nerf`` module (`model/nerf.py:22-1170`).

Design (vs the reference's ragged CUDA pipeline):

* One static ``[n_rays, s_max]`` sample lattice per stage; every
  point-dropping mechanism of the reference (bbox mask, MaskCache,
  incremental-voxel mask, ``fast_color_thres`` on alpha and on weights)
  becomes a boolean lattice mask.  A masked sample has alpha forced to
  zero and therefore contributes nothing to the transmittance scan or
  any composite — the exact semantics of removal from the ragged
  stream.
* Rendering is two-pass: pass 1 touches every lattice slot but only
  with cheap field lookups (SDF + gradient -> alpha -> weights); pass 2
  gathers the top-``shade_k`` surviving samples per ray (order is
  irrelevant once weights are fixed, because compositing is a weighted
  sum) and runs the feature taps + MLP shading only on those.  With
  ``shade_k == 0`` shading runs dense over the lattice (golden path for
  tests).
* All per-step grid preprocessing (gaussian smoothing, whole-grid SDF
  gradients) happens inside the jitted step, matching the reference's
  per-iteration recomputation (`model/nerf.py:969-973`).

Parameters are a flat dict (names match the reference's optimizer
groups, `model/nerf_training.py:9-37`):
  sdf    [X, Y, Z, 1]
  k0     [X, Y, Z, k0_dim]
  refnet {w0, b0, ...}
  rgbnet {w0, b0, ...}        (fine stage only)
  s_val  [1]                  (trained only when s_learn)

Buffers are a dict of non-trained state:
  nonempty_mask [X, Y, Z, 1] bool      (stages with a mask cache)
  mask_cache    {grid, xyz_min, xyz_max}  (max-pooled prior-stage mask)
  inc_lower / inc_upper [3]            (incremental-voxel box, [0,1])
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.core.box import SceneBox, grid_resolution, max_samples_per_ray
from fgs_nerf_tpu.models.mlp import init_mlp, mlp_apply, refnet_dims, rgbnet_dims
from fgs_nerf_tpu.ops.encoding import freq_bank, l2_normalize, reflect, sincos_encode
from fgs_nerf_tpu.ops.interp import (
    center_gradient_taps,
    max_pool3d_same,
    resize_trilinear,
    sample_sdf_taps,
    trilinear_sample,
)
from fgs_nerf_tpu.ops.ray_sample import sample_along_rays
from fgs_nerf_tpu.ops.sdf2alpha import neus_alpha
from fgs_nerf_tpu.ops.stencils import sdf_gradient, smooth_grid
from fgs_nerf_tpu.ops.transmittance import alpha_to_weights


@dataclasses.dataclass(frozen=True)
class SDFModelConfig:
    """Static (hashable) model configuration for one training stage."""

    stage: str  # 'geometry_searching' | 'coarse' | 'fine'
    num_voxels: int
    num_voxels_base: int
    world_size: Tuple[int, int, int]
    voxel_size: float
    voxel_size_base: float
    s_max: int
    stepsize: float
    k0_dim: int = 12
    rgbnet_width: int = 256
    rgbnet_depth: int = 4
    refnet_width: int = 256
    refnet_depth: int = 4
    posbase_pe: int = 5
    viewbase_pe: int = 3
    refbase_pe: int = 8
    grad_feat: Tuple[float, ...] = ()
    sdf_feat: Tuple[float, ...] = ()
    k_grad_feat: Tuple[float, ...] = (1.0,)
    k_sdf_feat: Tuple[float, ...] = ()
    use_grad_norm: bool = True
    center_sdf: bool = True
    use_viewdir: bool = True
    grad_mode: str = "interpolate"
    s_ratio: float = 50.0
    s_start: float = 0.05
    s_learn: bool = False
    step_start: int = 0
    smooth_ksize: int = 0
    smooth_sigma: float = 1.0
    smooth_scale: bool = True
    fast_color_thres: float = 1e-4
    mask_cache_thres: float = 1e-3
    shade_k: int = 0  # 0 = dense shading; >0 = top-K compacted shading
    sample_k: int = 0  # 0 = full lattice; >0 = compact valid samples to k slots
    mlp_bf16: bool = True  # bf16 MXU matmuls (fp32 accum + master weights)
    # 'lattice': classic ray-major pipeline (gather crossings at the XLA
    # row-take floor).  'sorted': row-sorted stream engine
    # (ops/sorted_cm.py, channel-major) — geometry/coarse training fast
    # path; the per-sample pipeline runs in grid-row order and only
    # scalar channels cross back for the transmittance scan.
    engine: str = "lattice"
    # pack the sorted engine's per-sample fracs + viewdirs into u32
    # 16-bit pairs for the main stream sort (8 -> 5 sort operands;
    # lax.sort prices per payload column).  Positions quantize to
    # 1/65535 of a voxel and directions to ~3e-5 — deterministic, and
    # the backward differentiates the quantized forward exactly.
    sort_pack16: bool = True
    # Field representation for k0 (`model/grid.py:27-33` create_grid):
    # 'dense' (the reference's only configured choice) or 'tensorf'
    # (VM decomposition, `model/grid.py:136-247`) — factored params,
    # densified once per step (exactly the same function as sampling
    # the factorization directly, at dense-gather cost).
    grid_type: str = "dense"
    tensorf_n_comp: int = 8
    # remat the shading head (encodings + MLPs recompute in the
    # backward).  Saves ~2 GB of activations at ~10-15 ms/step of MXU
    # recompute on the coarse bench — turn off when HBM has headroom.
    shade_remat: bool = True

    @property
    def is_fine(self) -> bool:
        return self.stage == "fine"

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def step_dist(self) -> float:
        return self.stepsize * self.voxel_size

    @property
    def smooth_sdf(self) -> bool:
        return self.smooth_ksize > 0

    @property
    def all_displace(self) -> Tuple[float, ...]:
        """sorted(set(grad_feat | k_grad_feat)) (`model/nerf.py:843-849`);
        the reference asserts grad and sdf displacement sets match."""
        inds = tuple(sorted(set(self.grad_feat) | set(self.k_grad_feat)))
        sdf_inds = tuple(sorted(set(self.sdf_feat) | set(self.k_sdf_feat)))
        if inds != sdf_inds:
            raise ValueError("grad_feat/sdf_feat displacement sets must match")
        return inds

    def rgbnet_in_dim(self) -> int:
        """`model/nerf.py:108-112`."""
        d = (3 + 3 * self.posbase_pe * 2) + self.k0_dim + 3
        d += len(self.grad_feat) * 3 + len(self.sdf_feat) * 6
        if self.center_sdf:
            d += 1
        if self.use_viewdir:
            d += 3 + 3 * self.viewbase_pe * 2
        return d

    def refnet_in_dim(self) -> int:
        """`model/nerf.py:114-120`."""
        d = 3 + 3 * self.refbase_pe * 2
        if self.is_fine:
            d += self.refnet_width
        else:
            d += self.k0_dim + (3 + 3 * self.posbase_pe * 2) + 3
            if self.use_viewdir:
                d += 3 + 3 * self.viewbase_pe * 2
        return d


def make_model_config(
    stage: str,
    xyz_min,
    xyz_max,
    num_voxels: int,
    num_voxels_base: int,
    stepsize: float,
    shade_k: int = 0,
    sp_multiple: int = 1,
    **kwargs,
) -> SDFModelConfig:
    """Resolve dynamic voxel budget into static grid geometry
    (`model/nerf.py:67-71, 298-307`).

    ``sp_multiple``: round the x resolution up so spatial grid shards
    (the ``sp`` mesh axis) are equal-sized — an admissible resolution
    choice, like any ``num_voxels`` value."""
    world_size, voxel_size = grid_resolution(xyz_min, xyz_max, num_voxels)
    if sp_multiple > 1:
        x, y, z = world_size
        world_size = (x + (-x) % sp_multiple, y, z)
    if kwargs.get("engine") == "sorted":
        # pack alignment: (X+2)(Y+2) a multiple of 4 makes the sorted
        # engine's row space a flush-block multiple, so the backward
        # accumulate's combine view is a layout-free reshape (saves a
        # ~5.7 ms/step slice copy at the bench grid).  An admissible
        # resolution rounding, like sp_multiple (adds <= 3 x-planes).
        x, y, z = world_size
        while ((x + 2) * (y + 2)) % 4:
            x += 1
        world_size = (x, y, z)
    _, voxel_size_base = grid_resolution(xyz_min, xyz_max, num_voxels_base)
    s_max = max_samples_per_ray(world_size, stepsize)
    # Capacity auto-derivation: -1 means "exact from grid geometry" —
    # the full lattice depth, so no sample can ever overflow (the
    # compaction then only strips the lattice's alignment padding).
    # Explicit positive values trade exactness for speed; the trainer
    # warns loudly whenever ``overflow_frac > 0``.
    if shade_k == -1:
        shade_k = s_max
    if kwargs.get("sample_k") == -1:
        kwargs["sample_k"] = s_max
    # Capacities above the lattice depth are meaningless (and top_k
    # rejects k > axis size); clamp — the forward already treats
    # k >= s_max as "no compaction".
    shade_k = min(shade_k, s_max)
    if kwargs.get("sample_k", 0) > s_max:
        kwargs["sample_k"] = s_max
    return SDFModelConfig(
        stage=stage,
        num_voxels=num_voxels,
        num_voxels_base=num_voxels_base,
        world_size=world_size,
        voxel_size=voxel_size,
        voxel_size_base=voxel_size_base,
        s_max=s_max,
        stepsize=stepsize,
        shade_k=shade_k,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Parameter / buffer construction
# ---------------------------------------------------------------------------


def ball_init_sdf(world_size: Tuple[int, int, int], stage: str) -> jnp.ndarray:
    """Unit-ball SDF init (`model/nerf.py:76-82`): radius field on a
    [-1, 1]^3 lattice; non-geometry stages subtract 1."""
    axes = [np.linspace(-1.0, 1.0, n) for n in world_size]
    x, y, z = np.meshgrid(*axes, indexing="ij")
    r = np.sqrt(x**2 + y**2 + z**2)
    if stage != "geometry_searching":
        r = r - 1.0
    return jnp.asarray(r[..., None], jnp.float32)


def init_params(key, cfg: SDFModelConfig) -> Dict[str, Any]:
    k_ref, k_rgb, k_k0 = jax.random.split(key, 3)
    if cfg.grid_type == "tensorf":
        from fgs_nerf_tpu.core.grids import init_tensorf_params

        k0 = init_tensorf_params(
            k_k0, cfg.k0_dim, cfg.world_size, cfg.tensorf_n_comp
        )
    elif cfg.grid_type == "dense":
        k0 = jnp.zeros((*cfg.world_size, cfg.k0_dim), jnp.float32)
    else:
        raise ValueError(f"unknown grid_type {cfg.grid_type!r}")
    params: Dict[str, Any] = {
        "sdf": ball_init_sdf(cfg.world_size, cfg.stage),
        "k0": k0,
        "refnet": init_mlp(
            k_ref, refnet_dims(cfg.refnet_in_dim(), cfg.refnet_width, cfg.refnet_depth)
        ),
        "s_val": jnp.full((1,), cfg.s_start, jnp.float32),
    }
    if cfg.is_fine:
        params["rgbnet"] = init_mlp(
            k_rgb, rgbnet_dims(cfg.rgbnet_in_dim(), cfg.rgbnet_width, cfg.rgbnet_depth)
        )
    return params


def reset_refnet(params: Dict[str, Any], key, cfg: SDFModelConfig) -> Dict[str, Any]:
    """Re-init the shading head after progressive upscaling
    (`model/nerf.py:383-396`, driven by ``reset_iter``)."""
    new = dict(params)
    new["refnet"] = init_mlp(
        key, refnet_dims(cfg.refnet_in_dim(), cfg.refnet_width, cfg.refnet_depth)
    )
    return new


def k0_dense(params: Dict[str, Any], cfg: SDFModelConfig) -> jnp.ndarray:
    """The k0 feature grid as a dense [X, Y, Z, k0_dim] array —
    identity for 'dense', per-step densification for 'tensorf'
    (autodiff carries gradients back to the factors)."""
    if cfg.grid_type == "tensorf":
        from fgs_nerf_tpu.core.grids import tensorf_densify

        return tensorf_densify(params["k0"], cfg.k0_dim)
    return params["k0"]


def empty_buffers() -> Dict[str, Any]:
    return {}


# ---------------------------------------------------------------------------
# Mask machinery
# ---------------------------------------------------------------------------


def build_sdf_mask(params: Dict[str, Any], cfg: SDFModelConfig) -> jnp.ndarray:
    """The checkpoint-time occupancy summary handed to the next stage.

    Parity with ``set_sdf_mask`` (`model/nerf.py:181-186`) including its
    quirk: the expression is ``abs(sdf < 0.5) * 1e-3``, i.e. a *boolean*
    threshold ``sdf < 0.5`` scaled to 1e-3 — not ``|sdf| < 0.5``.
    Uses the smoothed SDF when smoothing is enabled.
    """
    sdf = params["sdf"]
    if cfg.smooth_sdf:
        sdf = smooth_grid(sdf, cfg.smooth_ksize, cfg.smooth_sigma)
    return jnp.where(sdf < 0.5, 1e-3, 0.0).astype(jnp.float32)


def compute_bbox_from_sdf_mask(
    sdf_mask: np.ndarray, xyz_min: np.ndarray, xyz_max: np.ndarray
):
    """Shrink the stage bbox to the active mask extent
    (`model/nerf_training.py:40-58`)."""
    m = np.asarray(sdf_mask)[..., 0] > 0
    axes = [np.linspace(0.0, 1.0, n) for n in m.shape]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    interp = np.stack([gx, gy, gz], -1)
    dense_xyz = xyz_min * (1 - interp) + xyz_max * interp
    active = dense_xyz[m]
    return active.min(0).astype(np.float32), active.max(0).astype(np.float32)


def build_mask_cache(
    sdf_mask: jnp.ndarray, prior_xyz_min, prior_xyz_max
) -> Dict[str, jnp.ndarray]:
    """MaskCache state: 3x3x3 max-pooled prior-stage sdf_mask
    (`model/nerf.py:1192-1200`)."""
    return {
        "grid": max_pool3d_same(sdf_mask, 3),
        "xyz_min": jnp.asarray(prior_xyz_min, jnp.float32),
        "xyz_max": jnp.asarray(prior_xyz_max, jnp.float32),
    }


def mask_cache_query(
    mc: Dict[str, jnp.ndarray], xyz: jnp.ndarray, thres: float
) -> jnp.ndarray:
    """Trilinear lookup >= thres (`model/nerf.py:1202-1209`).

    packed=True: ONE cell-pack row gather instead of 8 corner gathers —
    on TPU the row-gather floor is per-row, so this is ~8x cheaper for
    the in-render masked workloads (the ckpt-workload bench's dominant
    cost, PROFILE_r04.md §6).  ``pack_worthwhile`` falls back to the
    plain gather for small query sets automatically.

    On TPU the pack is bf16, and ``bf16(1e-3) = 0.0009994 < 1e-3``: an
    EXACT >= thres comparison then rejects every occupied voxel (round-5
    regression: the coarse stage's maskcache ray filter kept 0.000 of
    all pixels on hardware).  The bf16 path therefore compares with a
    half-ULP slack (2^-7 relative — bf16 rounding is <= 2^-8); the CPU
    f32 path keeps the reference's exact semantics
    (`model/nerf.py:1207`)."""
    from fgs_nerf_tpu.ops.interp import _use_pallas_pack

    box = SceneBox(mc["xyz_min"], mc["xyz_max"])
    val = trilinear_sample(
        mc["grid"], xyz, box, packed=True
    )[..., 0]
    if _use_pallas_pack():
        thres = thres * (1.0 - 2.0**-7)
    return val >= thres


def set_nonempty_mask(
    params: Dict[str, Any], buffers: Dict[str, Any], cfg: SDFModelConfig, box: SceneBox
):
    """Mark grid nodes inside known-occupied space; in the coarse stage
    also push free-space SDF to +1 (`model/nerf.py:338-353`)."""
    nodes = _grid_nodes(cfg.world_size, box)
    mask = mask_cache_query(buffers["mask_cache"], nodes, cfg.mask_cache_thres)
    buffers = dict(buffers)
    buffers["nonempty_mask"] = mask[..., None]
    params = dict(params)
    if cfg.stage == "coarse":
        params["sdf"] = jnp.where(mask[..., None], params["sdf"], 1.0)
    return params, buffers


def _grid_nodes(world_size, box: SceneBox) -> jnp.ndarray:
    axes = [jnp.linspace(box.xyz_min[i], box.xyz_max[i], world_size[i]) for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gx, gy, gz], -1)


def maskout_near_cam_vox(
    params: Dict[str, Any], cam_o: jnp.ndarray, near: float, cfg: SDFModelConfig,
    box: SceneBox,
) -> Dict[str, Any]:
    """SDF := 5 for voxels within ``near`` of any camera
    (`model/nerf.py:355-366`)."""
    nodes = _grid_nodes(cfg.world_size, box)  # [X,Y,Z,3]
    d2 = jnp.min(
        jnp.sum((nodes[..., None, :] - cam_o) ** 2, axis=-1), axis=-1
    )
    near_mask = jnp.sqrt(d2) <= near
    params = dict(params)
    params["sdf"] = jnp.where(near_mask[..., None], 5.0, params["sdf"])
    return params


def inc_mask_query(
    lower: jnp.ndarray, upper: jnp.ndarray, xyz: jnp.ndarray, box: SceneBox,
    world_size: Tuple[int, int, int],
) -> jnp.ndarray:
    """Incremental-voxel box test.

    The reference builds a boolean MaskGrid over unit-cube lattice nodes
    and queries it with nearest-voxel lookup (`model/nerf.py:1077-1088`,
    `model/grid.py:253-284`); that is equivalent to snapping the query
    to its nearest node and box-testing the node's unit coordinate.
    """
    sizes = jnp.asarray(world_size, jnp.float32)
    ijk = jnp.floor(box.normalize(xyz) * (sizes - 1.0) + 0.5)
    inb = jnp.all((ijk >= 0) & (ijk <= sizes - 1.0), axis=-1)
    u = ijk / (sizes - 1.0)
    inside = jnp.all((u >= lower) & (u <= upper), axis=-1)
    return inside & inb


def voxel_count_views(
    cfg: SDFModelConfig,
    box: SceneBox,
    rays_o_views: np.ndarray,  # [V, H, W, 3]
    rays_d_views: np.ndarray,
    near: float,
    far: float,
    stepsize: float,
    downrate: int = 1,
) -> jnp.ndarray:
    """Per-voxel count of views whose rays deposit >1 accumulated
    trilinear weight (`model/nerf.py:398-428`): drives the per-voxel
    learning rate and the low-visibility SDF clamp.

    The reference backprops a ones-grid through grid_sample; the
    gradient of ``sum(trilinear(ones, pts))`` w.r.t. the grid is
    exactly the accumulated interpolation weight, computed here with
    one jitted vjp per view.
    """
    n_samples = int(
        np.linalg.norm(np.asarray(cfg.world_size) + 1) / stepsize
    ) + 1

    @jax.jit
    def view_weight(rays_o, rays_d):
        vec = jnp.where(rays_d == 0, 1e-6, rays_d)
        rate_a = (box.xyz_max - rays_o) / vec
        rate_b = (box.xyz_min - rays_o) / vec
        t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), -1), near, far)
        rng_steps = jnp.arange(n_samples, dtype=jnp.float32)
        step = stepsize * cfg.voxel_size * rng_steps
        interpx = t_min[:, None] + step[None, :] / jnp.linalg.norm(
            rays_d, axis=-1, keepdims=True
        )
        pts = rays_o[:, None, :] + rays_d[:, None, :] * interpx[..., None]
        ones = jnp.ones((*cfg.world_size, 1), jnp.float32)
        _, vjp = jax.vjp(
            lambda g: jnp.sum(trilinear_sample(g, pts, box)), ones
        )
        return vjp(jnp.ones(()))[0]

    count = jnp.zeros((*cfg.world_size, 1), jnp.float32)
    for v in range(len(rays_o_views)):
        ro = jnp.asarray(rays_o_views[v][::downrate, ::downrate].reshape(-1, 3))
        rd = jnp.asarray(rays_d_views[v][::downrate, ::downrate].reshape(-1, 3))
        count = count + (view_weight(ro, rd) > 1.0).astype(jnp.float32)
    return count


# ---------------------------------------------------------------------------
# Progressive scaling / cross-stage init
# ---------------------------------------------------------------------------


def scale_volume_grid(
    params: Dict[str, Any], new_cfg: SDFModelConfig
) -> Dict[str, Any]:
    """Trilinear upsample of sdf + k0 to the new rung's resolution
    (`model/nerf.py:368-381`, `model/grid.py:101-106`)."""
    params = dict(params)
    params["sdf"] = resize_trilinear(params["sdf"], new_cfg.world_size)
    if new_cfg.grid_type == "tensorf":
        from fgs_nerf_tpu.core.grids import tensorf_scale

        params["k0"] = tensorf_scale(params["k0"], new_cfg.world_size)
    else:
        params["k0"] = resize_trilinear(params["k0"], new_cfg.world_size)
    return params


def init_sdf_from_sdf(
    params: Dict[str, Any],
    sdf0: jnp.ndarray,
    cfg: SDFModelConfig,
    reduce: float = 1.0,
) -> Dict[str, Any]:
    """Warm-start the SDF from the previous stage's grid
    (`model/nerf.py:280-296`, invoked with smooth=False by
    `model/nerf_training.py:122-129`): resize, divide by ``reduce``,
    then (``smooth_scale``) apply a 5^3 sigma-1 gaussian."""
    params = dict(params)
    if sdf0.shape[:3] != tuple(cfg.world_size):
        sdf0 = resize_trilinear(sdf0, cfg.world_size)
    sdf = sdf0 / reduce
    if cfg.smooth_scale:
        sdf = smooth_grid(sdf, 5, 1.0)
    params["sdf"] = sdf
    return params


# ---------------------------------------------------------------------------
# Rendering
# ---------------------------------------------------------------------------


def _safe_norm(x, axis=-1):
    """L2 norm with a NaN-free gradient at 0 (masked lattice slots can
    carry exactly-zero gradient vectors)."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x**2, axis=axis, keepdims=True), 1e-24))


def _compact_valid(valid, k):
    """Compact the sample axis to the first ``k`` valid slots per ray.

    Exact when no ray has more than ``k`` valid samples (dropped slots
    are only the masked-out ones): scoring by ``-step`` keeps surviving
    samples in ascending step order, so the transmittance scan over the
    compacted axis equals the scan over the full lattice.  Points are
    NOT gathered — the caller recomputes them from the returned step
    ids (bitwise-identical to the lattice points and cheaper than a
    [N*S, 3] row gather).  Returns (valid [N,k], steps [N,k] original
    step ids, overflow [N]).
    """
    s = valid.shape[-1]
    step_ids = jnp.arange(s, dtype=jnp.float32)
    score = jnp.where(valid, -step_ids, -jnp.inf)
    vals, idx = jax.lax.top_k(score, k)
    new_valid = vals > -jnp.inf
    steps = idx.astype(jnp.float32)
    overflow = jnp.sum(valid, axis=-1) > k
    return new_valid, steps, overflow


def _pts_at_steps(rays_o, rays_d, t_min, steps, step_dist):
    """World positions of lattice slots ``steps`` — the same expression
    tree as ``ops.ray_sample.sample_along_rays`` evaluates, so the
    result is bitwise-identical to the lattice points."""
    d_norm = jnp.linalg.norm(rays_d, axis=-1)
    start = rays_o + rays_d * t_min[..., None]
    dir_unit = rays_d / d_norm[..., None]
    dist = steps * step_dist
    return start[:, None, :] + dir_unit[:, None, :] * dist[..., None]


def _topk_select(weights, live, k):
    """Per-ray top-k sample selection by weight; returns (idx [N,k],
    sel_live [N,k]).  Order-free because compositing is a weighted sum."""
    score = jnp.where(live, weights, -1.0)
    vals, idx = jax.lax.top_k(score, k)
    return idx, vals > 0.0


def _gather_slots_3d(x, idx):
    """take_along_axis over the sample axis for [N, S, C], computed as
    a batched one-hot matmul ``onehot[N, K, S] @ x[N, S, C]``.

    On TPU a per-(ray, k) row gather prices 30-50 ns/row at this row
    width (measured, ``scripts/microbench_gather.py`` section A: flat
    take 108.8 ms vs one-hot matmul 1.9 ms for [8192, 288, 19] ->
    [8192, 256, 19]) while the MXU eats the equivalent matmul for free
    — the one-hot comparison fuses into the operand.  fp32 keeps the
    selection exact (0/1 weights).  Autodiff's transpose of the
    dot_general is ``onehot^T @ g`` — the identical MXU formulation —
    so no custom VJP is needed.
    """
    n, s, c = x.shape
    k = idx.shape[1]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, k, s), 2)
    onehot = jax.lax.stop_gradient(
        (idx[..., None] == iota_s).astype(x.dtype)
    )  # [N, K, S]
    return jax.lax.dot_general(
        onehot, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _gather_slots(x, idx):
    """take_along_axis over the sample axis for [N,S] or [N,S,C]."""
    if x.ndim == 2:
        return _gather_slots_3d(x[..., None], idx)[..., 0]
    return _gather_slots_3d(x, idx)


def forward(
    params: Dict[str, Any],
    buffers: Dict[str, Any],
    cfg: SDFModelConfig,
    box: SceneBox,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    s_val: jnp.ndarray,
    near: float,
    bg: float,
    gather_fn=None,
) -> Dict[str, jnp.ndarray]:
    if cfg.is_fine:
        if (
            cfg.engine == "sorted" and gather_fn is None
            and cfg.all_displace and 1.0 in cfg.all_displace
        ):
            return forward_fine_sorted(
                params, buffers, cfg, box, rays_o, rays_d, viewdirs, s_val,
                near, bg,
            )
        return forward_fine(params, buffers, cfg, box, rays_o, rays_d,
                            viewdirs, s_val, near, bg, gather_fn=gather_fn)
    if cfg.engine == "sorted" and gather_fn is None:
        # The sorted engine owns its gather path; under spatial grid
        # sharding (gather_fn set) the lattice pipeline below serves the
        # sp-sharded gathers instead — engine='sorted' is a single-chip /
        # dp-mesh fast path, documented in config/scenes.py.
        return forward_coarse_sorted(
            params, buffers, cfg, box, rays_o, rays_d, viewdirs, s_val, near, bg
        )
    return forward_coarse(params, buffers, cfg, box, rays_o, rays_d, viewdirs,
                          s_val, near, bg, gather_fn=gather_fn)


def forward_coarse(
    params, buffers, cfg: SDFModelConfig, box: SceneBox,
    rays_o, rays_d, viewdirs, s_val, near, bg, gather_fn=None,
) -> Dict[str, jnp.ndarray]:
    """Geometry-searching / coarse render (`model/nerf.py:943-1075`).

    ``gather_fn(grid, idx)`` overrides the trilinear field gather (the
    spatially sharded gather when the grid is sp-sharded)."""
    n = rays_o.shape[0]
    rs = sample_along_rays(rays_o, rays_d, box, near, cfg.step_dist, cfg.s_max)
    pts, valid = rs.pts, rs.valid

    if cfg.stage == "coarse" and "mask_cache" in buffers:
        valid = valid & mask_cache_query(buffers["mask_cache"], pts, cfg.mask_cache_thres)
    if "inc_lower" in buffers:
        valid = valid & inc_mask_query(
            buffers["inc_lower"], buffers["inc_upper"], pts, box, cfg.world_size
        )

    if 0 < cfg.sample_k < cfg.s_max:
        valid, steps, sample_overflow = _compact_valid(valid, cfg.sample_k)
        pts = _pts_at_steps(rays_o, rays_d, rs.t_min, steps, cfg.step_dist)
    else:
        steps = jnp.broadcast_to(
            jnp.arange(cfg.s_max, dtype=jnp.float32), valid.shape
        )
        sample_overflow = jnp.zeros((n,), bool)

    sdf_grid = params["sdf"]
    if cfg.smooth_sdf:
        sdf_grid = smooth_grid(sdf_grid, cfg.smooth_ksize, cfg.smooth_sigma)
    # Gradient field is built from the RAW sdf grid (`model/nerf.py:972`).
    # [sdf | grad | k0] are fused into ONE gather: TPU gather/scatter
    # cost is per-row, not per-byte, so widening the row is free while
    # a separate k0 gather (and its backward scatter) would cost the
    # full row count again.  k0 values at unshaded slots carry no
    # cotangent, so gradients are unchanged.  The cell-packed variant
    # turns the 8 corner gathers into one 512-byte-row gather.
    grad_field = sdf_gradient(params["sdf"], cfg.voxel_size, cfg.grad_mode)
    field = jnp.concatenate([sdf_grid, grad_field, k0_dense(params, cfg)], axis=-1)
    if gather_fn is not None:
        sizes_f = jnp.asarray(field.shape[:3], jnp.float32)
        samp = gather_fn(field, box.normalize(pts) * (sizes_f - 1.0))
    else:
        samp = trilinear_sample(field, pts, box, packed=True)  # [N, S, 4 + k0_dim]
    sdf = samp[..., 0]
    gradient = samp[..., 1:4]
    k0_all = samp[..., 4:]

    dist = jnp.asarray(cfg.step_dist, jnp.float32)
    alpha = neus_alpha(viewdirs, sdf, gradient, dist, s_val)

    # First scan -> weight threshold -> second scan on the survivors
    # (`model/nerf.py:978-990`).
    w1, _ = alpha_to_weights(alpha, valid)
    if cfg.fast_color_thres > 0:
        live = valid & (w1 > cfg.fast_color_thres)
    else:
        live = valid
    weights, alphainv_last = alpha_to_weights(alpha, live)

    normal = l2_normalize(gradient / (_safe_norm(gradient) + 1e-7))

    # ---- pass 2: shading -------------------------------------------------
    if cfg.shade_k > 0:
        idx, sel_live = _topk_select(weights, live, cfg.shade_k)
        # one packed top-K gather (random rows are HBM-line bound)
        pack = jnp.concatenate(
            [pts, normal, k0_all, weights[..., None]], axis=-1
        )
        s_pack = _gather_slots(pack, idx)
        s_pts = s_pack[..., 0:3]
        s_normal = s_pack[..., 3:6]
        s_k0 = s_pack[..., 6:6 + cfg.k0_dim]
        s_weights = s_pack[..., 6 + cfg.k0_dim] * sel_live
        overflow = jnp.sum(live, axis=-1) > cfg.shade_k
    else:
        s_pts, s_normal, s_k0 = pts, normal, k0_all
        s_weights = weights * live
        sel_live = live
        overflow = jnp.zeros((n,), bool)

    viewdirs_pts = jnp.broadcast_to(viewdirs[:, None, :], s_pts.shape)
    # remat: recomputing the encodings + MLP in the backward (~1 ms of
    # MXU) beats storing ~2 GB of [N, K, ~100ch] features/activations
    shade = lambda p, a, b_, c_, d_, e_: _shade_coarse(p, cfg, box, a, b_, c_, d_, e_)  # noqa: E731
    if cfg.shade_remat:
        shade = jax.checkpoint(shade)
    rgb = shade(params, s_pts, viewdirs_pts, s_normal, viewdirs, s_k0)
    sigmoid_rgb_pt = jax.nn.sigmoid(rgb)  # the double sigmoid (`model/nerf.py:1009-1010`)

    w_full = weights * live
    cum_weights = jnp.sum(w_full, axis=-1, keepdims=True)
    rgb_marched = jnp.clip(
        jnp.sum(s_weights[..., None] * rgb, axis=1) + (1.0 - cum_weights) * bg, 0.0, 1.0
    )
    sigmoid_rgb = jnp.clip(
        jnp.sum(s_weights[..., None] * sigmoid_rgb_pt, axis=1)
        + (1.0 - cum_weights) * bg,
        0.0,
        1.0,
    )
    normal_marched = jnp.sum(w_full[..., None] * normal, axis=1)
    depth = jax.lax.stop_gradient(jnp.sum(w_full * steps * dist, axis=-1))

    return {
        "rgb_marched": rgb_marched,
        "sigmoid_rgb": sigmoid_rgb,
        "alphainv_cum": alphainv_last,
        "cum_weights": cum_weights,
        "normal_marched": normal_marched,
        "depth": depth,
        "disp": 1.0 / jnp.maximum(depth, 1e-10),
        "weights": w_full,
        "normal": normal,
        "live": live,
        "valid": valid,
        "sel_weights": s_weights,
        "sel_rgb": rgb,
        "sel_live": sel_live,
        "overflow": overflow | sample_overflow,
        "overflow_sample": sample_overflow,
        "overflow_shade": overflow,
        "s_val": s_val,
    }


def _shade_coarse(params, cfg: SDFModelConfig, box, pts, viewdirs_pts, normal,
                  viewdirs, k0):
    """Coarse shading head (`model/nerf.py:993-1009`): refnet on
    [k0, xyz_emb, reflect_emb, normal(, viewdirs_emb)] -> sigmoid.
    k0 arrives pre-sampled from the fused field gather."""
    rays_xyz = box.normalize(pts)
    xyz_emb = sincos_encode(rays_xyz, freq_bank(cfg.posbase_pe))
    refl = reflect(viewdirs_pts, normal)
    reflect_emb = sincos_encode(refl, freq_bank(cfg.refbase_pe))
    feats = [k0, xyz_emb, reflect_emb, normal]
    if cfg.use_viewdir:
        vd_emb = sincos_encode(viewdirs, freq_bank(cfg.viewbase_pe))  # [N, E]
        feats.append(jnp.broadcast_to(vd_emb[:, None, :], (*pts.shape[:2], vd_emb.shape[-1])))
    if cfg.mlp_bf16:
        # mlp_apply casts the concat to bf16 anyway; casting each
        # feature first halves the materialized [N, K, ~100ch] concat
        # (and its backward) without changing a single MXU input bit.
        feats = [f.astype(jnp.bfloat16) for f in feats]
    ref_feat = jnp.concatenate(feats, axis=-1)
    return jax.nn.sigmoid(
        mlp_apply(params["refnet"], ref_feat, bf16=cfg.mlp_bf16).astype(jnp.float32)
    )


def forward_fine(
    params, buffers, cfg: SDFModelConfig, box: SceneBox,
    rays_o, rays_d, viewdirs, s_val, near, bg, gather_fn=None,
) -> Dict[str, jnp.ndarray]:
    """Fine render (`model/nerf.py:776-941`).

    ``gather_fn(grid, idx)`` overrides every trilinear field gather
    (fused [sdf|k0] pass, alpha-gradient taps, hierarchical taps) —
    the spatially sharded gather when the grid is sp-sharded."""
    n = rays_o.shape[0]
    rs = sample_along_rays(rays_o, rays_d, box, near, cfg.step_dist, cfg.s_max)
    pts, valid = rs.pts, rs.valid

    if "mask_cache" in buffers:
        valid = valid & mask_cache_query(buffers["mask_cache"], pts, cfg.mask_cache_thres)

    if 0 < cfg.sample_k < cfg.s_max:
        valid, steps, sample_overflow = _compact_valid(valid, cfg.sample_k)
        pts = _pts_at_steps(rays_o, rays_d, rs.t_min, steps, cfg.step_dist)
    else:
        steps = jnp.broadcast_to(
            jnp.arange(cfg.s_max, dtype=jnp.float32), valid.shape
        )
        sample_overflow = jnp.zeros((n,), bool)

    sdf_grid = params["sdf"]
    if cfg.smooth_sdf:
        sdf_grid = smooth_grid(sdf_grid, cfg.smooth_ksize, cfg.smooth_sigma)
    # fused [sdf | k0] gather — see the coarse forward's rationale
    field = jnp.concatenate([sdf_grid, k0_dense(params, cfg)], axis=-1)
    if gather_fn is not None:
        sizes_f = jnp.asarray(field.shape[:3], jnp.float32)
        samp = gather_fn(field, box.normalize(pts) * (sizes_f - 1.0))
    else:
        samp = trilinear_sample(field, pts, box, packed=True)
    sdf = samp[..., 0]
    k0_all = samp[..., 1:]
    gradient, _ = center_gradient_taps(sdf_grid, pts, box, cfg.voxel_size,
                                       sample_fn=gather_fn)

    dist = jnp.asarray(cfg.step_dist, jnp.float32)
    alpha = neus_alpha(viewdirs, sdf, gradient, dist, s_val)

    # alpha threshold -> single scan -> weight threshold
    # (`model/nerf.py:802-833`), no rescan after the weight cut.
    if cfg.fast_color_thres > 0:
        m1 = valid & (alpha > cfg.fast_color_thres)
    else:
        m1 = valid
    weights, alphainv_last = alpha_to_weights(alpha, m1)
    if cfg.fast_color_thres > 0:
        live = m1 & (weights > cfg.fast_color_thres)
    else:
        live = m1

    normal = l2_normalize(gradient / (_safe_norm(gradient) + 1e-7))
    w_eff = weights * live

    if cfg.shade_k > 0:
        idx, sel_live = _topk_select(weights, live, cfg.shade_k)
        pack = jnp.concatenate(
            [pts, sdf[..., None], normal, gradient, k0_all, weights[..., None]],
            axis=-1,
        )
        s_pack = _gather_slots(pack, idx)
        s_pts = s_pack[..., 0:3]
        s_sdf = s_pack[..., 3]
        s_normal = s_pack[..., 4:7]
        s_gradient = s_pack[..., 7:10]
        s_k0 = s_pack[..., 10:10 + cfg.k0_dim]
        s_weights = s_pack[..., 10 + cfg.k0_dim] * sel_live
        overflow = jnp.sum(live, axis=-1) > cfg.shade_k
    else:
        s_pts, s_sdf, s_normal, s_gradient = pts, sdf, normal, gradient
        s_k0 = k0_all
        s_weights = w_eff
        sel_live = live
        overflow = jnp.zeros((n,), bool)

    # hierarchical taps sampled OUTSIDE the remat boundary (a re-gather
    # in the backward would double the dominant row cost)
    tap_feats = []
    if cfg.all_displace:
        all_feat, all_grad = sample_sdf_taps(
            sdf_grid, s_pts, box, cfg.all_displace, cfg.voxel_size,
            cfg.use_grad_norm, sample_fn=gather_fn,
        )
        d = len(cfg.all_displace)
        tap_feats = [
            all_feat.reshape(*s_pts.shape[:2], 6 * d),
            all_grad.reshape(*s_pts.shape[:2], 3 * d),
        ]
    # remat: see the coarse forward's rationale
    shade = lambda p, tf, *a: _shade_fine(p, cfg, box, tf, *a)  # noqa: E731
    if cfg.shade_remat:
        shade = jax.checkpoint(shade)
    rgb = shade(
        params, tap_feats, s_pts, s_sdf, s_gradient, s_normal, viewdirs, s_k0
    )
    sigmoid_rgb_pt = jax.nn.sigmoid(rgb)

    cum_weights = jnp.sum(w_eff, axis=-1, keepdims=True)
    rgb_marched = jnp.clip(
        jnp.sum(s_weights[..., None] * rgb, axis=1) + (1.0 - cum_weights) * bg, 0.0, 1.0
    )
    sigmoid_rgb = jnp.clip(
        jnp.sum(s_weights[..., None] * sigmoid_rgb_pt, axis=1)
        + (1.0 - cum_weights) * bg,
        0.0,
        1.0,
    )
    normal_marched = jnp.sum(w_eff[..., None] * normal, axis=1)
    depth = jax.lax.stop_gradient(jnp.sum(w_eff * steps * dist, axis=-1))

    return {
        "rgb_marched": rgb_marched,
        "sigmoid_rgb": sigmoid_rgb,
        "alphainv_cum": alphainv_last,
        "cum_weights": cum_weights,
        "normal_marched": normal_marched,
        "depth": depth,
        "disp": 1.0 / jnp.maximum(depth, 1e-10),
        "weights": w_eff,
        "normal": normal,
        "live": live,
        "valid": valid,
        "sel_weights": s_weights,
        "sel_rgb": rgb,
        "sel_live": sel_live,
        "overflow": overflow | sample_overflow,
        "overflow_sample": sample_overflow,
        "overflow_shade": overflow,
        "s_val": s_val,
    }


def _shade_fine(params, cfg: SDFModelConfig, box, tap_feats, pts, sdf, gradient,
                normal, viewdirs, k0):
    """Fine shading (`model/nerf.py:835-884`): rgbnet on hierarchical
    SDF features, then refnet on [rgb_feat, reflect_emb].  k0 and the
    hierarchical tap features arrive pre-sampled (the tap GATHER stays
    outside the remat boundary — only encodings/MLPs recompute)."""
    rays_xyz = box.normalize(pts)
    xyz_emb = sincos_encode(rays_xyz, freq_bank(cfg.posbase_pe))

    feats = [k0, xyz_emb]
    if cfg.use_viewdir:
        vd_emb = sincos_encode(viewdirs, freq_bank(cfg.viewbase_pe))
        feats.append(jnp.broadcast_to(vd_emb[:, None, :], (*pts.shape[:2], vd_emb.shape[-1])))
    if cfg.center_sdf:
        feats.append(sdf[..., None])
    feats.extend(tap_feats)
    # The reference appends the xyz-order center gradient last
    # (`model/nerf.py:865-876`, asserts k_grad_feat == (1.0,)).
    feats.append(gradient)
    if cfg.mlp_bf16:
        # pre-cast: identical MXU inputs, half the concat traffic
        # (see _shade_coarse)
        feats = [f.astype(jnp.bfloat16) for f in feats]
    rgb_feat = mlp_apply(
        params["rgbnet"], jnp.concatenate(feats, axis=-1), bf16=cfg.mlp_bf16
    )

    viewdirs_pts = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
    refl = reflect(viewdirs_pts, normal)
    reflect_emb = sincos_encode(refl, freq_bank(cfg.refbase_pe))
    if cfg.mlp_bf16:
        ref_feat = jnp.concatenate(
            [rgb_feat.astype(jnp.bfloat16), reflect_emb.astype(jnp.bfloat16)],
            axis=-1,
        )
    else:
        ref_feat = jnp.concatenate(
            [rgb_feat.astype(jnp.float32), reflect_emb], axis=-1
        )
    return jax.nn.sigmoid(
        mlp_apply(params["refnet"], ref_feat, bf16=cfg.mlp_bf16).astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# Sorted-stream coarse engine, channel-major (ops/sorted_cm.py)
# ---------------------------------------------------------------------------


def _shade_coarse_cm(params, cfg: SDFModelConfig, rays_xyz, vd, normal, k0):
    """``_shade_coarse`` over a channel-major sample stream: every input
    is a tuple of [M] arrays (rays_xyz, vd, normal) or a [C, M] matrix
    (k0); features are built as row blocks and concatenated on the
    sublane axis, so elementwise work runs at full lane width.

    Identical values to the lattice head: the per-sample encoding of the
    broadcast view directions equals the broadcast of the per-ray
    encoding, and the row order below matches the channel-last concat
    order (so the SAME refnet weights apply).
    """
    nx, ny, nz = normal
    vx, vy, vz = vd
    dot2 = 2.0 * (vx * nx + vy * ny + vz * nz)
    refl = (vx - dot2 * nx, vy - dot2 * ny, vz - dot2 * nz)
    m = k0.shape[-1]
    n_w = len(params["refnet"]) // 2
    widths_ok = all(
        params["refnet"][f"w{i}"].shape[1] % 8 == 0 for i in range(n_w - 1)
    )
    shade_bs = 2048 if m % 2048 == 0 else 1024
    if cfg.mlp_bf16 and widths_ok and m % 1024 == 0:
        # fully fused shading head (ops/pallas/fused_mlp_cm.py): sincos
        # encodings computed IN KERNEL from the raw 24-row inputs, all
        # hidden activations in VMEM — the XLA layer-by-layer form was
        # HBM-bound (~20 ms/step at the bench; encoded-feature streams
        # and the input concat another ~12)
        from fgs_nerf_tpu.ops.pallas.fused_mlp_cm import fused_shade_cm

        weights = [params["refnet"][f"w{i}"] for i in range(n_w)]
        biases = [params["refnet"][f"b{i}"] for i in range(n_w)]
        out = fused_shade_cm(
            k0, jnp.stack(rays_xyz, axis=0), jnp.stack(refl, axis=0),
            jnp.stack(normal, axis=0),
            jnp.stack(vd, axis=0) if cfg.use_viewdir else None,
            weights, biases,
            cfg.posbase_pe, cfg.refbase_pe, cfg.viewbase_pe, shade_bs,
        )
    else:
        pos_f = freq_bank(cfg.posbase_pe)
        ref_f = freq_bank(cfg.refbase_pe)

        def enc(parts, freqs):
            x3 = jnp.stack(parts, axis=0)  # [3, M]
            xf = (
                x3[:, None, :] * freqs[None, :, None]
            ).reshape(-1, x3.shape[-1])
            return jnp.concatenate([x3, jnp.sin(xf), jnp.cos(xf)], axis=0)

        feats = [k0, enc(rays_xyz, pos_f), enc(refl, ref_f),
                 jnp.stack(normal, axis=0)]
        if cfg.use_viewdir:
            feats.append(enc(vd, freq_bank(cfg.viewbase_pe)))
        out = _mlp_apply_cm(params["refnet"], feats, bf16=cfg.mlp_bf16)
    return jax.nn.sigmoid(out)  # [3, M] f32


def _mlp_apply_cm(mlp_params, blocks, bf16: bool):
    """``models.mlp.mlp_apply`` for channel-major activations: feature
    row blocks are concatenated on the sublane axis and each layer runs
    ``w.T @ x + b[:, None]`` (same weights, transposed application —
    bitwise-equal matmuls up to dot-order).

    Round-4 measurement: splitting the first layer into per-block dots
    (sum of W_i^T @ x_i, no concat) was 7k rays/s SLOWER at the bench —
    the tiny contraction dims (12/33/3/9) waste the MXU more than the
    concat costs.
    """
    n = len(mlp_params) // 2
    if bf16:
        blocks = [blk.astype(jnp.bfloat16) for blk in blocks]
    x = jnp.concatenate(blocks, axis=0)
    for i in range(n):
        w, b = mlp_params[f"w{i}"], mlp_params[f"b{i}"]
        last = i == n - 1
        if bf16:
            out_t = jnp.float32 if last else jnp.bfloat16
            x = jax.lax.dot_general(
                w.astype(jnp.bfloat16), x, (((0,), (0,)), ((), ())),
                preferred_element_type=out_t,
            ) + b.astype(out_t)[:, None]
        else:
            x = jax.lax.dot_general(
                w, x, (((0,), (0,)), ((), ())),
            ) + b[:, None]
        if not last:
            x = jax.nn.relu(x)
    return x.astype(jnp.float32)


def forward_fine_sorted(
    params, buffers, cfg: SDFModelConfig, box: SceneBox,
    rays_o, rays_d, viewdirs, s_val, near, bg,
) -> Dict[str, jnp.ndarray]:
    """Fine render on the row-sorted channel-major stream — the
    TPU answer to `model/nerf.py:776-941`, built in two sorted passes:

    * **Pass 1** (full sample lattice): identical machinery to
      ``forward_coarse_sorted`` — ONE stable sort by grid row, fused
      ``[sdf | grad | k0]`` half-pack serve, alpha in sorted domain;
      only (alpha, ndv) cross back for the single transmittance scan.
      The alpha gradient samples the interpolated central-difference
      grid, which EQUALS the reference's displace-1.0 tap gradient at
      every interior point (difference-of-interpolations ==
      interpolation-of-node-differences for +-1 taps); within one voxel
      of the bbox edge the tap clamp makes the reference one-sided
      while the grid field is zero — a documented boundary-band
      approximation (``fine_grad_taps`` in tests pins the exact-tap
      lattice path).
    * **Pass 2** (top-``shade_k`` shaded selection): the EXACT
      hierarchical taps.  Every tap is a standard half-pack serve at
      ``row + delta`` with per-tap corner weights
      (`ops/sorted_cm.py:tap_deltas_weights`): z/y taps ride the base
      z-minor sort through the multi-tap window kernel; x taps ride a
      second, x-minor linearization of the SAME machinery on the
      transposed grid.  rgbnet -> refnet shading runs channel-major in
      sorted order; three rgb channels cross back for compositing.

    ``normal_marched`` is not produced (training losses consume the
    per-sample ``ndv``); use the lattice engine for eval artifacts.
    """
    from fgs_nerf_tpu.ops.ray_sample import ray_box_intersect
    from fgs_nerf_tpu.ops.sdf2alpha import neus_alpha_from_cos
    from fgs_nerf_tpu.ops.sorted_cm import (
        corner_weights_cm, pack_gather_sorted_cm, padded_rows_cm,
        rows_fracs_cm, rows_to_coords_cm, sort_stream, tap_bounds,
        tap_deltas_weights, tap_gather_sorted_cm, unsort_channels,
    )
    from fgs_nerf_tpu.ops.stencils import sdf_gradient_cm

    n = rays_o.shape[0]
    dist = jnp.asarray(cfg.step_dist, jnp.float32)
    sizes = cfg.world_size
    ext = box.extent

    # ---- pass 1: lattice sampling (same expressions as the coarse
    # sorted engine) ---------------------------------------------------
    t_min, t_max = ray_box_intersect(rays_o, rays_d, box, near, 1e9)
    d_norm = jnp.linalg.norm(rays_d, axis=-1)
    n_steps = jnp.maximum(
        jnp.ceil((t_max - t_min) * d_norm / cfg.step_dist), 1.0
    ).astype(jnp.int32)
    start = rays_o + rays_d * t_min[..., None]
    dir_unit = rays_d / d_norm[..., None]
    step_ids = jnp.arange(cfg.s_max, dtype=jnp.float32)

    def axes_at(steps):
        d_ = steps * cfg.step_dist
        return tuple(
            start[:, a:a + 1] + dir_unit[:, a:a + 1] * d_ for a in range(3)
        )

    steps0 = jnp.broadcast_to(step_ids[None, :], (n, cfg.s_max))
    px, py, pz = axes_at(steps0)
    in_range = step_ids[None, :] < n_steps[:, None].astype(jnp.float32)
    valid = in_range
    for a, p in enumerate((px, py, pz)):
        valid = valid & (p >= box.xyz_min[a]) & (p <= box.xyz_max[a])

    if "mask_cache" in buffers:
        pts = jnp.stack([px, py, pz], axis=-1)
        valid = valid & mask_cache_query(
            buffers["mask_cache"], pts, cfg.mask_cache_thres
        )

    if 0 < cfg.sample_k < cfg.s_max:
        valid, steps, sample_overflow = _compact_valid(valid, cfg.sample_k)
        px, py, pz = axes_at(steps)
    else:
        steps = steps0
        sample_overflow = jnp.zeros((n,), bool)
    s = valid.shape[-1]
    m = n * s

    # ---- field, channel-major: [sdf | grad | k0], gradient from the
    # (possibly smoothed) sdf grid — the grid the fine taps sample ----
    sdf_grid = params["sdf"]
    if cfg.smooth_sdf:
        sdf_grid = smooth_grid(sdf_grid, cfg.smooth_ksize, cfg.smooth_sigma)
    sdf3 = sdf_grid[..., 0]
    grad_cm = sdf_gradient_cm(sdf3, cfg.voxel_size, cfg.grad_mode)
    k0_cm = jnp.transpose(k0_dense(params, cfg), (3, 0, 1, 2))
    field_cm = jnp.concatenate([sdf3[None], grad_cm, k0_cm], axis=0)

    def rows_of(pxa, pya, pza):
        ix = (pxa - box.xyz_min[0]) / ext[0] * (sizes[0] - 1.0)
        iy = (pya - box.xyz_min[1]) / ext[1] * (sizes[1] - 1.0)
        iz = (pza - box.xyz_min[2]) / ext[2] * (sizes[2] - 1.0)
        return rows_fracs_cm(ix, iy, iz, sizes)

    rows, (fx, fy, fz), ok = rows_of(px, py, pz)
    r_sent = padded_rows_cm(sizes)
    keys = jnp.where(valid & ok, rows, r_sent).reshape(m)

    iota = jnp.arange(m, dtype=jnp.int32)
    vshape = (n, s)
    vdx = jnp.broadcast_to(viewdirs[:, 0:1], vshape).reshape(m)
    vdy = jnp.broadcast_to(viewdirs[:, 1:2], vshape).reshape(m)
    vdz = jnp.broadcast_to(viewdirs[:, 2:3], vshape).reshape(m)
    keys_s, iota_s, fx_s, fy_s, fz_s, vx_s, vy_s, vz_s = sort_stream(
        keys, iota, fx.reshape(m), fy.reshape(m), fz.reshape(m),
        vdx, vdy, vdz, pack16=cfg.sort_pack16,
    )
    # sparse-stream block size: the serve's one-hot volume is
    # row-span x bs x one-hots, and the fine lattice at >=128^3 is a
    # SPARSE stream (row space >> samples) — smaller blocks cut the
    # compare volume linearly (the coarse bench stream is dense and
    # keeps the 1024 default)
    bs1 = 512 if np.prod(sizes) > m else 1024
    w8_s = corner_weights_cm(fx_s, fy_s, fz_s)
    samp = pack_gather_sorted_cm(field_cm, keys_s, w8_s, bs1)
    sdf_s = samp[0]
    gx, gy, gz = samp[1], samp[2], samp[3]

    true_cos = vx_s * gx + vy_s * gy + vz_s * gz
    alpha_s = neus_alpha_from_cos(true_cos, sdf_s, dist, s_val)
    gn = jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-24)) + 1e-7
    hx, hy, hz = gx / gn, gy / gn, gz / gn
    hn = jnp.sqrt(
        jnp.maximum(hx * hx + hy * hy + hz * hz,
                    float(np.finfo(np.float32).eps))
    )
    ndv_s = -(hx / hn * vx_s + hy / hn * vy_s + hz / hn * vz_s)

    alpha_u, ndv_u = unsort_channels(iota_s, keys, (alpha_s, ndv_s))
    alpha = alpha_u.reshape(n, s)
    ndv = ndv_u.reshape(n, s)

    # fine tail: alpha threshold -> ONE scan -> weight threshold
    # (`model/nerf.py:802-833`)
    if cfg.fast_color_thres > 0:
        m1 = valid & (alpha > cfg.fast_color_thres)
    else:
        m1 = valid
    weights, alphainv_last = alpha_to_weights(alpha, m1)
    if cfg.fast_color_thres > 0:
        live = m1 & (weights > cfg.fast_color_thres)
    else:
        live = m1
    w_eff = weights * live

    # ---- shade selection (ray-major) ---------------------------------
    if cfg.shade_k > 0:
        idx, sel_live = _topk_select(weights, live, cfg.shade_k)
        steps_sel = _gather_slots(steps, idx)
        s_weights = _gather_slots(weights, idx) * sel_live
        overflow = jnp.sum(live, axis=-1) > cfg.shade_k
        k = cfg.shade_k
    else:
        steps_sel, sel_live, s_weights = steps, live, w_eff
        overflow = jnp.zeros((n,), bool)
        k = s

    # ---- pass 2: exact taps + shading on the selection ---------------
    qx, qy, qz = axes_at(steps_sel)
    rows2, (fx2, fy2, fz2), ok2 = rows_of(qx, qy, qz)
    m2 = n * k
    keys2 = jnp.where(sel_live & ok2, rows2, r_sent).reshape(m2)
    iota2 = jnp.arange(m2, dtype=jnp.int32)
    vdx2 = jnp.broadcast_to(viewdirs[:, 0:1], (n, k)).reshape(m2)
    vdy2 = jnp.broadcast_to(viewdirs[:, 1:2], (n, k)).reshape(m2)
    vdz2 = jnp.broadcast_to(viewdirs[:, 2:3], (n, k)).reshape(m2)
    (keys2_s, iota2_s, fx2_s, fy2_s, fz2_s, vx2_s, vy2_s, vz2_s) = (
        jax.lax.stop_gradient(
            jax.lax.sort(
                (keys2, iota2, fx2.reshape(m2), fy2.reshape(m2),
                 fz2.reshape(m2), vdx2, vdy2, vdz2),
                dimension=0, num_keys=1,
            )
        )
    )
    bs2 = 256 if np.prod(sizes) > m2 else 1024
    w82_s = corner_weights_cm(fx2_s, fy2_s, fz2_s)
    samp2 = pack_gather_sorted_cm(field_cm, keys2_s, w82_s, bs2)
    sdf2_s = samp2[0]
    k02_s = samp2[4:]

    b0, b1, b2 = rows_to_coords_cm(jnp.minimum(keys2_s, r_sent - 1), sizes)
    displace = cfg.all_displace
    nd = len(displace)

    # z/y taps on the base sort
    mn_zy, mp_zy = tap_bounds(sizes)
    delta_zy, w8t_zy, _ = tap_deltas_weights(
        b0, b1, b2, fx2_s, fy2_s, fz2_s, displace, sizes, axes=("z", "y")
    )
    taps_zy = tap_gather_sorted_cm(
        sdf3, keys2_s, delta_zy, jax.lax.stop_gradient(w8t_zy), mn_zy, mp_zy,
        bs2,
    )  # [4*nd, M2]: (z-, z+, y-, y+) x D

    # x taps: x-minor linearization of the transposed grid
    sizes_t = (sizes[2], sizes[1], sizes[0])
    r_sent_x = padded_rows_cm(sizes_t)
    ix2 = (qx - box.xyz_min[0]) / ext[0] * (sizes[0] - 1.0)
    iy2 = (qy - box.xyz_min[1]) / ext[1] * (sizes[1] - 1.0)
    iz2 = (qz - box.xyz_min[2]) / ext[2] * (sizes[2] - 1.0)
    rows2x, (fz2x, fy2x, fx2x), okx = rows_fracs_cm(iz2, iy2, ix2, sizes_t)
    keys2x = jnp.where(sel_live & okx, rows2x, r_sent_x).reshape(m2)
    keys2x_s, iota2x_s, fxx_s, fyx_s, fzx_s = jax.lax.stop_gradient(
        jax.lax.sort(
            (keys2x, iota2, fx2x.reshape(m2), fy2x.reshape(m2),
             fz2x.reshape(m2)),
            dimension=0, num_keys=1,
        )
    )
    bx0, bx1, bx2 = rows_to_coords_cm(
        jnp.minimum(keys2x_s, r_sent_x - 1), sizes_t
    )
    delta_x, w8t_x, _ = tap_deltas_weights(
        bx0, bx1, bx2, fzx_s, fyx_s, fxx_s, displace, sizes_t, axes=("z",)
    )
    taps_x_xs = tap_gather_sorted_cm(
        jnp.transpose(sdf3, (2, 1, 0)), keys2x_s, delta_x,
        jax.lax.stop_gradient(w8t_x), 4, 5, bs2,
    )  # [2*nd, M2] in x-sorted order: (x-, x+) x D
    from fgs_nerf_tpu.ops.sorted_cm import resort_channels

    taps_x_rm = unsort_channels(
        iota2x_s, keys2x, tuple(taps_x_xs[t] for t in range(2 * nd))
    )
    # ray-major -> base (z-minor) sorted order: the stable re-sort by
    # keys2 rebuilds the exact pass-2 permutation (custom VJP routes
    # cotangents back through iota2_s instead of an XLA scatter)
    taps_x = resort_channels(keys2, iota2_s, taps_x_rm)

    # hierarchical features (`model/nerf.py:597-637` semantics):
    # post-clamp tap distances per axis/displacement, then finite
    # differences; grad order (z, y, x), tap order (z-,z+,y-,y+,x-,x+)
    iz_c = b2 - 1.0 + fz2_s
    iy_c = b1 - 1.0 + fy2_s
    ix_c = b0 - 1.0 + fx2_s
    all_feat_rows = [taps_zy[t] for t in range(4 * nd)] + list(taps_x)

    def tap_dist(ic, size, d):
        hi = jnp.clip(ic + d, 0.0, size - 1.0)
        lo = jnp.clip(ic - d, 0.0, size - 1.0)
        dd = hi - lo
        return jnp.where(dd > 0, dd, 1.0)

    grad_rows = []  # (z, y, x) x D
    for a, (ic, size) in enumerate(
        ((iz_c, sizes[2]), (iy_c, sizes[1]), (ix_c, sizes[0]))
    ):
        for di, d in enumerate(displace):
            neg = all_feat_rows[(2 * a) * nd + di]
            pos = all_feat_rows[(2 * a + 1) * nd + di]
            grad_rows.append(
                (pos - neg) / tap_dist(ic, size, d) / cfg.voxel_size
            )
    if cfg.use_grad_norm:
        normed = []
        for di in range(nd):
            g3 = [grad_rows[a * nd + di] for a in range(3)]
            norm = jnp.sqrt(jnp.maximum(
                g3[0] ** 2 + g3[1] ** 2 + g3[2] ** 2, 1e-24
            ))
            normed.extend([g / (norm + 1e-5) for g in g3])
        # re-interleave to (axis, d) order
        grad_rows = [
            normed[di * 3 + a] for a in range(3) for di in range(nd)
        ]

    # center gradient (displace == 1.0 taps, no grad norm), xyz order —
    # the `gradient` feature + the reflection normal
    d1 = displace.index(1.0)
    gc = {}
    for a, (ic, size) in enumerate(
        ((iz_c, sizes[2]), (iy_c, sizes[1]), (ix_c, sizes[0]))
    ):
        neg = all_feat_rows[(2 * a) * nd + d1]
        pos = all_feat_rows[(2 * a + 1) * nd + d1]
        gc[a] = (pos - neg) / tap_dist(ic, size, 1.0) / cfg.voxel_size
    gcx, gcy, gcz = gc[2], gc[1], gc[0]
    gn2 = jnp.sqrt(jnp.maximum(gcx**2 + gcy**2 + gcz**2, 1e-24)) + 1e-7
    nx2, ny2, nz2 = gcx / gn2, gcy / gn2, gcz / gn2
    nn2 = jnp.sqrt(jnp.maximum(
        nx2**2 + ny2**2 + nz2**2, float(np.finfo(np.float32).eps)
    ))
    nx2, ny2, nz2 = nx2 / nn2, ny2 / nn2, nz2 / nn2

    rays_xyz2 = (
        (b0 - 1.0 + fx2_s) / (sizes[0] - 1.0),
        (b1 - 1.0 + fy2_s) / (sizes[1] - 1.0),
        (b2 - 1.0 + fz2_s) / (sizes[2] - 1.0),
    )
    rgb_s3 = _shade_fine_cm(
        params, cfg, rays_xyz2, (vx2_s, vy2_s, vz2_s), (nx2, ny2, nz2),
        sdf2_s, k02_s, all_feat_rows, grad_rows, (gcx, gcy, gcz),
    )

    r_u, g_u, b_u = unsort_channels(
        iota2_s, keys2, (rgb_s3[0], rgb_s3[1], rgb_s3[2])
    )
    rgb_ch = (r_u.reshape(n, k), g_u.reshape(n, k), b_u.reshape(n, k))

    cum_w = jnp.sum(w_eff, axis=-1)
    comp, comp_sig = [], []
    for ch in rgb_ch:
        comp.append(jnp.clip(
            jnp.sum(s_weights * ch, axis=-1) + (1.0 - cum_w) * bg, 0.0, 1.0
        ))
        comp_sig.append(jnp.clip(
            jnp.sum(s_weights * jax.nn.sigmoid(ch), axis=-1)
            + (1.0 - cum_w) * bg,
            0.0, 1.0,
        ))
    rgb_marched = jnp.stack(comp, axis=-1)
    sigmoid_rgb = jnp.stack(comp_sig, axis=-1)
    depth = jax.lax.stop_gradient(jnp.sum(w_eff * steps * dist, axis=-1))

    return {
        "rgb_marched": rgb_marched,
        "sigmoid_rgb": sigmoid_rgb,
        "alphainv_cum": alphainv_last,
        "cum_weights": cum_w[..., None],
        "depth": depth,
        "disp": 1.0 / jnp.maximum(depth, 1e-10),
        "weights": w_eff,
        "ndv": ndv,
        "live": live,
        "valid": valid,
        "sel_weights": s_weights,
        "sel_rgb_ch": rgb_ch,
        "sel_live": sel_live,
        "overflow": overflow | sample_overflow,
        "overflow_sample": sample_overflow,
        "overflow_shade": overflow,
        "s_val": s_val,
    }


def _shade_fine_cm(params, cfg: SDFModelConfig, rays_xyz, vd, normal, sdf,
                   k0, all_feat_rows, grad_rows, grad_xyz):
    """``_shade_fine`` over a channel-major sample stream: feature row
    blocks in the EXACT channel-last concat order of the lattice head
    (same rgbnet/refnet weights apply)."""
    pos_f = freq_bank(cfg.posbase_pe)

    def enc(parts, freqs):
        x3 = jnp.stack(parts, axis=0)
        xf = (x3[:, None, :] * freqs[None, :, None]).reshape(-1, x3.shape[-1])
        return jnp.concatenate([x3, jnp.sin(xf), jnp.cos(xf)], axis=0)

    feats = [k0, enc(rays_xyz, pos_f)]
    if cfg.use_viewdir:
        feats.append(enc(vd, freq_bank(cfg.viewbase_pe)))
    if cfg.center_sdf:
        feats.append(sdf[None])
    feats.append(jnp.stack(all_feat_rows, axis=0))
    feats.append(jnp.stack(grad_rows, axis=0))
    feats.append(jnp.stack(grad_xyz, axis=0))
    rgb_feat = _mlp_apply_cm(params["rgbnet"], feats, bf16=cfg.mlp_bf16)

    nx, ny, nz = normal
    vx, vy, vz = vd
    dot2 = 2.0 * (vx * nx + vy * ny + vz * nz)
    refl = (vx - dot2 * nx, vy - dot2 * ny, vz - dot2 * nz)
    reflect_emb = enc(refl, freq_bank(cfg.refbase_pe))
    out = _mlp_apply_cm(
        params["refnet"], [rgb_feat, reflect_emb], bf16=cfg.mlp_bf16
    )
    return jax.nn.sigmoid(out)  # [3, M]


def forward_coarse_sorted(
    params, buffers, cfg: SDFModelConfig, box: SceneBox,
    rays_o, rays_d, viewdirs, s_val, near, bg,
) -> Dict[str, jnp.ndarray]:
    """Geometry-searching / coarse render on the row-sorted stream,
    channel-major end to end (``ops/sorted_cm.py``).

    Semantics match ``forward_coarse`` with dense (``shade_k == 0``)
    shading.  Per-sample data lives as 1-D [M] arrays / [C, M] matrices
    in grid-row order; only five scalar channels (alpha, rgb x3, n.v)
    cross back to ray order for the transmittance scan, and the grid
    gradient consumes cotangents already sorted (no backward permute).
    ``normal_marched`` is not produced (training losses consume the
    per-sample ``ndv``); use the lattice engine for eval artifacts.
    """
    from fgs_nerf_tpu.ops.ray_sample import ray_box_intersect
    from fgs_nerf_tpu.ops.sdf2alpha import neus_alpha_from_cos
    from fgs_nerf_tpu.ops.sorted_cm import (
        corner_weights_cm, pack_gather_sorted_cm, padded_rows_cm,
        rows_fracs_cm, rows_to_coords_cm, sort_stream, unsort_channels,
    )
    from fgs_nerf_tpu.ops.stencils import sdf_gradient_cm

    n = rays_o.shape[0]
    dist = jnp.asarray(cfg.step_dist, jnp.float32)

    # ---- per-axis lattice sampling (bitwise-identical expressions to
    # ops.ray_sample.sample_along_rays, evaluated channel-wise so the
    # [N, S] arrays keep full lanes) -----------------------------------
    t_min, t_max = ray_box_intersect(rays_o, rays_d, box, near, 1e9)
    d_norm = jnp.linalg.norm(rays_d, axis=-1)
    n_steps = jnp.maximum(
        jnp.ceil((t_max - t_min) * d_norm / cfg.step_dist), 1.0
    ).astype(jnp.int32)
    start = rays_o + rays_d * t_min[..., None]  # [N, 3]
    dir_unit = rays_d / d_norm[..., None]
    step_ids = jnp.arange(cfg.s_max, dtype=jnp.float32)

    def axes_at(steps):  # steps [N, S'] -> 3 x [N, S'] world coords
        d_ = steps * cfg.step_dist
        return tuple(
            start[:, a:a + 1] + dir_unit[:, a:a + 1] * d_ for a in range(3)
        )

    steps0 = jnp.broadcast_to(step_ids[None, :], (n, cfg.s_max))
    px, py, pz = axes_at(steps0)
    in_range = step_ids[None, :] < n_steps[:, None].astype(jnp.float32)
    valid = in_range
    for a, p in enumerate((px, py, pz)):
        valid = valid & (p >= box.xyz_min[a]) & (p <= box.xyz_max[a])

    needs_pts = (
        (cfg.stage == "coarse" and "mask_cache" in buffers)
        or "inc_lower" in buffers
    )
    if needs_pts:
        pts = jnp.stack([px, py, pz], axis=-1)
        if cfg.stage == "coarse" and "mask_cache" in buffers:
            valid = valid & mask_cache_query(
                buffers["mask_cache"], pts, cfg.mask_cache_thres
            )
        if "inc_lower" in buffers:
            valid = valid & inc_mask_query(
                buffers["inc_lower"], buffers["inc_upper"], pts, box,
                cfg.world_size,
            )

    if 0 < cfg.sample_k < cfg.s_max:
        valid, steps, sample_overflow = _compact_valid(valid, cfg.sample_k)
        px, py, pz = axes_at(steps)
    else:
        steps = steps0
        sample_overflow = jnp.zeros((n,), bool)
    s = valid.shape[-1]
    m = n * s

    # ---- field, channel-major ----------------------------------------
    sdf_grid = params["sdf"]
    if cfg.smooth_sdf:
        sdf_grid = smooth_grid(sdf_grid, cfg.smooth_ksize, cfg.smooth_sigma)
    # gradient field from the RAW grid (`model/nerf.py:972`)
    grad_cm = sdf_gradient_cm(params["sdf"][..., 0], cfg.voxel_size,
                              cfg.grad_mode)
    k0_cm = jnp.transpose(k0_dense(params, cfg), (3, 0, 1, 2))
    field_cm = jnp.concatenate(
        [sdf_grid[..., 0][None], grad_cm, k0_cm], axis=0
    )  # [4 + k0_dim, X, Y, Z]

    # ---- keys / sort --------------------------------------------------
    sizes = cfg.world_size
    ext = box.extent
    ix = (px - box.xyz_min[0]) / ext[0] * (sizes[0] - 1.0)
    iy = (py - box.xyz_min[1]) / ext[1] * (sizes[1] - 1.0)
    iz = (pz - box.xyz_min[2]) / ext[2] * (sizes[2] - 1.0)
    rows, (fx, fy, fz), ok = rows_fracs_cm(ix, iy, iz, sizes)
    r_sent = padded_rows_cm(sizes)
    keys = jnp.where(valid & ok, rows, r_sent).reshape(m)

    iota = jnp.arange(m, dtype=jnp.int32)
    vshape = (n, s)
    vdx = jnp.broadcast_to(viewdirs[:, 0:1], vshape).reshape(m)
    vdy = jnp.broadcast_to(viewdirs[:, 1:2], vshape).reshape(m)
    vdz = jnp.broadcast_to(viewdirs[:, 2:3], vshape).reshape(m)
    keys_s, iota_s, fx_s, fy_s, fz_s, vx_s, vy_s, vz_s = sort_stream(
        keys, iota, fx.reshape(m), fy.reshape(m), fz.reshape(m),
        vdx, vdy, vdz, pack16=cfg.sort_pack16,
    )
    w8_s = corner_weights_cm(fx_s, fy_s, fz_s)  # [8, M]

    samp = pack_gather_sorted_cm(field_cm, keys_s, w8_s)  # [4 + k0_dim, M]
    sdf_s = samp[0]
    gx, gy, gz = samp[1], samp[2], samp[3]
    k0_s = samp[4:]

    true_cos = vx_s * gx + vy_s * gy + vz_s * gz
    alpha_s = neus_alpha_from_cos(true_cos, sdf_s, dist, s_val)
    # normal = l2_normalize(g / (|g|_safe + 1e-7)) — same op chain as
    # the lattice engine's _safe_norm + l2_normalize, componentwise
    gn = jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-24)) + 1e-7
    hx, hy, hz = gx / gn, gy / gn, gz / gn
    hn = jnp.sqrt(
        jnp.maximum(hx * hx + hy * hy + hz * hz,
                    float(np.finfo(np.float32).eps))
    )
    nx, ny, nz = hx / hn, hy / hn, hz / hn
    ndv_s = -(nx * vx_s + ny * vy_s + nz * vz_s)

    b0, b1, b2 = rows_to_coords_cm(jnp.minimum(keys_s, r_sent - 1), sizes)
    rays_xyz_s = (
        (b0 - 1.0 + fx_s) / (sizes[0] - 1.0),
        (b1 - 1.0 + fy_s) / (sizes[1] - 1.0),
        (b2 - 1.0 + fz_s) / (sizes[2] - 1.0),
    )

    shade = lambda p, a, b_, c_, d_: _shade_coarse_cm(p, cfg, a, b_, c_, d_)  # noqa: E731
    if cfg.shade_remat:
        shade = jax.checkpoint(shade)
    rgb_s = shade(params, rays_xyz_s, (vx_s, vy_s, vz_s), (nx, ny, nz), k0_s)

    alpha_u, r_u, g_u, b_u, ndv_u = unsort_channels(
        iota_s, keys, (alpha_s, rgb_s[0], rgb_s[1], rgb_s[2], ndv_s)
    )
    alpha = alpha_u.reshape(n, s)
    ndv = ndv_u.reshape(n, s)
    rgb_ch = (r_u.reshape(n, s), g_u.reshape(n, s), b_u.reshape(n, s))

    # ray-major tail — identical to forward_coarse's double scan
    w1, _ = alpha_to_weights(alpha, valid)
    if cfg.fast_color_thres > 0:
        live = valid & (w1 > cfg.fast_color_thres)
    else:
        live = valid
    weights, alphainv_last = alpha_to_weights(alpha, live)

    w_full = weights * live
    cum_w = jnp.sum(w_full, axis=-1)  # [N]
    comp, comp_sig = [], []
    for ch in rgb_ch:
        comp.append(jnp.clip(
            jnp.sum(w_full * ch, axis=-1) + (1.0 - cum_w) * bg, 0.0, 1.0
        ))
        comp_sig.append(jnp.clip(
            jnp.sum(w_full * jax.nn.sigmoid(ch), axis=-1)
            + (1.0 - cum_w) * bg,
            0.0, 1.0,
        ))
    rgb_marched = jnp.stack(comp, axis=-1)
    sigmoid_rgb = jnp.stack(comp_sig, axis=-1)
    depth = jax.lax.stop_gradient(jnp.sum(w_full * steps * dist, axis=-1))

    return {
        "rgb_marched": rgb_marched,
        "sigmoid_rgb": sigmoid_rgb,
        "alphainv_cum": alphainv_last,
        "cum_weights": cum_w[..., None],
        "depth": depth,
        "disp": 1.0 / jnp.maximum(depth, 1e-10),
        "weights": w_full,
        "ndv": ndv,
        "live": live,
        "valid": valid,
        "sel_weights": w_full,
        "sel_rgb_ch": rgb_ch,
        "sel_live": live,
        "overflow": sample_overflow,
        "overflow_sample": sample_overflow,
        "overflow_shade": jnp.zeros((n,), bool),
        "s_val": s_val,
    }
