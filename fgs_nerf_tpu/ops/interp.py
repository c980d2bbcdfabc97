"""Grid interpolation ops: trilinear gather, nearest lookup, finite-difference
tap sampling, and align-corners trilinear resize.

These replace the reference's uses of ATen ``F.grid_sample`` (5-D
trilinear, zero padding, align_corners=True — `model/grid.py:49-68`,
`model/nerf.py:639-672`), the CUDA nearest-voxel ``maskcache_lookup``
(`model/cuda/render_utils_kernel.cu:367-424`), the six-tap
finite-difference sampler ``sample_sdfs`` (`model/nerf.py:597-637`),
and ``F.interpolate(mode='trilinear', align_corners=True)``
(`model/grid.py:101-106`).

Conventions: grids are channel-last ``[X, Y, Z, C]`` and all sampling is
done in **xyz index space** (the reference flips coordinates to zyx only
because grid_sample demands it; flipping is an artifact we drop).
The backward of the trilinear gather is XLA's deterministic scatter-add
— unlike the reference, whose grid_sample backward is explicitly
nondeterministic (`model/utils.py:100-107`).
"""
from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fgs_nerf_tpu.core.box import SceneBox


def _use_pallas_pack() -> bool:
    """bf16 pack builder on real TPU backends only; CPU tests and the
    virtual mesh keep the exact fp32 slice-concat build."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _build_pack_slices(grid: jnp.ndarray) -> jnp.ndarray:
    """bf16 cell-pack table via 8 shifted slices + concat.

    The pack row of padded base (bx, by, bz) holds the 8 corner values,
    corner k = dx*4 + dy*2 + dz at channels [k*C, (k+1)*C).  Round-3
    measurement (v5e): casting the grid to bf16 FIRST makes the
    slice-concat build 3.3 ms vs 7.7 ms for the one-hot im2col conv it
    replaces (the round-1 "slices cost 10-14 ms" figure was fp32 —
    bandwidth halves in bf16 and the concat fuses).  bf16 values are
    EXACT bf16(grid): the build only moves bytes.
    """
    x, y, z, c = grid.shape
    gp = jnp.pad(grid.astype(jnp.bfloat16), ((1, 1), (1, 1), (1, 1), (0, 0)))
    parts = [
        jax.lax.slice(gp, (dx, dy, dz, 0), (dx + x + 1, dy + y + 1, dz + z + 1, c))
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    ]
    return jnp.concatenate(parts, axis=-1).reshape(-1, 8 * c)


def _corner_gather(flat_grid, ci, sizes):
    """Gather [..., C] values at integer coords ``ci`` [..., 3], zero outside."""
    inb = jnp.all((ci >= 0) & (ci < sizes), axis=-1)
    cc = jnp.clip(ci, 0, sizes - 1)
    lin = (cc[..., 0] * sizes[1] + cc[..., 1]) * sizes[2] + cc[..., 2]
    vals = jnp.take(flat_grid, lin, axis=0)
    return vals * inb[..., None].astype(flat_grid.dtype)


def _trilinear_sample_index_impl(grid: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Reference 8-corner gather implementation (autodiff backward uses
    XLA scatter-add — kept as the golden model for the custom VJP)."""
    sizes = jnp.asarray(grid.shape[:3], jnp.int32)
    flat = grid.reshape(-1, grid.shape[-1])
    i0 = jnp.floor(idx).astype(jnp.int32)
    f = idx - i0.astype(idx.dtype)
    out = None
    for off in itertools.product((0, 1), repeat=3):
        off_arr = jnp.asarray(off, jnp.int32)
        w = jnp.prod(
            jnp.where(jnp.asarray(off, bool), f, 1.0 - f), axis=-1
        )
        v = _corner_gather(flat, i0 + off_arr, sizes)
        term = w[..., None] * v
        out = term if out is None else out + term
    return out


@jax.custom_vjp
def trilinear_sample_index(grid: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation at fractional **index-space** coords.

    grid: [X, Y, Z, C]; idx: [..., 3] in voxel units ([0, size-1] maps
    onto the grid, align_corners=True).  Out-of-range corners read as
    zero (torch zero padding).

    Custom VJP: the grid gradient uses the sort + rank-compressed
    one-hot-matmul scheme of ``ops.scatter`` (deterministic and ~5x
    cheaper than XLA's per-element scatter-add on TPU).  The cotangent
    w.r.t. ``idx`` is declared ZERO: sample positions never depend on
    trainable parameters in this framework (rays and tap offsets are
    data), so position gradients are never consumed.
    """
    return _trilinear_sample_index_impl(grid, idx)


def _tri_idx_fwd(grid, idx):
    return _trilinear_sample_index_impl(grid, idx), (grid.shape, idx)


def _tri_idx_bwd(res, g):
    from fgs_nerf_tpu.ops.scatter import corner_scatter_grid_grad

    grid_shape, idx = res
    c = grid_shape[-1]
    i0 = jnp.floor(idx).astype(jnp.int32)
    fracs = (idx - i0.astype(idx.dtype)).reshape(-1, 3)
    grad_grid = corner_scatter_grid_grad(
        i0.reshape(-1, 3), fracs, g.reshape(-1, c).astype(jnp.float32),
        grid_shape,
    )
    return grad_grid, jnp.zeros_like(idx)


trilinear_sample_index.defvjp(_tri_idx_fwd, _tri_idx_bwd)


def _cellpack_gather_impl(grid: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Cell-packed trilinear gather: same math as
    ``_trilinear_sample_index_impl`` but ONE row gather per sample.

    TPU row-gather cost is bimodal in row width (measured on v5e, see
    ``scripts/microbench_gather.py`` section D): <=32-byte and
    >=512-byte rows move at ~5-12 ns/row while 64-256-byte rows cost
    3-7x more.  Eight separate 64-byte corner gathers are therefore far
    slower than ONE 512-byte gather from a grid whose 2x2x2 cell corners
    are pre-packed into a single row.  The pack is built per call with
    dense shifted slices (bandwidth-bound, ~8x grid bytes) and pays for
    itself whenever the sample count is much larger than the voxel
    count — the render pass-1 regime.

    The padded pack covers base cells -1..size-1 per axis, so every
    partially-in-range base reads its out-of-range corners as exact
    zeros (the reference's zero-padding semantics).
    """
    x, y, z, c = grid.shape
    if _use_pallas_pack():
        pack = _build_pack_slices(grid)  # [(X+1)(Y+1)(Z+1), 8C] bf16
    else:
        gp = jnp.pad(grid, ((1, 1), (1, 1), (1, 1), (0, 0)))
        parts = [
            jax.lax.slice(gp, (dx, dy, dz, 0), (dx + x + 1, dy + y + 1, dz + z + 1, c))
            for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
        ]
        pack = jnp.concatenate(parts, axis=-1).reshape(-1, 8 * c)
    c_eff = c

    sizes = jnp.asarray((x, y, z), jnp.int32)
    i0 = jnp.floor(idx).astype(jnp.int32)
    f = (idx - i0.astype(idx.dtype)).reshape(-1, 3)
    base_ok = jnp.all((i0 >= -1) & (i0 < sizes), axis=-1).reshape(-1)
    b = jnp.clip(i0, -1, sizes - 1) + 1  # padded coords in [0, size]
    rows = ((b[..., 0] * (y + 1) + b[..., 1]) * (z + 1) + b[..., 2]).reshape(-1)
    v = jnp.take(pack, rows, axis=0)  # [M, 8*c_eff]

    wx = jnp.stack([1.0 - f[:, 0], f[:, 0]], axis=-1)
    wy = jnp.stack([1.0 - f[:, 1], f[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], axis=-1)
    # corner order dx slowest, dz fastest — matches the parts order above
    w = (
        wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    ).reshape(-1, 8)
    w = w * base_ok[:, None].astype(w.dtype)
    # Explicit per-corner slice-FMAs: the tempting
    # ``sum(v.reshape(M, 8, C) * w[..., None], axis=1)`` makes XLA
    # materialize a channel-major [C, M] intermediate through a serial
    # relayout while-loop (~12 ms/step at the bench workload); 8 planar
    # multiply-adds fuse into one elementwise pass.
    out = None
    for k in range(8):
        term = v[:, k * c_eff : k * c_eff + c].astype(jnp.float32) * w[:, k : k + 1]
        out = term if out is None else out + term
    return out.reshape(*idx.shape[:-1], c)


@jax.custom_vjp
def trilinear_sample_index_packed(grid: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``trilinear_sample_index`` with a cell-packed single-row-gather
    forward (see ``_cellpack_gather_impl``) and the identical
    sort-scatter backward.  Values are exact on CPU backends (fp32
    slice-concat pack) and bf16-rounded (~2^-8 relative) on TPU, where
    the pack is built in bf16 for HBM-traffic reasons; the VJP computes
    the exact fp32 gradient either way.  Prefer it when samples >> voxels
    (render pass 1); the plain variant avoids the 8x pack build cost
    for small query sets (mask-cache tests, grid-node queries)."""
    return _cellpack_gather_impl(grid, idx)


def _tri_idx_packed_fwd(grid, idx):
    return _cellpack_gather_impl(grid, idx), (grid.shape, idx)


trilinear_sample_index_packed.defvjp(_tri_idx_packed_fwd, _tri_idx_bwd)


PACK_BYTES_CAP = 2 << 30  # 2 GiB: the cell pack is 8x grid bytes


def pack_worthwhile(grid_shape, n_samples: int) -> bool:
    """Should the cell-packed gather be used for this (grid, query) pair?

    The pack build costs ~8x the grid bytes per call; it pays off only
    when the sample count is of the order of the voxel count (render
    pass 1) and the pack itself fits comfortably in HBM (a 256^3 x 13ch
    fp32 fine grid would pack to ~7 GB — use the plain gather there).
    """
    x, y, z, c = grid_shape
    pack_bytes = 8 * 4 * c * (x + 1) * (y + 1) * (z + 1)
    return pack_bytes <= PACK_BYTES_CAP and n_samples * 4 >= x * y * z


def trilinear_sample(
    grid: jnp.ndarray, xyz: jnp.ndarray, box: SceneBox, packed: bool = False
) -> jnp.ndarray:
    """Trilinear sample at world coords (parity: `model/grid.py:49-68`)."""
    sizes = jnp.asarray(grid.shape[:3], jnp.float32)
    idx = box.normalize(xyz) * (sizes - 1.0)
    if packed and pack_worthwhile(grid.shape, int(np.prod(xyz.shape[:-1]))):
        return trilinear_sample_index_packed(grid, idx)
    return trilinear_sample_index(grid, idx)


def nearest_bool_lookup(
    mask: jnp.ndarray, xyz: jnp.ndarray, box: SceneBox
) -> jnp.ndarray:
    """Nearest-voxel boolean occupancy test.

    Parity with ``maskcache_lookup`` (`render_utils_kernel.cu:374-392`):
    ``ijk = round(xyz * scale + shift)`` with scale ``(size-1)/extent``;
    out-of-bounds returns False.  CUDA ``round`` is half-away-from-zero,
    emulated with floor(x + 0.5) (coords in-bound are non-negative).
    """
    sizes = jnp.asarray(mask.shape, jnp.int32)
    scale = (sizes.astype(jnp.float32) - 1.0) / box.extent
    shift = -box.xyz_min * scale
    ijk = jnp.floor(xyz * scale + shift + 0.5).astype(jnp.int32)
    inb = jnp.all((ijk >= 0) & (ijk < sizes), axis=-1)
    cc = jnp.clip(ijk, 0, sizes - 1)
    lin = (cc[..., 0] * sizes[1] + cc[..., 1]) * sizes[2] + cc[..., 2]
    return jnp.take(mask.reshape(-1), lin) & inb


def sample_sdf_taps(
    grid: jnp.ndarray,
    xyz: jnp.ndarray,
    box: SceneBox,
    displace_list: Sequence[float],
    voxel_size: float,
    use_grad_norm: bool,
    sample_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Six-neighbor tap sampling + finite-difference gradients.

    Parity with ``sample_sdfs`` (`model/nerf.py:597-637`): for each
    displacement d, sample the (1-channel) grid trilinearly at the
    query index +/- d along each axis, with the tap *coordinates*
    clamped to [0, size-1] before sampling; the gradient divides the
    value difference by the (post-clamp) index distance and the voxel
    size.  Tap/axis ordering follows the reference's zyx layout so the
    flattened features feed MLPs identically:

    Returns:
      feat: [..., 6, D] taps ordered (z-, z+, y-, y+, x-, x+).
      grad: [..., 3, D] axes ordered (z, y, x); normalized per-level
            over the axis dim when ``use_grad_norm``
            (`model/nerf.py:631-632`).
    """
    sizes = jnp.asarray(grid.shape[:3], jnp.float32)
    idx = box.normalize(xyz) * (sizes - 1.0)  # [..., 3] xyz index space

    displace = jnp.asarray(displace_list, jnp.float32)  # [D]
    d = len(displace_list)
    # Offsets in xyz axis order; emitted tap order is (z-, z+, y-, y+, x-, x+).
    # All 6*D taps are sampled in ONE trilinear call so the backward runs
    # a single sort-scatter machine instead of six.
    offs = jnp.asarray(
        [[0, 0, -1], [0, 0, 1], [0, -1, 0], [0, 1, 0], [-1, 0, 0], [1, 0, 0]],
        jnp.float32,
    )  # [6, 3] in (z-, z+, y-, y+, x-, x+) tap order, xyz components
    tap_off = offs[:, None, :] * displace[None, :, None]  # [6, D, 3]
    tap_idx = idx[..., None, None, :] + tap_off  # [..., 6, D, 3]
    tap_idx = jnp.clip(tap_idx, 0.0, sizes - 1.0)
    # ``sample_fn`` overrides the gather (e.g. the spatially sharded
    # gather of parallel/spatial.py); default is the dense custom-VJP op.
    gather = sample_fn if sample_fn is not None else trilinear_sample_index
    feat = gather(grid, tap_idx)[..., 0]  # [..., 6, D]
    # post-clamp coordinate of each tap along its displaced axis
    tap_coord = jnp.stack(
        [
            tap_idx[..., 0, :, 2], tap_idx[..., 1, :, 2],
            tap_idx[..., 2, :, 1], tap_idx[..., 3, :, 1],
            tap_idx[..., 4, :, 0], tap_idx[..., 5, :, 0],
        ],
        axis=-2,
    )  # [..., 6, D]

    # Post-clamp index distance between the +/- taps of each axis
    # (the reference takes max over coords, which selects the displaced
    # axis: `model/nerf.py:621-623`).
    dist = tap_coord[..., 1::2, :] - tap_coord[..., 0::2, :]  # [..., 3, D]
    # Far outside the grid both taps clamp to the same coordinate and
    # dist hits 0; those are masked-out lattice slots, but a NaN there
    # would poison `0 * NaN` composites, so guard the division.
    dist = jnp.where(dist > 0, dist, 1.0)
    grad = (feat[..., 1::2, :] - feat[..., 0::2, :]) / dist / voxel_size
    if use_grad_norm:
        norm = jnp.sqrt(
            jnp.maximum(jnp.sum(grad**2, axis=-2, keepdims=True), 1e-24)
        )
        grad = grad / (norm + 1e-5)
    return feat, grad


def center_gradient_taps(
    grid: jnp.ndarray, xyz: jnp.ndarray, box: SceneBox, voxel_size: float,
    sample_fn=None,
):
    """The displace=1.0 tap pass used by the fine forward for its alpha
    gradient, reordered to xyz (parity: `model/nerf.py:660-667`).

    Returns (grad_xyz [..., 3], feat [..., 6] ordered (x-,x+,y-,y+,z-,z+)).
    """
    feat, grad = sample_sdf_taps(
        grid, xyz, box, (1.0,), voxel_size, use_grad_norm=False,
        sample_fn=sample_fn,
    )
    feat = feat[..., :, 0]  # [..., 6] (z-, z+, y-, y+, x-, x+)
    grad = grad[..., :, 0]  # [..., 3] (z, y, x)
    feat_xyz = jnp.concatenate(
        [feat[..., 4:6], feat[..., 2:4], feat[..., 0:2]], axis=-1
    )
    grad_xyz = jnp.stack(
        [grad[..., 2], grad[..., 1], grad[..., 0]], axis=-1
    )
    return grad_xyz, feat_xyz


def _resize_axis_linear(grid: jnp.ndarray, axis: int, new_len: int) -> jnp.ndarray:
    old_len = grid.shape[axis]
    if old_len == new_len:
        return grid
    if old_len == 1:
        reps = [1] * grid.ndim
        reps[axis] = new_len
        return jnp.tile(grid, reps)
    pos = jnp.linspace(0.0, old_len - 1.0, new_len)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, old_len - 2)
    f = pos - i0.astype(pos.dtype)
    lo = jnp.take(grid, i0, axis=axis)
    hi = jnp.take(grid, i0 + 1, axis=axis)
    shape = [1] * grid.ndim
    shape[axis] = new_len
    f = f.reshape(shape)
    return lo * (1.0 - f) + hi * f


def resize_trilinear(grid: jnp.ndarray, new_size: Sequence[int]) -> jnp.ndarray:
    """Align-corners trilinear resize of an [X, Y, Z, C] grid.

    Parity with ``F.interpolate(..., mode='trilinear',
    align_corners=True)`` (`model/grid.py:101-106`); separable per-axis
    linear interpolation is exact for this mode.
    """
    out = grid
    for axis, n in enumerate(new_size):
        out = _resize_axis_linear(out, axis, int(n))
    return out


def max_pool3d_same(grid: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """kxkxk max pool, stride 1, same padding over an [X, Y, Z, C] grid
    (parity: ``F.max_pool3d(kernel_size=3, padding=1, stride=1)`` at
    `model/nerf.py:1199`)."""
    pad = ksize // 2
    return jax.lax.reduce_window(
        grid,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(ksize, ksize, ksize, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(pad, pad)] * 3 + [(0, 0)],
    )
