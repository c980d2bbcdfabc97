"""3-D stencil ops on voxel grids: gaussian smoothing, SDF gradients,
and the fixed smoothing kernel used by the smooth-gradient TV term.

Replaces the reference's fixed ``nn.Conv3d`` modules
(`model/nerf.py:224-278`) and the central-difference whole-grid
gradient (`model/nerf.py:485-508`).  All grids are channel-last
[X, Y, Z, C]; replicate padding is applied with ``jnp.pad(mode='edge')``
to match torch's ``padding_mode='replicate'``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _conv3d_same_edge(grid: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """[X,Y,Z,C] grid conv with [kx,ky,kz] kernel, per-channel, edge pad."""
    kx, ky, kz = kernel.shape
    pad = [(kx // 2, kx // 2), (ky // 2, ky // 2), (kz // 2, kz // 2), (0, 0)]
    x = jnp.pad(grid, pad, mode="edge")
    # NCDHW conv with depthwise application via feature_group_count.
    c = grid.shape[-1]
    lhs = x.transpose(3, 0, 1, 2)[None]  # [1, C, X, Y, Z]
    rhs = jnp.broadcast_to(kernel[None, None], (c, 1, kx, ky, kz))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1, 1, 1)[:3],
        padding="VALID", feature_group_count=c,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return out[0].transpose(1, 2, 3, 0)


def gaussian_kernel_3d(ksize: int, sigma: float) -> np.ndarray:
    """Normalized 3-D gaussian (parity: ``_gaussian_3dconv``,
    `model/nerf.py:260-272`; note the reference builds the grid with
    np.meshgrid default 'xy' indexing, which is symmetric here)."""
    r = np.arange(-(ksize // 2), ksize // 2 + 1, 1, dtype=np.float64)
    xx, yy, zz = np.meshgrid(r, r, r)
    k = np.exp(-(xx**2 + yy**2 + zz**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _conv1d_axis_edge(grid: jnp.ndarray, k1d: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 1-D conv along one spatial axis with edge padding,
    implemented as a shift-and-add (fuses into a few adds under XLA,
    far cheaper than a dense k^3 conv)."""
    r = len(k1d) // 2
    pad = [(0, 0)] * grid.ndim
    pad[axis] = (r, r)
    x = jnp.pad(grid, pad, mode="edge")
    n = grid.shape[axis]
    out = None
    for i, w in enumerate(k1d):
        sl = jax.lax.slice_in_dim(x, i, i + n, axis=axis)
        term = w * sl
        out = term if out is None else out + term
    return out


def smooth_grid(grid: jnp.ndarray, ksize: int, sigma: float) -> jnp.ndarray:
    """Gaussian-smooth a grid with replicate padding (`model/nerf.py:274-278`).

    The gaussian factorizes exactly (exp(-(x^2+y^2+z^2)) = product of
    1-D gaussians), so this runs as three 1-D passes; normalization
    uses the 3-D kernel sum to match the reference bit-for-bit up to
    fp reassociation.
    """
    if ksize <= 0:
        return grid
    r = np.arange(-(ksize // 2), ksize // 2 + 1, 1, dtype=np.float64)
    g1 = np.exp(-(r**2) / (2.0 * sigma**2))
    # normalized 1-D passes compose to the normalized 3-D kernel
    # (sum of the separable 3-D kernel == g1.sum()^3)
    g1 = (g1 / g1.sum()).astype(np.float32)
    out = grid
    squeeze = grid.ndim == 4 and grid.shape[-1] == 1
    if squeeze:
        # a trailing 1-channel dim puts ONE value per 128-lane tile;
        # the squeezed [X, Y, Z] layout runs the shift-adds at full
        # width (measured 4.7 -> ~1 ms for the 115^3 bench smoothing)
        out = out[..., 0]
    for axis in range(3):
        out = _conv1d_axis_edge(out, g1, axis)
    return out[..., None] if squeeze else out


_BASE_KERNEL = np.asarray(
    [
        [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
        [[2, 4, 2], [4, 8, 4], [2, 4, 2]],
        [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
    ],
    np.float64,
)


def tv_smooth_kernel() -> np.ndarray:
    """The normalized 3x3x3 smoothing kernel used by the smooth-grad TV
    regularizer (`model/nerf.py:252-258`, sigma=0 so the distance
    weighting is identity)."""
    return (_BASE_KERNEL / _BASE_KERNEL.sum()).astype(np.float32)


def tv_smooth(grid: jnp.ndarray) -> jnp.ndarray:
    """The base kernel is exactly separable ([1,2,1]/4 per axis, product
    = _BASE_KERNEL/64): three shift-add passes replace the dense
    lax.conv + NCDHW transposes (which cost ~5 ms/step at the bench's
    115^3 x 3ch gradient field; values agree to fp reassociation)."""
    k1 = np.asarray([0.25, 0.5, 0.25], np.float32)
    out = grid
    for axis in range(3):
        out = _conv1d_axis_edge(out, k1, axis)
    return out


def sobel_gradient_kernels(voxel_size: float) -> np.ndarray:
    """The three 3x3x3 Sobel-like derivative kernels of
    ``init_gradient_conv`` (`model/nerf.py:224-248`), returned as
    [3, 3, 3, 3] (axis, kx, ky, kz).  kernel1 = base /
    (base[0].sum() * 2 * voxel_size); the derivative axis gets its
    center slice zeroed and its low slice negated."""
    kernel1 = _BASE_KERNEL / (_BASE_KERNEL[0].sum() * 2.0 * voxel_size)
    out = np.stack([kernel1.copy() for _ in range(3)])
    out[0][1, :, :] *= 0.0
    out[0][0, :, :] *= -1.0
    out[1][:, 1, :] *= 0.0
    out[1][:, 0, :] *= -1.0
    out[2][:, :, 1] *= 0.0
    out[2][:, :, 0] *= -1.0
    return out.astype(np.float32)


def _sdf_gradient_axes(s: jnp.ndarray, voxel_size: float, mode: str):
    """(gx, gy, gz) volumes for a [X, Y, Z] SDF — shared by the
    channel-last and channel-major stackings."""
    if mode == "interpolate":
        gx = jnp.zeros_like(s)
        gy = jnp.zeros_like(s)
        gz = jnp.zeros_like(s)
        inv = 1.0 / (2.0 * voxel_size)
        gx = gx.at[1:-1, :, :].set((s[2:, :, :] - s[:-2, :, :]) * inv)
        gy = gy.at[:, 1:-1, :].set((s[:, 2:, :] - s[:, :-2, :]) * inv)
        gz = gz.at[:, :, 1:-1].set((s[:, :, 2:] - s[:, :, :-2]) * inv)
        return gx, gy, gz
    if mode == "raw":
        gx = jnp.zeros_like(s)
        gy = jnp.zeros_like(s)
        gz = jnp.zeros_like(s)
        inv = 1.0 / voxel_size
        gx = gx.at[:-1, :, :].set((s[1:, :, :] - s[:-1, :, :]) * inv)
        gy = gy.at[:, :-1, :].set((s[:, 1:, :] - s[:, :-1, :]) * inv)
        gz = gz.at[:, :, :-1].set((s[:, :, 1:] - s[:, :, :-1]) * inv)
        return gx, gy, gz
    if mode == "grad_conv":
        ks = sobel_gradient_kernels(voxel_size)
        return tuple(
            _conv3d_same_edge(s[..., None], jnp.asarray(ks[a]))[..., 0]
            for a in range(3)
        )
    raise NotImplementedError(mode)


def sdf_gradient(
    sdf: jnp.ndarray, voxel_size: float, mode: str = "interpolate"
) -> jnp.ndarray:
    """Whole-grid SDF spatial gradient -> [X, Y, Z, 3].

    Parity with ``neus_sdf_gradient`` (`model/nerf.py:485-508`):

    * ``interpolate``: central differences / (2 * voxel_size), zero at
      the two border planes of each axis.
    * ``raw``: forward differences / voxel_size, zero at the last plane.
    * ``grad_conv``: the Sobel-like fixed convolution (replicate pad).
    """
    return jnp.stack(
        _sdf_gradient_axes(sdf[..., 0], voxel_size, mode), axis=-1
    )


def sdf_gradient_cm(
    sdf3: jnp.ndarray, voxel_size: float, mode: str = "interpolate"
) -> jnp.ndarray:
    """``sdf_gradient`` in channel-major layout: [X, Y, Z] ->
    [3, X, Y, Z] (identical per-axis volumes, different stacking —
    the sorted engine's field layout)."""
    return jnp.stack(_sdf_gradient_axes(sdf3, voxel_size, mode), axis=0)
