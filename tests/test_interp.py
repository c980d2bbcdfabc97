"""Interpolation ops vs torch goldens (the reference is built on
``F.grid_sample``/``F.interpolate``/``F.max_pool3d``; torch-cpu is the
oracle for exact parity).  Reference call conventions:
`model/grid.py:49-68` (trilinear query with zyx flip),
`model/grid.py:101-106` (align-corners trilinear resize),
`model/nerf.py:597-637` (six-tap finite differences),
`model/cuda/render_utils_kernel.cu:367-424` (nearest bool lookup)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from fgs_nerf_tpu.core.box import SceneBox
from fgs_nerf_tpu.ops.interp import (
    center_gradient_taps,
    max_pool3d_same,
    nearest_bool_lookup,
    resize_trilinear,
    sample_sdf_taps,
    trilinear_sample,
)

XYZ_MIN = np.array([-1.2, -0.9, -1.05], np.float32)
XYZ_MAX = np.array([0.8, 1.1, 0.95], np.float32)


def torch_grid_query(grid_xyzc, xyz, xyz_min, xyz_max, mode="bilinear"):
    """The reference's query path: flip xyz->zyx, grid_sample on
    [1, C, X, Y, Z], align_corners=True, zero padding."""
    g = torch.from_numpy(np.moveaxis(grid_xyzc, -1, 0)[None])  # [1,C,X,Y,Z]
    q = torch.from_numpy(xyz.reshape(1, 1, 1, -1, 3))
    ind_norm = (q - torch.from_numpy(xyz_min)) / torch.from_numpy(
        xyz_max - xyz_min
    )
    ind_norm = ind_norm.flip((-1,)) * 2 - 1
    out = F.grid_sample(g, ind_norm, mode=mode, align_corners=True)
    return out.reshape(g.shape[1], -1).T.numpy()  # [N, C]


def test_trilinear_matches_grid_sample(rng):
    grid = rng.normal(size=(9, 11, 7, 4)).astype(np.float32)
    box = SceneBox.create(XYZ_MIN, XYZ_MAX)
    # queries inside, outside, and exactly on the box boundary
    xyz = rng.uniform(XYZ_MIN - 0.4, XYZ_MAX + 0.4, size=(500, 3)).astype(np.float32)
    xyz[0] = XYZ_MIN
    xyz[1] = XYZ_MAX
    ours = np.asarray(trilinear_sample(jnp.asarray(grid), jnp.asarray(xyz), box))
    gold = torch_grid_query(grid, xyz, XYZ_MIN, XYZ_MAX)
    np.testing.assert_allclose(ours, gold, atol=2e-5)


def test_trilinear_gradient_is_finite_and_correct(rng):
    import jax

    grid = rng.normal(size=(5, 5, 5, 2)).astype(np.float32)
    box = SceneBox.create(XYZ_MIN, XYZ_MAX)
    xyz = rng.uniform(XYZ_MIN, XYZ_MAX, size=(50, 3)).astype(np.float32)

    def f(g):
        return jnp.sum(trilinear_sample(g, jnp.asarray(xyz), box) ** 2)

    g_an = jax.grad(f)(jnp.asarray(grid))
    # numerical check on a few entries
    eps = 1e-3
    idx = [(0, 1, 2, 0), (2, 3, 1, 1), (4, 4, 4, 0)]
    f0 = float(f(jnp.asarray(grid)))
    for i in idx:
        gp = grid.copy()
        gp[i] += eps
        fp = float(f(jnp.asarray(gp)))
        num = (fp - f0) / eps
        assert abs(num - float(g_an[i])) < 5e-2 * max(1.0, abs(num))


def test_resize_matches_interpolate(rng):
    grid = rng.normal(size=(6, 7, 5, 3)).astype(np.float32)
    new_size = (13, 4, 9)
    ours = np.asarray(resize_trilinear(jnp.asarray(grid), new_size))
    g = torch.from_numpy(np.moveaxis(grid, -1, 0)[None])
    gold = F.interpolate(g, size=new_size, mode="trilinear", align_corners=True)
    gold = np.moveaxis(gold[0].numpy(), 0, -1)
    np.testing.assert_allclose(ours, gold, atol=2e-6)


def test_max_pool_matches_torch(rng):
    grid = rng.normal(size=(8, 6, 7, 2)).astype(np.float32)
    ours = np.asarray(max_pool3d_same(jnp.asarray(grid), 3))
    g = torch.from_numpy(np.moveaxis(grid, -1, 0)[None])
    gold = F.max_pool3d(g, kernel_size=3, padding=1, stride=1)
    gold = np.moveaxis(gold[0].numpy(), 0, -1)
    np.testing.assert_allclose(ours, gold, atol=0)


def test_nearest_bool_lookup(rng):
    mask = rng.uniform(size=(10, 12, 9)) > 0.5
    box = SceneBox.create(XYZ_MIN, XYZ_MAX)
    xyz = rng.uniform(XYZ_MIN - 0.3, XYZ_MAX + 0.3, size=(400, 3)).astype(np.float32)
    ours = np.asarray(nearest_bool_lookup(jnp.asarray(mask), jnp.asarray(xyz), box))
    # golden: round(xyz*scale+shift) half-away-from-zero, bounds-check
    sizes = np.array(mask.shape)
    scale = (sizes - 1) / (XYZ_MAX - XYZ_MIN)
    shift = -XYZ_MIN * scale
    ijk = np.floor(xyz * scale + shift + 0.5).astype(int)
    inb = np.all((ijk >= 0) & (ijk < sizes), axis=-1)
    gold = np.zeros(len(xyz), bool)
    gold[inb] = mask[tuple(ijk[inb].T)]
    np.testing.assert_array_equal(ours, gold)


def torch_sample_sdfs(grid_1ch, xyz, xyz_min, xyz_max, displace_list, voxel_size,
                      use_grad_norm):
    """Torch golden of `model/nerf.py:597-637`: taps in zyx index space,
    clamped, trilinearly sampled, finite differences over post-clamp
    index distance."""
    g = torch.from_numpy(grid_1ch[None, None])  # [1,1,X,Y,Z]
    q = torch.from_numpy(xyz.reshape(1, 1, 1, -1, 3))
    ind_norm = (q - torch.from_numpy(xyz_min)) / torch.from_numpy(
        xyz_max - xyz_min
    )
    ind_norm = ind_norm.flip((-1,)) * 2 - 1
    gs = grid_1ch.shape
    size_zyx = torch.tensor([gs[2], gs[1], gs[0]], dtype=torch.float64)
    ind = ((ind_norm.double() + 1) / 2) * (size_zyx - 1)
    offset = torch.tensor(
        [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
        dtype=torch.float64,
    )
    displace = torch.tensor(displace_list, dtype=torch.float64)
    offset = offset[:, None, :] * displace[None, :, None]
    all_ind = ind.unsqueeze(-2) + offset.view(-1, 3)
    all_ind = all_ind.view(1, 1, 1, -1, 3)
    for a in range(3):
        all_ind[..., a] = all_ind[..., a].clamp(min=0, max=float(size_zyx[a] - 1))
    all_ind_norm = (all_ind / (size_zyx - 1)) * 2 - 1
    feat = F.grid_sample(g.double(), all_ind_norm, mode="bilinear", align_corners=True)
    D = len(displace_list)
    n = xyz.shape[0]
    all_ind = all_ind.view(1, 1, 1, -1, 6, D, 3)
    diff = all_ind[..., 1::2, :, :] - all_ind[..., 0::2, :, :]
    diff, _ = diff.max(dim=-1)
    feat_ = feat.view(1, 1, 1, -1, 6, D)
    feat_diff = feat_[..., 1::2, :] - feat_[..., 0::2, :]
    grad = feat_diff / diff / voxel_size
    feat = feat.view(n, 6, D)
    grad = grad.view(n, 3, D)
    if use_grad_norm:
        grad = grad / (grad.norm(dim=1, keepdim=True) + 1e-5)
    return feat.numpy(), grad.numpy()


def test_sample_sdf_taps_matches_reference_math(rng):
    grid = rng.normal(size=(12, 10, 11)).astype(np.float32)
    box = SceneBox.create(XYZ_MIN, XYZ_MAX)
    xyz = rng.uniform(XYZ_MIN, XYZ_MAX, size=(200, 3)).astype(np.float32)
    displace = [0.5, 1.0, 1.5, 2.0]
    vs = 0.017
    for ugn in (False, True):
        feat, grad = sample_sdf_taps(
            jnp.asarray(grid[..., None]), jnp.asarray(xyz), box, displace, vs, ugn
        )
        gfeat, ggrad = torch_sample_sdfs(
            grid, xyz, XYZ_MIN, XYZ_MAX, displace, vs, ugn
        )
        np.testing.assert_allclose(np.asarray(feat), gfeat, atol=3e-5)
        np.testing.assert_allclose(np.asarray(grad), ggrad, atol=3e-3)


def test_center_gradient_reorder(rng):
    grid = rng.normal(size=(9, 9, 9)).astype(np.float32)
    box = SceneBox.create(XYZ_MIN, XYZ_MAX)
    xyz = rng.uniform(XYZ_MIN, XYZ_MAX, size=(60, 3)).astype(np.float32)
    vs = 0.02
    grad_xyz, feat_xyz = center_gradient_taps(
        jnp.asarray(grid[..., None]), jnp.asarray(xyz), box, vs
    )
    gfeat, ggrad = torch_sample_sdfs(grid, xyz, XYZ_MIN, XYZ_MAX, [1.0], vs, False)
    # reference reorder (`model/nerf.py:663-664`): feat zyx-taps -> x,y,z
    gold_feat = np.concatenate(
        [gfeat[:, 4:6, 0], gfeat[:, 2:4, 0], gfeat[:, 0:2, 0]], axis=-1
    )
    gold_grad = np.stack([ggrad[:, 2, 0], ggrad[:, 1, 0], ggrad[:, 0, 0]], axis=-1)
    np.testing.assert_allclose(np.asarray(feat_xyz), gold_feat, atol=3e-5)
    np.testing.assert_allclose(np.asarray(grad_xyz), gold_grad, atol=3e-3)


def test_packed_gather_matches_plain(rng):
    """Cell-packed single-row-gather forward == 8-corner golden, values
    and grid gradients, including out-of-range and boundary queries."""
    import jax
    from fgs_nerf_tpu.ops.interp import (
        trilinear_sample_index,
        trilinear_sample_index_packed,
    )

    grid = jnp.asarray(rng.normal(size=(7, 6, 5, 4)).astype(np.float32))
    # interior, exact-node, boundary, partially and fully out-of-range
    idx = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-0.5, 6.5, size=(64, 3)),
                np.array(
                    [
                        [0.0, 0.0, 0.0],
                        [6.0, 5.0, 4.0],
                        [-1.0, 2.0, 2.0],
                        [-0.4, 5.2, 4.0],
                        [6.9, -0.9, 3.3],
                        [-2.5, 2.0, 2.0],
                        [9.0, 9.0, 9.0],
                    ]
                ),
            ]
        ).astype(np.float32)
    )
    out_plain = trilinear_sample_index(grid, idx)
    out_packed = trilinear_sample_index_packed(grid, idx)
    np.testing.assert_allclose(out_packed, out_plain, rtol=1e-6, atol=1e-6)

    cot = jnp.asarray(rng.normal(size=out_plain.shape).astype(np.float32))
    g_plain = jax.grad(lambda g: jnp.sum(trilinear_sample_index(g, idx) * cot))(grid)
    g_packed = jax.grad(
        lambda g: jnp.sum(trilinear_sample_index_packed(g, idx) * cot)
    )(grid)
    np.testing.assert_allclose(g_packed, g_plain, rtol=1e-6, atol=1e-6)


def test_trilinear_sample_packed_world_coords(rng):
    box = SceneBox.create(XYZ_MIN, XYZ_MAX)
    grid = jnp.asarray(rng.normal(size=(9, 8, 7, 3)).astype(np.float32))
    xyz = jnp.asarray(
        rng.uniform(XYZ_MIN - 0.2, XYZ_MAX + 0.2, size=(128, 3)).astype(np.float32)
    )
    a = trilinear_sample(grid, xyz, box)
    b = trilinear_sample(grid, xyz, box, packed=True)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_packed_gather_bf16_conv_branch(rng, monkeypatch):
    """Pin the TPU-only bf16 slice-concat pack branch from CI (ADVICE r2):
    force ``_use_pallas_pack`` on and assert ``_cellpack_gather_impl``
    matches the exact fp32 path within bf16 rounding, and that the
    custom VJP (which is the same exact sort-scatter either way) is
    unaffected by the forward's pack dtype."""
    import jax
    from fgs_nerf_tpu.ops import interp as I

    monkeypatch.setattr(I, "_use_pallas_pack", lambda: True)
    grid = jnp.asarray(rng.normal(size=(7, 6, 5, 4)).astype(np.float32))
    idx = jnp.asarray(
        np.concatenate([
            rng.uniform(-0.5, 6.5, size=(64, 3)),
            np.array([[0.0, 0.0, 0.0], [6.0, 5.0, 4.0], [-1.0, 2.0, 2.0],
                      [-2.5, 2.0, 2.0], [9.0, 9.0, 9.0]]),
        ]).astype(np.float32)
    )
    out_bf16 = I._cellpack_gather_impl(grid, idx)
    out_exact = I._trilinear_sample_index_impl(grid, idx)
    # bf16 has an 8-bit mantissa: values agree to ~2^-8 relative
    np.testing.assert_allclose(out_bf16, out_exact, rtol=1.5e-2, atol=1.5e-2)

    cot = jnp.asarray(rng.normal(size=out_exact.shape).astype(np.float32))
    g_packed = jax.grad(
        lambda g: jnp.sum(I.trilinear_sample_index_packed(g, idx) * cot)
    )(grid)
    g_plain = jax.grad(
        lambda g: jnp.sum(I.trilinear_sample_index(g, idx) * cot)
    )(grid)
    np.testing.assert_allclose(g_packed, g_plain, rtol=1e-6, atol=1e-6)
