"""Pure-torch CPU oracle of the reference's composed forwards.

Assembles the reference's `forward_coarse` / `forward_fine`
(`/root/reference/model/nerf.py:943-1075, 776-941`) from CUDA-free
pieces, exactly as SURVEY.md §4 prescribes:

* the ragged sampler from the `sample_pts_on_rays` spec
  (`model/cuda/render_utils_kernel.cu:12-55, 144-242`);
* trilinear gathers via torch `F.grid_sample` with the reference's
  zyx coordinate flip (`model/nerf.py:639-672`, `model/grid.py:49-68`);
* the transmittance scan from the serial CUDA loop incl. the T < 1e-3
  early exit (`render_utils_kernel.cu:577-651`) — the python
  `cumprod_exclusive` spec of `model/dvgo.py:409-417` without the exit;
* the SDF->alpha formula (`model/nerf.py:510-544`), the shading heads
  (`model/nerf.py:835-884, 993-1009`) and the segment_coo composites.

Everything here is eager fp32 torch on CPU and autograd-differentiable,
so the parity tests can compare images AND parameter gradients against
the jax build (BASELINE.md allclose target).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _grid_torch(grid_xyzc: np.ndarray) -> torch.Tensor:
    """[X, Y, Z, C] numpy -> [1, C, X, Y, Z] torch parameter layout."""
    return torch.tensor(
        np.ascontiguousarray(np.transpose(grid_xyzc, (3, 0, 1, 2)))[None],
        dtype=torch.float32,
    )


def grid_sampler(grid: torch.Tensor, xyz: torch.Tensor, xyz_min, xyz_max
                 ) -> torch.Tensor:
    """`model/nerf.py:639-660`: normalize, flip to zyx, F.grid_sample
    trilinear align_corners=True, zero padding.  grid [1, C, X, Y, Z],
    xyz [M, 3] -> [M, C] (squeezed to [M] for C == 1 by callers)."""
    ind_norm = ((xyz - xyz_min) / (xyz_max - xyz_min)).flip((-1,)) * 2 - 1
    out = F.grid_sample(
        grid, ind_norm.reshape(1, 1, 1, -1, 3), mode="bilinear",
        align_corners=True,
    )
    return out.reshape(grid.shape[1], -1).T


def sample_rays_ragged(rays_o, rays_d, xyz_min, xyz_max, near, stepdist):
    """`sample_pts_on_rays` spec (`render_utils_kernel.cu:144-242`) with
    the in-bbox compaction of `model/nerf.py:690-698`; far = 1e9
    (`model/nerf.py:686`).  Returns (pts [M, 3], ray_id [M],
    step_id [M])."""
    far = 1e9
    vec = torch.where(rays_d == 0, torch.full_like(rays_d, 1e-6), rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = torch.minimum(rate_a, rate_b).amax(-1).clamp(min=near, max=far)
    t_max = torch.maximum(rate_a, rate_b).amin(-1).clamp(min=near, max=far)
    rnorm = rays_d.norm(dim=-1)
    n_steps = torch.clamp(
        torch.ceil((t_max - t_min) * rnorm / stepdist), min=1.0
    ).long()
    start = rays_o + rays_d * t_min[:, None]
    dir_unit = rays_d / rnorm[:, None]
    pts_l, rid_l, sid_l = [], [], []
    for i in range(rays_o.shape[0]):
        steps = torch.arange(int(n_steps[i]), dtype=torch.float32)
        p = start[i] + dir_unit[i] * (steps * stepdist)[:, None]
        inb = ((p >= xyz_min) & (p <= xyz_max)).all(-1)
        pts_l.append(p[inb])
        rid_l.append(torch.full((int(inb.sum()),), i, dtype=torch.long))
        sid_l.append(steps[inb])
    return torch.cat(pts_l), torch.cat(rid_l), torch.cat(sid_l)


def gaussian_smooth(grid: torch.Tensor, ksize: int, sigma: float
                    ) -> torch.Tensor:
    """`_gaussian_3dconv` (`model/nerf.py:260-272`): normalized gaussian
    kernel, replicate padding."""
    ax = np.arange(-(ksize // 2), ksize // 2 + 1, 1)
    xx, yy, zz = np.meshgrid(ax, ax, ax)
    k = np.exp(-(xx**2 + yy**2 + zz**2) / (2 * sigma**2))
    k = torch.tensor(k / k.sum(), dtype=torch.float32)[None, None]
    pad = ksize // 2
    gp = F.pad(grid, (pad,) * 6, mode="replicate")
    return F.conv3d(gp, k)


def sdf_gradient_interpolate(sdf: torch.Tensor, voxel_size: float
                             ) -> torch.Tensor:
    """`neus_sdf_gradient` mode='interpolate' (`model/nerf.py:490-494`):
    central differences, zero at faces."""
    g = torch.zeros(1, 3, *sdf.shape[-3:])
    g[:, 0, 1:-1] = (sdf[:, 0, 2:] - sdf[:, 0, :-2]) / 2 / voxel_size
    g[:, 1, :, 1:-1] = (sdf[:, 0, :, 2:] - sdf[:, 0, :, :-2]) / 2 / voxel_size
    g[:, 2, :, :, 1:-1] = (
        sdf[:, 0, :, :, 2:] - sdf[:, 0, :, :, :-2]
    ) / 2 / voxel_size
    return g


def neus_alpha(viewdirs_pts, dist, sdf, gradients, s_val):
    """`neus_alpha_from_sdf_scatter` (`model/nerf.py:510-544`)."""
    inv_s = 1.0 / s_val
    true_cos = (viewdirs_pts * gradients).sum(-1, keepdim=True)
    iter_cos = -F.relu(-true_cos)  # cos_anneal_ratio == 1
    sdf = sdf.reshape(-1, 1)
    est_next = sdf + iter_cos * dist * 0.5
    est_prev = sdf - iter_cos * dist * 0.5
    prev_cdf = torch.sigmoid(est_prev * inv_s)
    next_cdf = torch.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return ((p + 1e-5) / (c + 1e-5)).clip(0.0, 1.0).squeeze(-1)


class _Alphas2Weights(torch.autograd.Function):
    """Serial scan with early exit, fwd `render_utils_kernel.cu:577-605`
    / bwd `:654-707`."""

    @staticmethod
    def forward(ctx, alpha, ray_id, n_rays):
        a = alpha.detach()
        m = a.shape[0]
        weight = torch.zeros(m)
        T = torch.ones(m)
        alphainv_last = torch.ones(n_rays)
        i_start = torch.zeros(n_rays, dtype=torch.long)
        i_end = torch.zeros(n_rays, dtype=torch.long)
        for idx in range(1, m):
            if ray_id[idx] != ray_id[idx - 1]:
                i_start[ray_id[idx]] = idx
                i_end[ray_id[idx - 1]] = idx
        if m:
            i_end[ray_id[m - 1]] = m
        for r in range(n_rays):
            t_cum = 1.0
            i = int(i_start[r])
            while i < int(i_end[r]):
                T[i] = t_cum
                weight[i] = t_cum * float(a[i])
                t_cum *= 1.0 - float(a[i])
                i += 1
                if t_cum < 1e-3:
                    break
            i_end[r] = i
            alphainv_last[r] = t_cum
        ctx.save_for_backward(a, weight, T, alphainv_last, i_start, i_end)
        ctx.n_rays = n_rays
        return weight, alphainv_last

    @staticmethod
    def backward(ctx, grad_weights, grad_last):
        a, weight, T, alphainv_last, i_start, i_end = ctx.saved_tensors
        grad = torch.zeros_like(a)
        for r in range(ctx.n_rays):
            back_cum = float(grad_last[r]) * float(alphainv_last[r])
            for i in range(int(i_end[r]) - 1, int(i_start[r]) - 1, -1):
                grad[i] = float(grad_weights[i]) * float(T[i]) - back_cum / (
                    1 - float(a[i]) + 1e-10
                )
                back_cum += float(grad_weights[i]) * float(weight[i])
        return grad, None, None


def alphas_to_weights(alpha, ray_id, n_rays):
    return _Alphas2Weights.apply(alpha, ray_id, n_rays)


def sincos_emb(x: torch.Tensor, n_pe: int) -> torch.Tensor:
    """`model/nerf.py:838-839` etc.: [x, sin(x f), cos(x f)] with
    per-dim-major frequency flattening."""
    freqs = torch.tensor([2.0**i for i in range(n_pe)])
    xf = (x.unsqueeze(-1) * freqs).flatten(-2)
    return torch.cat([x, xf.sin(), xf.cos()], -1)


def mlp_apply(weights, x):
    """Linear/ReLU stack; ``weights`` is the jax-side flat dict (w stored
    [in, out]) converted to torch tensors."""
    n = len(weights) // 2
    for i in range(n):
        x = x @ weights[f"w{i}"] + weights[f"b{i}"]
        if i < n - 1:
            x = F.relu(x)
    return x


def l2_normalize(x, eps=torch.finfo(torch.float32).eps):
    return x / torch.sqrt(
        torch.maximum(torch.sum(x**2, dim=-1, keepdim=True),
                      torch.tensor(eps))
    )


def segment_sum(src, ray_id, n_rays):
    out = torch.zeros(n_rays, *src.shape[1:])
    return out.index_add(0, ray_id, src)


def mask_cache_filter(sdf_mask: torch.Tensor, xyz, xyz_min, xyz_max, thres):
    """`MaskCache` (`model/nerf.py:1192-1209`): 3x3x3 max-pooled mask,
    trilinear lookup >= thres."""
    pooled = F.max_pool3d(sdf_mask, kernel_size=3, padding=1, stride=1)
    val = grid_sampler(pooled, xyz, xyz_min, xyz_max)[:, 0]
    return val >= thres


def sample_sdfs(sdf_grid, xyz, xyz_min, xyz_max, displace_list,
                voxel_size, use_grad_norm):
    """`model/nerf.py:597-637`: 6-neighbor +/- taps per displacement in
    zyx index space, per-axis clamp, finite-difference grads."""
    grid_size = sdf_grid.shape[-3:]
    size_zyx = torch.tensor(
        [grid_size[2], grid_size[1], grid_size[0]], dtype=torch.float32
    )
    ind_norm = ((xyz - xyz_min) / (xyz_max - xyz_min)).flip((-1,)) * 2 - 1
    ind = ((ind_norm + 1) / 2) * (size_zyx - 1)
    offset = torch.tensor(
        [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
        dtype=torch.float32,
    )
    displace = torch.tensor(displace_list, dtype=torch.float32)
    offset = offset[:, None, :] * displace[None, :, None]  # [6, D, 3]
    all_ind = ind.unsqueeze(-2) + offset.view(-1, 3)  # [M, 6D, 3]
    for ax in range(3):
        all_ind[..., ax] = all_ind[..., ax].clamp(
            min=0, max=float(size_zyx[ax]) - 1
        )
    all_ind_norm = (all_ind / (size_zyx - 1)) * 2 - 1
    feat = F.grid_sample(
        sdf_grid, all_ind_norm.reshape(1, 1, 1, -1, 3), mode="bilinear",
        align_corners=True,
    )
    d = len(displace_list)
    m = xyz.shape[0]
    all_ind = all_ind.view(m, 6, d, 3)
    diff = (all_ind[:, 1::2] - all_ind[:, 0::2]).max(dim=-1)[0]  # [M, 3, D]
    feat_ = feat.view(m, 6, d)
    feat_diff = feat_[:, 1::2] - feat_[:, 0::2]
    grad = feat_diff / diff / voxel_size
    if use_grad_norm:
        grad = grad / (grad.norm(dim=1, keepdim=True) + 1e-5)
    return feat_.reshape(m, 6 * d), grad.reshape(m, 3 * d)


def forward_coarse(
    params, rays_o, rays_d, viewdirs, *, xyz_min, xyz_max, voxel_size,
    stepsize, near, bg, s_val, smooth_ksize, smooth_sigma, posbase_pe,
    viewbase_pe, refbase_pe, fast_color_thres, use_viewdir=True,
    stage="coarse", sdf_mask=None, mask_cache_thres=1e-3,
):
    """`model/nerf.py:943-1075` composed oracle.  ``params`` holds torch
    leaf tensors: sdf [1,1,X,Y,Z], k0 [1,C,X,Y,Z], refnet dict."""
    n = rays_o.shape[0]
    stepdist = stepsize * voxel_size
    ray_pts, ray_id, step_id = sample_rays_ragged(
        rays_o, rays_d, xyz_min, xyz_max, near, stepdist
    )
    viewdirs_pts = viewdirs[ray_id]
    if stage == "coarse" and sdf_mask is not None:
        keep = mask_cache_filter(
            sdf_mask, ray_pts, xyz_min, xyz_max, mask_cache_thres
        )
        ray_pts, ray_id = ray_pts[keep], ray_id[keep]
        viewdirs_pts, step_id = viewdirs_pts[keep], step_id[keep]

    sdf_grid = params["sdf"]
    if smooth_ksize > 0:
        sdf_grid = gaussian_smooth(params["sdf"], smooth_ksize, smooth_sigma)
    sdf = grid_sampler(sdf_grid, ray_pts, xyz_min, xyz_max)[:, 0]
    grad_field = sdf_gradient_interpolate(params["sdf"], voxel_size)
    gradient = grid_sampler(grad_field, ray_pts, xyz_min, xyz_max)
    alpha = neus_alpha(viewdirs_pts, stepdist, sdf, gradient, s_val)

    weights, alphainv_last = alphas_to_weights(alpha, ray_id, n)
    if fast_color_thres > 0:
        keep = weights > fast_color_thres
        ray_pts, ray_id = ray_pts[keep], ray_id[keep]
        viewdirs_pts, step_id = viewdirs_pts[keep], step_id[keep]
        alpha, gradient = alpha[keep], gradient[keep]
    weights, alphainv_last = alphas_to_weights(alpha, ray_id, n)
    normal = l2_normalize(gradient / (gradient.norm(dim=-1, keepdim=True)
                                      + 1e-7))

    rays_xyz = (ray_pts - xyz_min) / (xyz_max - xyz_min)
    xyz_emb = sincos_emb(rays_xyz, posbase_pe)
    k0 = grid_sampler(params["k0"], ray_pts, xyz_min, xyz_max)
    reflect_r = viewdirs_pts - 2.0 * torch.sum(
        viewdirs_pts * normal, dim=-1, keepdim=True
    ) * normal
    reflect_emb = sincos_emb(reflect_r, refbase_pe)
    feats = [k0, xyz_emb, reflect_emb, normal]
    if use_viewdir:
        vd_emb = sincos_emb(viewdirs, viewbase_pe)[ray_id]
        feats.append(vd_emb)
    rgb = torch.sigmoid(mlp_apply(params["refnet"], torch.cat(feats, -1)))
    sigmoid_rgb_pt = torch.sigmoid(rgb)  # the double sigmoid

    rgb_marched = segment_sum(weights[:, None] * rgb, ray_id, n)
    sigmoid_rgb = segment_sum(weights[:, None] * sigmoid_rgb_pt, ray_id, n)
    cum_weights = segment_sum(weights[:, None], ray_id, n)
    rgb_marched = (rgb_marched + (1 - cum_weights) * bg).clamp(0, 1)
    sigmoid_rgb = (sigmoid_rgb + (1 - cum_weights) * bg).clamp(0, 1)
    with torch.no_grad():
        depth = segment_sum(weights * step_id * stepdist, ray_id, n)
    return {
        "rgb_marched": rgb_marched,
        "sigmoid_rgb": sigmoid_rgb,
        "alphainv_cum": alphainv_last,
        "cum_weights": cum_weights,
        "depth": depth,
    }


def forward_fine(
    params, rays_o, rays_d, viewdirs, *, xyz_min, xyz_max, voxel_size,
    stepsize, near, bg, s_val, smooth_ksize, smooth_sigma, posbase_pe,
    viewbase_pe, refbase_pe, fast_color_thres, grad_feat, center_sdf=True,
    use_grad_norm=True, use_viewdir=True, sdf_mask=None,
    mask_cache_thres=1e-3,
):
    """`model/nerf.py:776-941` composed oracle (hierarchical taps,
    rgbnet -> refnet)."""
    n = rays_o.shape[0]
    stepdist = stepsize * voxel_size
    ray_pts, ray_id, step_id = sample_rays_ragged(
        rays_o, rays_d, xyz_min, xyz_max, near, stepdist
    )
    if sdf_mask is not None:
        keep = mask_cache_filter(
            sdf_mask, ray_pts, xyz_min, xyz_max, mask_cache_thres
        )
        ray_pts, ray_id, step_id = ray_pts[keep], ray_id[keep], step_id[keep]

    sdf_grid = params["sdf"]
    if smooth_ksize > 0:
        sdf_grid = gaussian_smooth(params["sdf"], smooth_ksize, smooth_sigma)
    sdf = grid_sampler(sdf_grid, ray_pts, xyz_min, xyz_max)[:, 0]
    # grid_sampler(sample_grad=True, displace=1.0): zyx taps reordered
    # to xyz (`model/nerf.py:660-667`)
    feat6, grad3 = sample_sdfs(
        sdf_grid, ray_pts, xyz_min, xyz_max, [1.0], voxel_size,
        use_grad_norm=False,
    )
    gradient = torch.cat(
        [grad3[:, [2]], grad3[:, [1]], grad3[:, [0]]], dim=-1
    )

    viewdirs_pts = viewdirs[ray_id]
    alpha = neus_alpha(viewdirs_pts, stepdist, sdf, gradient, s_val)
    if fast_color_thres > 0:
        keep = alpha > fast_color_thres
        alpha, ray_id, viewdirs_pts = alpha[keep], ray_id[keep], viewdirs_pts[keep]
        ray_pts, step_id = ray_pts[keep], step_id[keep]
        gradient, sdf = gradient[keep], sdf[keep]
    weights, alphainv_last = alphas_to_weights(alpha, ray_id, n)
    if fast_color_thres > 0:
        keep = weights > fast_color_thres
        weights, alpha = weights[keep], alpha[keep]
        ray_pts, viewdirs_pts = ray_pts[keep], viewdirs_pts[keep]
        ray_id, step_id = ray_id[keep], step_id[keep]
        gradient, sdf = gradient[keep], sdf[keep]
    normal = l2_normalize(gradient / (gradient.norm(dim=-1, keepdim=True)
                                      + 1e-7))

    rays_xyz = (ray_pts - xyz_min) / (xyz_max - xyz_min)
    xyz_emb = sincos_emb(rays_xyz, posbase_pe)
    k0 = grid_sampler(params["k0"], ray_pts, xyz_min, xyz_max)
    all_feat, all_grad = sample_sdfs(
        sdf_grid, ray_pts, xyz_min, xyz_max, sorted(set(grad_feat)),
        voxel_size, use_grad_norm=use_grad_norm,
    )
    hierarchical = []
    if center_sdf:
        hierarchical.append(sdf[:, None])
    hierarchical += [all_feat, all_grad]
    feats = [k0, xyz_emb]
    if use_viewdir:
        feats.append(sincos_emb(viewdirs, viewbase_pe)[ray_id])
    feats += hierarchical + [gradient]
    rgb_feat = mlp_apply(params["rgbnet"], torch.cat(feats, -1))
    reflect_r = viewdirs_pts - 2.0 * torch.sum(
        viewdirs_pts * normal, dim=-1, keepdim=True
    ) * normal
    reflect_emb = sincos_emb(reflect_r, refbase_pe)
    rgb = torch.sigmoid(
        mlp_apply(params["refnet"], torch.cat([rgb_feat, reflect_emb], -1))
    )
    sigmoid_rgb_pt = torch.sigmoid(rgb)

    rgb_marched = segment_sum(weights[:, None] * rgb, ray_id, n)
    sigmoid_rgb = segment_sum(weights[:, None] * sigmoid_rgb_pt, ray_id, n)
    cum_weights = segment_sum(weights[:, None], ray_id, n)
    rgb_marched = (rgb_marched + (1 - cum_weights) * bg).clamp(0, 1)
    sigmoid_rgb = (sigmoid_rgb + (1 - cum_weights) * bg).clamp(0, 1)
    with torch.no_grad():
        depth = segment_sum(weights * step_id * stepdist, ray_id, n)
    return {
        "rgb_marched": rgb_marched,
        "sigmoid_rgb": sigmoid_rgb,
        "alphainv_cum": alphainv_last,
        "cum_weights": cum_weights,
        "depth": depth,
    }
