"""ILSH (light-stage head) loader (`lib/load_ILSH.py:278-355`).

An LLFF-derived format: ``poses_bounds.npy`` + ``images/`` +
``mask/`` (+ optional COLMAP ``stereo/depth_maps/*.geometric.bin``).
Reuses the LLFF pose machinery (recenter / spherify / spiral path);
default ``bd_factor=1`` per the reference dispatcher
(`lib/load_data.py:182-186`).
"""
from __future__ import annotations

import os
from glob import glob
from typing import Dict

import numpy as np

from fgs_nerf_tpu.data.llff import (
    _normalize,
    _poses_avg,
    _recenter_poses,
    _render_path_spiral,
    _spherify_poses,
)


def read_colmap_depth(path: str) -> np.ndarray:
    """COLMAP ``*.geometric.bin`` depth map (`lib/load_ILSH.py:16-31`):
    an ASCII ``w&h&c&`` header followed by little-endian f32 in
    column-major order."""
    with open(path, "rb") as fid:
        width, height, channels = np.genfromtxt(
            fid, delimiter="&", max_rows=1, usecols=(0, 1, 2), dtype=int
        )
        fid.seek(0)
        num_delim = 0
        while num_delim < 3:
            if fid.read(1) == b"&":
                num_delim += 1
        array = np.fromfile(fid, np.float32)
    array = array.reshape((width, height, channels), order="F")
    return np.transpose(array, (1, 0, 2)).squeeze()


def _read_dir(dirpath: str, factor: int):
    import imageio.v2 as imageio

    files = sorted(
        f for f in glob(os.path.join(dirpath, "*"))
        if f.lower().endswith(("jpg", "jpeg", "png"))
    )
    out = []
    for f in files:
        im = imageio.imread(f)
        if factor and factor > 1:
            import cv2

            h, w = im.shape[:2]
            im = cv2.resize(
                im, (w // factor, h // factor), interpolation=cv2.INTER_AREA
            )
        out.append((im / 255.0).astype(np.float32))
    return out


def load_ilsh_data(
    basedir: str, factor: int = 1, recenter: bool = True, bd_factor: float = 1.0,
    spherify: bool = False, load_depths: bool = False,
) -> Dict:
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    imgs = _read_dir(os.path.join(basedir, "images"), factor)
    imgs = np.stack([im[..., :3] for im in imgs])
    mask_dir = os.path.join(basedir, "mask")
    if os.path.isdir(mask_dir):
        masks = np.stack(_read_dir(mask_dir, factor))
    else:
        masks = np.ones_like(imgs[..., 0])
    depths = None
    if load_depths:
        dfiles = sorted(
            glob(os.path.join(basedir, "stereo", "depth_maps", "*.geometric.bin"))
        )
        depths = np.stack([read_colmap_depth(f) for f in dfiles], 0)

    poses[:2, 4, :] = np.array(imgs[0].shape[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] / (factor or 1)
    # [down right back] -> [right up back]
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds *= sc
    if depths is not None:
        depths = depths * sc

    if recenter:
        poses = _recenter_poses(poses)
    if spherify:
        poses, render_poses, bds = _spherify_poses(poses, bds)
    else:
        c2w = _poses_avg(poses)
        up = _normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
        rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
        render_poses = _render_path_spiral(
            c2w, up, rads, focal, zrate=0.5, rots=2, n=120
        )
    render_poses = np.array(render_poses, np.float32)

    c2w = _poses_avg(poses)
    dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
    i_test = int(np.argmin(dists))
    return dict(
        images=imgs.astype(np.float32), depths=depths,
        poses=poses.astype(np.float32), bds=bds,
        render_poses=render_poses, i_test=i_test, masks=masks,
    )
