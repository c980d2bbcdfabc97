"""DTU / IDR-style dataset loader (`lib/load_dtu.py:13-107`).

Cameras come as projection matrices ``world_mat @ scale_mat`` in
``cameras_sphere.npz``; each is decomposed into K / R / t.  Masked
composite onto a white or black background, optional integer
down-sampling (reso_level), fixed test ids [8, 13, 16, 21, 26, 31, 34]
(+56 for big scans), and the first scale_mat returned for world-space
mesh export.
"""
from __future__ import annotations

import os
from glob import glob
from typing import Dict

import numpy as np


def load_K_Rt_from_P(p: np.ndarray):
    """Decompose a 3x4 projection matrix into intrinsics + c2w pose
    (IDR convention, `lib/load_dtu.py:13-34`).  Uses cv2's RQ-based
    decomposition to match the reference exactly."""
    import cv2

    out = cv2.decomposeProjectionMatrix(p)
    k, r, t = out[0], out[1], out[2]
    k = k / k[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = k
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = r.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def _resize_batch(imgs: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-equivalent of the reference's un-aligned
    ``F.interpolate(size=(H, W))`` (default mode='nearest')."""
    n, h0, w0, c = imgs.shape
    yi = (np.arange(h) * (h0 / h)).astype(np.int64)
    xi = (np.arange(w) * (w0 / w)).astype(np.int64)
    return imgs[:, yi][:, :, xi]


def load_dtu_data(
    basedir: str, normalize=True, reso_level=2, mask=True, white_bg=True
) -> Dict:
    import imageio.v2 as imageio

    rgb_paths = sorted(glob(os.path.join(basedir, "image", "*png")))
    if not rgb_paths:
        rgb_paths = sorted(glob(os.path.join(basedir, "image", "*jpg")))
    if not rgb_paths:
        rgb_paths = sorted(glob(os.path.join(basedir, "rgb", "*png")))
    mask_paths = sorted(glob(os.path.join(basedir, "mask", "*png")))
    if not mask_paths:
        mask_paths = sorted(glob(os.path.join(basedir, "mask", "*jpg")))

    name = "cameras_sphere.npz" if normalize else "cameras_large.npz"
    cams = np.load(os.path.join(basedir, name))
    world_mats = [cams[f"world_mat_{i}"].astype(np.float32) for i in range(len(rgb_paths))]
    scale_mats = (
        [cams[f"scale_mat_{i}"].astype(np.float32) for i in range(len(rgb_paths))]
        if normalize else None
    )

    imgs, poses, masks_l, intr = [], [], [], []
    for i, (wm, im_name) in enumerate(zip(world_mats, rgb_paths)):
        p = (wm @ scale_mats[i]) if normalize else wm
        k, pose = load_K_Rt_from_P(p[:3, :4])
        intr.append(k)
        poses.append(pose)
        imgs.append((imageio.imread(im_name) / 255.0).astype(np.float32))
        if mask_paths:
            m = (imageio.imread(mask_paths[i]) / 255.0).astype(np.float32)
            masks_l.append(m[..., :3] if m.ndim == 3 else m[..., None])
    imgs = np.stack(imgs)
    poses = np.stack(poses)
    masks = np.stack(masks_l) if masks_l else None
    h, w = imgs[0].shape[:2]
    k = intr[0]
    focal = float(k[0, 0])

    if mask:
        assert masks is not None, "DTU masked composite requires mask/ images"
        bg = 1.0 if white_bg else 0.0
        imgs = imgs * masks + bg * (1 - masks)

    if reso_level > 1:
        h, w = int(h / reso_level), int(w / reso_level)
        imgs = _resize_batch(imgs, h, w)
        if masks is not None:
            masks = _resize_batch(masks, h, w)
        k = k.copy()
        k[:2] /= reso_level
        focal /= reso_level

    i_test = [8, 13, 16, 21, 26, 31, 34]
    if len(imgs) * 0.1 >= 8:
        i_test.append(56)
    i_test = [i for i in i_test if i < len(imgs)]
    i_train = sorted(set(range(len(imgs))) - set(i_test))
    i_split = [np.array(i_train), np.array(i_test), np.array(i_test)]

    return dict(
        images=imgs,
        poses=poses,
        render_poses=poses[i_split[-1]],
        hwf=[h, w, focal],
        K=k[:3, :3],
        i_split=i_split,
        scale_mats_np=scale_mats[0] if scale_mats else None,
        masks=masks,
    )
