"""Dataset loaders on tiny on-disk fixtures (format specs from
`lib/load_blender.py`, `lib/load_nsvf.py`, `lib/load_tankstemple.py`)."""
import json
import os

import numpy as np
import pytest

from fgs_nerf_tpu.config.base import Cfg
from fgs_nerf_tpu.data.dataset import load_dataset


def _write_png(path, h=8, w=8, channels=4):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, size=(h, w, channels))).astype(np.uint8)
    if channels == 1:
        img = img[..., 0]
    imageio.imwrite(path, img)


def make_blender_fixture(root):
    for split in ("train", "val", "test"):
        frames = []
        for i in range(3 if split == "train" else 1):
            name = f"r_{split}_{i}"
            _write_png(os.path.join(root, name + ".png"))
            c2w = np.eye(4)
            c2w[2, 3] = 4.0
            frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)


def cfg_for(root, dtype):
    return Cfg(dict(
        data=dict(datadir=root, dataset_type=dtype, white_bkgd=True,
                  half_res=False, testskip=1, inverse_y=False, flip_x=False,
                  flip_y=False, ndc=False, factor=1, llffhold=8,
                  spherify=False),
    ))


def test_blender_fixture(tmp_path):
    root = str(tmp_path)
    make_blender_fixture(root)
    dd = load_dataset(cfg_for(root, "blender"))
    assert dd["images"].shape[-1] == 3  # RGBA composited
    assert dd["near"] == 2.0 and dd["far"] == 6.0
    assert len(dd["i_train"]) == 3 and len(dd["i_test"]) == 1
    assert dd["Ks"].shape[-2:] == (3, 3)
    assert dd["masks"].shape == dd["images"].shape[:3]


def make_nsvf_fixture(root, with_traj=False, n=4):
    os.makedirs(os.path.join(root, "pose"))
    os.makedirs(os.path.join(root, "rgb"))
    for i in range(n):
        split = 0 if i < n - 1 else 1
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.5, 0.0, 3.0]
        np.savetxt(os.path.join(root, "pose", f"{split}_{i:03d}.txt"), pose)
        _write_png(os.path.join(root, "rgb", f"{split}_{i:03d}.png"), channels=3)
    np.savetxt(os.path.join(root, "intrinsics.txt"),
               np.array([[50.0, 0, 4], [0, 50.0, 4], [0, 0, 1]]))
    if with_traj:
        np.savetxt(os.path.join(root, "test_traj.txt"),
                   np.stack([np.eye(4)] * 2).reshape(-1, 4))


def test_nsvf_fixture(tmp_path):
    root = str(tmp_path)
    make_nsvf_fixture(root)
    dd = load_dataset(cfg_for(root, "nsvf"))
    assert len(dd["i_train"]) == 3 and len(dd["i_val"]) == 1
    assert dd["near"] < dd["far"]


def test_tankstemple_fixture(tmp_path):
    root = str(tmp_path)
    make_nsvf_fixture(root, with_traj=True)
    dd = load_dataset(cfg_for(root, "tankstemple"))
    assert dd["render_poses"].shape[-2:] == (4, 4)
    assert len(dd["i_test"]) >= 1


def test_blendedmvs_fixture(tmp_path):
    root = str(tmp_path)
    make_nsvf_fixture(root, with_traj=True)
    dd = load_dataset(cfg_for(root, "blendedmvs"))
    assert dd["images"].shape[-1] == 3


def make_idr_fixture(root, n=9, ext="jpg", scale=True):
    """IDR cameras.npz + image/ + mask/ layout (vbmvs / mobile_brick)."""
    os.makedirs(os.path.join(root, "image"))
    os.makedirs(os.path.join(root, "mask"))
    cams = {}
    for i in range(n):
        _write_png(os.path.join(root, "image", f"{i:03d}.{ext}"), channels=3)
        _write_png(os.path.join(root, "mask", f"{i:03d}.png"), channels=3)
        k = np.array([[50.0, 0, 4, 0], [0, 50.0, 4, 0], [0, 0, 1, 0]])
        c2w = np.eye(4)
        c2w[:3, 3] = [np.cos(i), np.sin(i), 3.0]
        w2c = np.linalg.inv(c2w)
        cams[f"world_mat_{i}"] = k @ w2c
        if scale:
            cams[f"scale_mat_{i}"] = np.eye(4)
    np.savez(os.path.join(root, "cameras.npz"), **cams)


def test_volsdf_bmvs_fixture(tmp_path):
    root = str(tmp_path)
    make_idr_fixture(root, scale=False)
    dd = load_dataset(cfg_for(root, "volsdf_bmvs"))
    assert len(dd["i_test"]) == 2  # every 6th of 9
    assert dd["images"].shape[-1] == 3
    assert dd["near"] < dd["far"]


def test_mobile_brick_fixture(tmp_path):
    root = str(tmp_path)
    make_idr_fixture(root)
    cfg = cfg_for(root, "mobile_brick")
    cfg["reso_level"] = 2
    dd = load_dataset(cfg)
    assert dd["images"].shape[1:3] == (4, 4)  # 8x8 downsampled by 2
    assert dd["scale_mats_np"] is not None
    # test ids are (i-3) % 8 == 0 pre-train_all
    assert 3 in dd["i_test"]


def test_scannet_fixture(tmp_path):
    root = str(tmp_path)
    n = 12
    cams = {}
    for i in range(n):
        _write_png(os.path.join(root, f"{i:03d}_rgb.png"), channels=3)
        np.save(os.path.join(root, f"{i:03d}_depth.npy"),
                np.ones((8, 8), np.float32))
        np.save(os.path.join(root, f"{i:03d}_normal.npy"),
                np.full((3, 8, 8), 0.5, np.float32))
        k = np.array([[50.0, 0, 4, 0], [0, 50.0, 4, 0], [0, 0, 1, 0]])
        c2w = np.eye(4)
        c2w[:3, 3] = [np.cos(i), np.sin(i), 3.0]
        cams[f"world_mat_{i}"] = k @ np.linalg.inv(c2w)
        cams[f"scale_mat_{i}"] = np.eye(4)
    np.savez(os.path.join(root, "cameras.npz"), **cams)
    dd = load_dataset(cfg_for(root, "scannet"))
    assert dd["depths"].shape == (n, 8, 8)
    assert dd["normals"].shape == (n, 8, 8, 3)
    # normals remapped [0,1] -> [-1,1]
    assert np.allclose(dd["normals"], 0.0)
    assert len(dd["i_test"]) == 2  # every 10th of 12


def test_nerfpp_fixture(tmp_path):
    root = str(tmp_path)
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 50.0
    for split, n in (("train", 4), ("test", 2)):
        for sub in ("intrinsics", "pose", "rgb"):
            os.makedirs(os.path.join(root, split, sub))
        for i in range(n):
            np.savetxt(os.path.join(root, split, "intrinsics", f"{i:03d}.txt"),
                       k.reshape(-1)[None])
            c2w = np.eye(4)
            c2w[:3, 3] = [np.cos(i + (split == "test")), np.sin(i), 1.0]
            np.savetxt(os.path.join(root, split, "pose", f"{i:03d}.txt"),
                       c2w.reshape(-1)[None])
            _write_png(os.path.join(root, split, "rgb", f"{i:03d}.png"),
                       channels=3)
    dd = load_dataset(cfg_for(root, "nerfpp"))
    assert dd["near"] == 0.0 and dd["far"] > 0
    assert len(dd["i_train"]) == 4 and len(dd["i_test"]) == 2


def test_co3d_fixture(tmp_path):
    import gzip
    import json as _json

    root = str(tmp_path)
    seq = "seq1"
    annot, split = [], {"known_frames": [], "unseen_frames": []}
    for i in range(4):
        im_path = f"img_{i}.png"
        mask_path = f"mask_{i}.png"
        # one irregular shape to exercise the object-array path
        h = 8 if i < 3 else 10
        _write_png(os.path.join(root, im_path), h=h, channels=3)
        _write_png(os.path.join(root, mask_path), h=h, channels=1)
        annot.append({
            "sequence_name": seq,
            "image": {"path": im_path, "size": [h, 8]},
            "mask": {"path": mask_path, "mass": 10},
            "viewpoint": {
                "R": np.eye(3).tolist(), "T": [0.0, 0.0, 3.0],
                "principal_point": [0.0, 0.0], "focal_length": [2.0, 2.0],
            },
        })
        key = "known_frames" if i < 3 else "unseen_frames"
        split[key].append([seq, i, im_path])
    annot_path = os.path.join(root, "annot.jgz")
    with gzip.open(annot_path, "wt", encoding="utf8") as f:
        _json.dump(annot, f)
    split_path = os.path.join(root, "split.json")
    with open(split_path, "w") as f:
        _json.dump(split, f)
    cfg = cfg_for(root, "co3d")
    cfg["data"]["annot_path"] = annot_path
    cfg["data"]["split_path"] = split_path
    cfg["data"]["sequence_name"] = seq
    dd = load_dataset(cfg)
    assert dd["irregular_shape"]
    assert len(dd["i_train"]) == 3 and len(dd["i_test"]) == 1
    # white composite applied per image
    assert dd["images"][0].shape[-1] == 3


def test_ilsh_fixture(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "mask"))
    n = 6
    arr = np.zeros((n, 17))
    for i in range(n):
        _write_png(os.path.join(root, "images", f"{i:03d}.png"), channels=3)
        _write_png(os.path.join(root, "mask", f"{i:03d}.png"), channels=1)
        c2w = np.eye(3, 5)
        c2w[:3, 3] = [np.cos(i) * 0.1, np.sin(i) * 0.1, 1.0]
        c2w[:2, 4] = [8, 8]
        c2w[2, 4] = 50.0
        arr[i, :15] = c2w.reshape(-1)
        arr[i, 15:] = [1.0, 5.0]
    np.save(os.path.join(root, "poses_bounds.npy"), arr)
    dd = load_dataset(cfg_for(root, "ILSH"))
    assert dd["near"] < dd["far"]
    assert dd["render_poses"].shape[-1] == 4
    assert len(dd["i_test"]) == 1  # llffhold=8 over 6 images -> [0]
