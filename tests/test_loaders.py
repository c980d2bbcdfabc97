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
