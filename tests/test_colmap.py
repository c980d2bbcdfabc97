"""COLMAP binary model reader on a synthetic fixture written in the
documented format."""
import os
import struct

import numpy as np

from fgs_nerf_tpu.data.colmap import (
    colmap_to_poses_bounds, qvec2rotmat, read_model,
)


def write_fixture(sparse):
    os.makedirs(sparse, exist_ok=True)
    # cameras.bin: one SIMPLE_PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, 640, 480))
        f.write(struct.pack("<3d", 500.0, 320.0, 240.0))
    # points3D.bin: 4 points
    pts = np.array([[0, 0, 5], [1, 0, 5], [0, 1, 6], [0, 0, 7]], np.float64)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<Q", 100 + i))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", 255, 0, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    # images.bin: 2 identity-ish views observing the points
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for img_id, name in [(1, "a.png"), (2, "b.png")]:
            f.write(struct.pack("<i", img_id))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<3d", 0.1 * img_id, 0.0, 0.0))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            for pid in (100, 101):
                f.write(struct.pack("<3d", 10.0, 20.0, float(pid)))


def test_read_model_roundtrip(tmp_path):
    sparse = str(tmp_path / "sparse0")
    write_fixture(sparse)
    cams, imgs, pts, id2idx = read_model(sparse)
    assert cams[1].model == "SIMPLE_PINHOLE"
    assert cams[1].params[0] == 500.0
    assert len(imgs) == 2 and imgs[1].name == "a.png"
    assert pts.shape == (4, 3)
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))


def test_poses_bounds_shape(tmp_path):
    sparse = str(tmp_path / "sparse0")
    write_fixture(sparse)
    rows = colmap_to_poses_bounds(sparse)
    assert rows.shape == (2, 17)
    pose = rows[0, :15].reshape(3, 5)
    np.testing.assert_allclose(pose[:, 4], [480, 640, 500])
    near, far = rows[0, 15:]
    assert 0 < near <= far


def test_run_colmap_cli_smoke(tmp_path):
    """The capture->dataset CLI end to end on the synthetic sparse
    fixture (`/root/reference/run_colmap.py:13-46` surface): one command
    takes an image dir + reconstruction to poses_bounds.npy +
    cameras_sphere.npz."""
    import runpy
    import sys

    root = tmp_path / "capture"
    sparse = str(root / "sparse" / "0")
    write_fixture(sparse)
    img_dir = root / "images"
    os.makedirs(img_dir, exist_ok=True)
    import imageio.v2 as imageio

    imageio.imwrite(
        str(img_dir / "0.png"),
        np.zeros((8, 8, 3), np.uint8),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv_save = sys.argv
    sys.argv = ["run_colmap.py", "--custom_dataset_path", str(root),
                "--skip_masks"]
    try:
        with np.testing.assert_raises(SystemExit) as cm:
            runpy.run_path(os.path.join(repo, "run_colmap.py"),
                           run_name="__main__")
        assert cm.exception.code == 0
    finally:
        sys.argv = argv_save
    pb = np.load(str(root / "poses_bounds.npy"))
    assert pb.shape[1] == 17
    cs = np.load(str(root / "cameras_sphere.npz"))
    assert any(k.startswith("world_mat_") for k in cs.files)
    assert any(k.startswith("scale_mat_") for k in cs.files)
