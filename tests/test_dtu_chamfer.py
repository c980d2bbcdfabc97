"""DTU chamfer machinery on synthetic fixtures (no DTU data needed):
triangle point sampling density, greedy downsampling, and an end-to-end
chamfer between two spheres with a synthetic ObsMask."""
import os

import numpy as np
import pytest

from fgs_nerf_tpu.eval import mesh as mesh_lib
from fgs_nerf_tpu.eval.dtu_chamfer import (
    density_downsample, dtu_chamfer, sample_mesh_points,
)


def sphere_mesh(n=24, r=50.0):
    axes = [np.linspace(-100, 100, n)] * 3
    x, y, z = np.meshgrid(*axes, indexing="ij")
    field = (r - np.sqrt(x**2 + y**2 + z**2)).astype(np.float32)
    verts, tris = mesh_lib.marching_tetrahedra(field, 0.0)
    verts = verts / (n - 1) * 200.0 - 100.0
    return verts, tris


def test_sample_density():
    verts, tris = sphere_mesh()
    pts = sample_mesh_points(verts.astype(np.float64), tris, thresh=1.0)
    assert len(pts) > len(verts)  # dense sampling adds interior points
    r = np.linalg.norm(pts, axis=-1)
    assert abs(np.mean(r) - 50.0) < 1.5


def test_downsample_spacing():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, size=(2000, 3))
    down = density_downsample(pts, radius=1.0)
    assert len(down) < len(pts)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(down).query(down, k=2)
    assert (d[:, 1] >= 1.0 - 1e-9).all()


def test_chamfer_end_to_end(tmp_path):
    from scipy.io import savemat

    verts, tris = sphere_mesh(n=28, r=50.0)
    mesh_path = str(tmp_path / "pred.ply")
    mesh_lib.write_ply(mesh_path, verts, tris)

    # ground-truth "stl": a sphere of radius 52 -> chamfer ~2mm
    rng = np.random.default_rng(1)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    stl = (d * 52.0).astype(np.float32)
    scene = 1
    ds_dir = tmp_path / "DTU"
    os.makedirs(ds_dir / "ObsMask")
    os.makedirs(ds_dir / "Points" / "stl")
    mesh_lib.write_ply(
        str(ds_dir / "Points" / "stl" / f"stl{scene:03}_total.ply"),
        stl, np.zeros((0, 3), np.int64),
    )
    # ObsMask: everything observed, 10mm grid over [-100,100]^3
    bb = np.array([[-100.0, -100.0, -100.0], [100.0, 100.0, 100.0]])
    savemat(str(ds_dir / "ObsMask" / f"ObsMask{scene}_10.mat"),
            {"ObsMask": np.ones((21, 21, 21), np.uint8), "BB": bb,
             "Res": np.array([[10.0]])})
    # ground plane far below -> everything above
    savemat(str(ds_dir / "ObsMask" / f"Plane{scene}.mat"),
            {"P": np.array([[0.0], [0.0], [1.0], [1000.0]])})

    d2s, s2d, overall = dtu_chamfer(
        mesh_path, scene, str(ds_dir), str(tmp_path), runtime=True
    )
    assert 0.5 < overall < 4.5, (d2s, s2d, overall)
    assert os.path.exists(tmp_path / "result.txt")
