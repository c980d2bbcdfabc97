"""Mesh extraction: native C++ marching tetrahedra vs numpy fallback,
sphere geometric accuracy, and PLY roundtrip."""
import numpy as np
import pytest

from fgs_nerf_tpu.eval import mesh as mesh_lib


def sphere_field(n=24, r=0.6):
    axes = [np.linspace(-1, 1, n)] * 3
    x, y, z = np.meshgrid(*axes, indexing="ij")
    return (r - np.sqrt(x**2 + y**2 + z**2)).astype(np.float32)  # >0 inside


def test_native_lib_builds():
    assert mesh_lib._build_native() is not None, "g++ build of marching_tet failed"


def test_sphere_surface_accuracy():
    n = 32
    field = sphere_field(n)
    verts, tris = mesh_lib.marching_tetrahedra(field, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    # vertices (index space) -> world
    world = verts / (n - 1) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=-1)
    assert abs(np.mean(radii) - 0.6) < 0.01
    assert np.max(np.abs(radii - 0.6)) < 0.05
    # all triangle indices valid
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_native_matches_numpy_fallback():
    field = sphere_field(10)
    v1, t1 = mesh_lib.marching_tetrahedra(field, 0.0)
    v2, t2 = mesh_lib._marching_tet_numpy(field, 0.0)
    assert len(v1) == len(v2) and len(t1) == len(t2)
    # same vertex sets (possibly same order by construction)
    np.testing.assert_allclose(np.sort(v1, axis=0), np.sort(v2, axis=0), atol=1e-5)


def test_extract_geometry_world_space():
    def query(pts):
        return 0.5 - np.linalg.norm(pts - np.array([0.1, 0.0, 0.0]), axis=-1)

    verts, tris = mesh_lib.extract_geometry(
        np.array([-1.0, -1.0, -1.0]), np.array([1.0, 1.0, 1.0]),
        resolution=40, threshold=0.0, query_fn=query,
    )
    d = np.linalg.norm(verts - np.array([0.1, 0.0, 0.0]), axis=-1)
    assert abs(np.mean(d) - 0.5) < 0.01


def test_ply_roundtrip(tmp_path):
    field = sphere_field(12)
    verts, tris = mesh_lib.marching_tetrahedra(field, 0.0)
    p = str(tmp_path / "m.ply")
    mesh_lib.write_ply(p, verts, tris)
    v2, t2 = mesh_lib.read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(t2, tris)
