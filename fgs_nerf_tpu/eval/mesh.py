"""Mesh extraction and export.

Replaces the reference's PyMCubes + trimesh path
(`model/extract_geometry.py`, `model/utils.py:453-491`):

* field evaluation in fixed chunks of the query lattice (the reference
  uses 64^3 blocks; here whole z-columns per jitted call with static
  shapes),
* isosurface triangulation via the native C++ marching-tetrahedra
  kernel (``native/marching_tet.cpp``, built on first use with g++ and
  loaded through ctypes), with a numpy fallback for environments
  without a compiler,
* world-space rescale and binary-PLY export.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Callable, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_LIB_FAILED = False


def _build_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "marching_tet.cpp"))
    so = os.path.join(os.path.dirname(src), "_marching_tet.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
    except Exception:
        _LIB_FAILED = True
        return None


def marching_tetrahedra(
    field: np.ndarray, iso: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """field [X, Y, Z] -> (verts [V, 3] in index space, tris [T, 3])."""
    field = np.ascontiguousarray(field, np.float32)
    lib = _build_native()
    if lib is not None:
        pv = ctypes.POINTER(ctypes.c_float)()
        pt = ctypes.POINTER(ctypes.c_int64)()
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        rc = lib.mt_extract(
            field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            field.shape[0], field.shape[1], field.shape[2], iso,
            ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pt), ctypes.byref(nt),
        )
        if rc != 0:
            raise MemoryError("mt_extract failed")
        verts = np.ctypeslib.as_array(pv, shape=(nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(pt, shape=(nt.value, 3)).copy() if nt.value else np.zeros((0, 3), np.int64)
        lib.mt_free(pv)
        lib.mt_free(pt)
        return verts, tris
    return _marching_tet_numpy(field, iso)


# ---------------------------------------------------------------------------
# numpy fallback (same tetrahedral decomposition, slower)
# ---------------------------------------------------------------------------

_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
     [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]]
)
_CORNER = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
)


def _marching_tet_numpy(field, iso):
    nx, ny, nz = field.shape
    verts = []
    tris = []
    cache = {}

    def node_id(p):
        return (p[0] * ny + p[1]) * nz + p[2]

    def edge_vertex(pa, va, pb, vb):
        ka, kb = node_id(pa), node_id(pb)
        key = (ka, kb) if ka < kb else (kb, ka)
        if key in cache:
            return cache[key]
        denom = vb - va
        t = 0.5 if denom == 0 else np.clip((iso - va) / denom, 0, 1)
        verts.append(np.asarray(pa) + t * (np.asarray(pb) - np.asarray(pa)))
        cache[key] = len(verts) - 1
        return cache[key]

    xs, ys, zs = np.where(
        np.zeros((nx - 1, ny - 1, nz - 1), bool) |
        _cube_crosses(field, iso)
    )
    for x, y, z in zip(xs, ys, zs):
        corners = _CORNER + np.array([x, y, z])
        cv = field[corners[:, 0], corners[:, 1], corners[:, 2]]
        for tet in _TETS:
            p = corners[tet]
            v = cv[tet]
            inside = v > iso
            ni = int(inside.sum())
            if ni == 0 or ni == 4:
                continue
            ii = np.where(inside)[0]
            oo = np.where(~inside)[0]
            if ni == 1:
                e = [edge_vertex(p[ii[0]], v[ii[0]], p[o], v[o]) for o in oo]
                tris.append([e[0], e[1], e[2]])
            elif ni == 3:
                e = [edge_vertex(p[i], v[i], p[oo[0]], v[oo[0]]) for i in ii]
                tris.append([e[0], e[2], e[1]])
            else:
                e00 = edge_vertex(p[ii[0]], v[ii[0]], p[oo[0]], v[oo[0]])
                e01 = edge_vertex(p[ii[0]], v[ii[0]], p[oo[1]], v[oo[1]])
                e10 = edge_vertex(p[ii[1]], v[ii[1]], p[oo[0]], v[oo[0]])
                e11 = edge_vertex(p[ii[1]], v[ii[1]], p[oo[1]], v[oo[1]])
                tris.append([e00, e01, e11])
                tris.append([e00, e11, e10])
    verts = np.asarray(verts, np.float32) if verts else np.zeros((0, 3), np.float32)
    tris = np.asarray(tris, np.int64) if tris else np.zeros((0, 3), np.int64)
    return verts, tris


def _cube_crosses(field, iso):
    inside = field > iso
    c = inside[:-1, :-1, :-1]
    any_in = c.copy()
    all_in = c.copy()
    for dx, dy, dz in _CORNER[1:]:
        s = inside[dx:dx + field.shape[0] - 1, dy:dy + field.shape[1] - 1,
                   dz:dz + field.shape[2] - 1]
        any_in |= s
        all_in &= s
    return any_in & ~all_in


# ---------------------------------------------------------------------------
# Field evaluation + extraction pipeline
# ---------------------------------------------------------------------------


def extract_fields(
    bound_min, bound_max, resolution: int, query_fn: Callable, chunk: int = 64,
) -> np.ndarray:
    """Chunked dense field evaluation (`model/extract_geometry.py:5-19`):
    evaluates ``query_fn(pts [n,3]) -> [n]`` over a resolution^3 lattice."""
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    u = np.zeros((resolution,) * 3, np.float32)
    for xi in range(0, resolution, chunk):
        for yi in range(0, resolution, chunk):
            xx = xs[xi:xi + chunk]
            yy = ys[yi:yi + chunk]
            gx, gy, gz = np.meshgrid(xx, yy, zs, indexing="ij")
            pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
            val = np.asarray(query_fn(pts)).reshape(len(xx), len(yy), resolution)
            u[xi:xi + len(xx), yi:yi + len(yy), :] = val
    return u


def extract_geometry(
    bound_min, bound_max, resolution: int, threshold: float, query_fn: Callable,
) -> Tuple[np.ndarray, np.ndarray]:
    """Field -> mesh with world-space vertices
    (`model/extract_geometry.py:21-29`)."""
    u = extract_fields(bound_min, bound_max, resolution, query_fn)
    verts, tris = marching_tetrahedra(u, threshold)
    b_min = np.asarray(bound_min, np.float32)
    b_max = np.asarray(bound_max, np.float32)
    verts = verts / (resolution - 1.0) * (b_max - b_min)[None] + b_min[None]
    return verts, tris


def write_ply(
    path: str, verts: np.ndarray, tris: np.ndarray,
    vertex_colors: Optional[np.ndarray] = None,
) -> None:
    """Binary little-endian PLY export (trimesh-free)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {len(verts)}",
                  "property float x", "property float y", "property float z"]
        if vertex_colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += [f"element face {len(tris)}",
                   "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if vertex_colors is None:
            f.write(np.ascontiguousarray(verts, "<f4").tobytes())
        else:
            vc = np.ascontiguousarray(vertex_colors, np.uint8)
            for v, c in zip(np.asarray(verts, "<f4"), vc):
                f.write(v.tobytes() + c.tobytes())
        tri32 = np.ascontiguousarray(tris, "<i4")
        counts = np.full((len(tris), 1), 3, np.uint8)
        for i in range(len(tri32)):
            f.write(counts[i].tobytes() + tri32[i].tobytes())


def read_ply(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal binary-PLY reader (for tests / chamfer eval)."""
    with open(path, "rb") as f:
        n_verts = n_tris = 0
        props = 0
        line = f.readline().strip()
        while line != b"end_header":
            if line.startswith(b"element vertex"):
                n_verts = int(line.split()[-1])
            elif line.startswith(b"element face"):
                n_tris = int(line.split()[-1])
            elif line.startswith(b"property uchar red"):
                props = 3
            line = f.readline().strip()
        verts = np.empty((n_verts, 3), np.float32)
        for i in range(n_verts):
            verts[i] = struct.unpack("<3f", f.read(12))
            if props:
                f.read(3)
        tris = np.empty((n_tris, 3), np.int64)
        for i in range(n_tris):
            (cnt,) = struct.unpack("<B", f.read(1))
            tris[i] = struct.unpack(f"<{cnt}i", f.read(4 * cnt))
    return verts, tris
