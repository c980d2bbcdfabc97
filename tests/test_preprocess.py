"""Camera normalization: cameras_sphere.npz written by the preprocess
step round-trips through the DTU loader's decomposition."""
import numpy as np

from fgs_nerf_tpu.data.dtu import load_K_Rt_from_P
from fgs_nerf_tpu.data.preprocess import (
    nearest_point_to_rays, normalize_cameras, write_cameras_sphere,
)


def ring_cameras(n=8, radius=4.0, center=np.array([0.3, -0.2, 0.1])):
    ks, rts = [], []
    k = np.array([[400.0, 0, 200], [0, 400.0, 150], [0, 0, 1]], np.float32)
    for th in np.linspace(0, 2 * np.pi, n, endpoint=False):
        c = center + radius * np.array([np.cos(th), np.sin(th), 0.2])
        fwd = (center - c)
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        r_c2w = np.stack([right, down, fwd], 1)  # columns
        r = r_c2w.T
        t = -r @ c
        ks.append(k)
        rts.append(np.concatenate([r, t[:, None]], 1).astype(np.float32))
    return ks, rts, center


def test_nearest_point_to_rays():
    origins = np.array([[1.0, 0, 0], [0, 1.0, 0], [-1.0, 0, 0]])
    dirs = np.array([[-1.0, 0, 0], [0, -1.0, 0], [1.0, 0, 0]])
    p = nearest_point_to_rays(origins, dirs)
    np.testing.assert_allclose(p, [0, 0, 0], atol=1e-6)


def test_normalize_recovers_center():
    ks, rts, center = ring_cameras()
    cams = normalize_cameras(ks, rts)
    sm = cams["scale_mat_0"]
    np.testing.assert_allclose(sm[:3, 3], center, atol=0.05)
    assert sm[0, 0] > 0


def test_cameras_sphere_roundtrip(tmp_path):
    ks, rts, center = ring_cameras()
    path = write_cameras_sphere(str(tmp_path), ks, rts)
    z = np.load(path)
    # the DTU loader decomposes P = world_mat @ scale_mat back into K, pose
    p = (z["world_mat_0"] @ z["scale_mat_0"])[:3, :4]
    intr, pose = load_K_Rt_from_P(p)
    # world scaling lands in the extrinsics; K is unchanged
    np.testing.assert_allclose(intr[0, 0], 400.0, rtol=1e-3)
    # normalized camera centers sit near radius 3 (radius_scale default)
    assert 2.0 < np.linalg.norm(pose[:3, 3]) < 4.0
