"""Golden-render regression (VERDICT round-1 item 5): re-render the
committed parameters and compare pixel-for-pixel against the committed
image.  Any renderer-semantics change (sampling, alpha, scan,
compaction, shading, compositing) turns this red; regenerate the
fixture deliberately with ``scripts/make_golden.py``."""
import os

import numpy as np
import jax.numpy as jnp

from fgs_nerf_tpu.eval.render import make_render_fn, render_image
from scripts_path import add_scripts_path  # noqa: F401  (see helper below)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_render.npz")


def load_fixture():
    z = np.load(GOLDEN)
    params = {
        k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("p_")
    }
    params["refnet"] = {
        k[len("refnet_"):]: jnp.asarray(z[k])
        for k in z.files
        if k.startswith("refnet_")
    }
    return z, params


def test_golden_render_matches():
    from scripts.make_golden import CONV, H, W, golden_cfg

    z, params = load_fixture()
    cfg, box = golden_cfg()
    rc = make_render_fn(cfg, box, near=float(z["near"]), bg=1.0)
    out = render_image(
        rc, params, {}, H, W, z["k"], z["pose"], CONV, jnp.asarray(0.2),
        chunk=1024,
    )
    rgb = np.asarray(out["rgb_marched"])
    ref = z["rgb"]
    # fp-reassociation headroom only; a real semantics change moves
    # pixels by orders of magnitude more
    assert np.max(np.abs(rgb - ref)) < 2e-3, np.max(np.abs(rgb - ref))
    assert np.mean(np.abs(rgb - ref)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(out["depth"]), z["depth"], atol=5e-3
    )


def _load_stage_fixture(name):
    z = np.load(os.path.join(os.path.dirname(__file__), "golden", name))
    params = {}
    for k in z.files:
        if k.startswith("p__"):
            params[k[3:]] = jnp.asarray(z[k])
        elif "__" in k and not k.startswith("p__"):
            head, leaf = k.split("__", 1)
            params.setdefault(head, {})[leaf] = jnp.asarray(z[k])
    return z, params


def test_golden_fine_render_matches():
    """Fine-stage renderer semantics pin (VERDICT r2 missing #5):
    hierarchical taps, rgbnet->refnet shading, single-scan weight cut."""
    from scripts.make_golden_stages import CONV, H, W, fine_cfg

    z, params = _load_stage_fixture("golden_fine.npz")
    cfg, box = fine_cfg()
    rc = make_render_fn(cfg, box, near=float(z["near"]), bg=1.0)
    out = render_image(
        rc, params, {}, H, W, z["k"], z["pose"], CONV, jnp.asarray(0.2),
        chunk=1024,
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb_marched"]), z["rgb"], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), z["depth"], rtol=2e-4, atol=2e-4
    )


def test_golden_dvgo_mask_and_render_match():
    """DVGO density-stage semantics + the alpha-based sdf_mask handoff
    artifact the coarse stage consumes."""
    from fgs_nerf_tpu.core.box import SceneBox
    from fgs_nerf_tpu.models import density_voxel as D
    from scripts.make_golden_stages import dvgo_cfg

    z, params = _load_stage_fixture("golden_dvgo.npz")
    cfg, box = dvgo_cfg()
    mask = D.build_sdf_mask(params, cfg, thres=1e-3)
    np.testing.assert_allclose(np.asarray(mask), z["sdf_mask"], atol=0)
    out = D.forward(
        params, {}, cfg, box, jnp.asarray(z["rays_o"]),
        jnp.asarray(z["rays_d"]), jnp.asarray(z["viewdirs"]),
        near=float(z["near"]), bg=1.0,
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb_marched"]), z["rgb"], rtol=2e-5, atol=2e-5
    )
