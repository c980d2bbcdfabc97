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
