"""Fused channel-major MLP: value + gradient parity.

The interpret-mode runs drive the actual Mosaic kernel bodies on CPU
(fwd pipeline, bwd recompute + scratch dW accumulation + last-block
flush); the custom-VJP wrapper is additionally checked against plain
autodiff through the reference.
"""
import numpy as np
import jax
import jax.numpy as jnp

from fgs_nerf_tpu.ops.pallas.fused_mlp_cm import (
    fused_mlp_cm,
    fused_mlp_cm_bwd_pallas,
    fused_mlp_cm_fwd_pallas,
    fused_mlp_cm_reference,
)

BS = 256


def _setup(rng, m=4 * BS, rows=(12, 33, 33, 3, 9), dims=(90, 64, 64, 3)):
    blocks = tuple(
        jnp.asarray(rng.normal(size=(r, m)).astype(np.float32) * 0.5)
        for r in rows
    )
    assert sum(rows) == dims[0]
    weights = [
        jnp.asarray(rng.normal(size=(i, o)).astype(np.float32)
                    / np.sqrt(i))
        for i, o in zip(dims[:-1], dims[1:])
    ]
    biases = [
        jnp.asarray(rng.normal(size=(o,)).astype(np.float32) * 0.1)
        for o in dims[1:]
    ]
    return blocks, weights, biases


def test_fwd_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    blocks, weights, biases = _setup(rng)
    got = fused_mlp_cm_fwd_pallas(
        blocks, weights, biases, tuple(b.shape[0] for b in blocks),
        bs=BS, interpret=True,
    )
    want = fused_mlp_cm_reference(blocks, weights, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bwd_kernel_matches_autodiff_interpret():
    rng = np.random.default_rng(1)
    blocks, weights, biases = _setup(rng)
    g = jnp.asarray(rng.normal(size=(3, blocks[0].shape[1]))
                    .astype(np.float32))

    dx_pad, dws, dbs = fused_mlp_cm_bwd_pallas(
        blocks, weights, biases, g,
        tuple(b.shape[0] for b in blocks), bs=BS, interpret=True,
    )
    # autodiff through the (value-identical) reference
    _, vjp = jax.vjp(
        lambda bl, w, b_: fused_mlp_cm_reference(bl, w, b_),
        blocks, weights, biases,
    )
    dblocks_ref, dws_ref, dbs_ref = vjp(g)
    from fgs_nerf_tpu.ops.pallas.fused_mlp_cm import pad_plan

    offs, _ = pad_plan(tuple(b.shape[0] for b in blocks))
    for blk, o, dref in zip(blocks, offs, dblocks_ref):
        r = blk.shape[0]
        got = np.asarray(dx_pad)[o:o + r]
        # bf16 dz/h operands in the kernel's dx dot vs the reference
        # autodiff's mixed-precision transpose: bf16-scale tolerance
        np.testing.assert_allclose(got, np.asarray(dref),
                                   rtol=2e-2, atol=2e-2)
    for dw, dw_ref in zip(dws, dws_ref):
        scale = max(float(np.abs(np.asarray(dw_ref)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(dw) / scale, np.asarray(dw_ref) / scale,
            rtol=2e-2, atol=2e-2,
        )
    for db, db_ref in zip(dbs, dbs_ref):
        scale = max(float(np.abs(np.asarray(db_ref)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(db) / scale, np.asarray(db_ref) / scale,
            rtol=2e-2, atol=2e-2,
        )


def test_custom_vjp_wrapper_cpu_path():
    """On CPU the wrapper routes to the reference + autodiff; its
    gradients must equal direct autodiff (exactly — same graph)."""
    rng = np.random.default_rng(2)
    blocks, weights, biases = _setup(rng, m=BS)
    ct = jnp.asarray(rng.normal(size=(3, BS)).astype(np.float32))

    def f_wrapped(bl, w, b_):
        return jnp.sum(fused_mlp_cm(bl, w, b_, BS) * ct)

    def f_direct(bl, w, b_):
        return jnp.sum(fused_mlp_cm_reference(bl, w, b_) * ct)

    g1 = jax.grad(f_wrapped, argnums=(0, 1, 2))(blocks, weights, biases)
    g2 = jax.grad(f_direct, argnums=(0, 1, 2))(blocks, weights, biases)
    for t1, t2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                                   rtol=1e-6, atol=1e-6)


def test_reference_matches_plain_mlp_bf16():
    """The padded/aligned reference equals the plain bf16 layer loop
    (zero pad rows change nothing)."""
    from fgs_nerf_tpu.models.sdf_voxel import _mlp_apply_cm

    rng = np.random.default_rng(3)
    blocks, weights, biases = _setup(rng, m=BS)
    mlp_params = {}
    for i, (w, b_) in enumerate(zip(weights, biases)):
        mlp_params[f"w{i}"] = w
        mlp_params[f"b{i}"] = b_
    want = _mlp_apply_cm(mlp_params, list(blocks), bf16=True)
    got = fused_mlp_cm_reference(blocks, weights, biases)
    # the fused path adds hidden biases in f32 (the plain path rounds
    # them to bf16 first) — bf16-scale agreement
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=1e-2)


def test_fused_shade_fwd_kernel_interpret():
    """The fully fused shading head (encodings in kernel) vs its
    reference, fwd values exact."""
    from fgs_nerf_tpu.ops.pallas.fused_mlp_cm import (
        _shade_layout, fused_shade_cm_fwd_pallas, fused_shade_cm_reference,
    )

    rng = np.random.default_rng(4)
    m = 2 * BS
    pos_pe, ref_pe, view_pe = 3, 2, 1
    k0 = jnp.asarray(rng.normal(size=(6, m)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(size=(3, m)).astype(np.float32))
    refl = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))
    normal = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))
    rows = _shade_layout(6, pos_pe, ref_pe, view_pe, True)
    cin = sum(rows)
    dims = (cin, 32, 32, 3)
    weights = [
        jnp.asarray(rng.normal(size=(i, o)).astype(np.float32) / np.sqrt(i))
        for i, o in zip(dims[:-1], dims[1:])
    ]
    biases = [jnp.asarray(rng.normal(size=(o,)).astype(np.float32) * 0.1)
              for o in dims[1:]]
    got = fused_shade_cm_fwd_pallas(
        k0, xyz, refl, normal, vd, weights, biases,
        pos_pe, ref_pe, view_pe, bs=BS, interpret=True,
    )
    want = fused_shade_cm_reference(
        k0, xyz, refl, normal, vd, weights, biases, pos_pe, ref_pe, view_pe
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_shade_bwd_kernel_interpret():
    """Backward kernel (incl. in-kernel encoding cotangent contraction)
    vs autodiff through the reference."""
    from fgs_nerf_tpu.ops.pallas.fused_mlp_cm import (
        _shade_layout, fused_shade_cm_bwd_pallas, fused_shade_cm_reference,
    )

    rng = np.random.default_rng(5)
    m = 2 * BS
    pos_pe, ref_pe, view_pe = 3, 2, 1
    k0 = jnp.asarray(rng.normal(size=(6, m)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(size=(3, m)).astype(np.float32))
    refl = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))
    normal = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))
    rows = _shade_layout(6, pos_pe, ref_pe, view_pe, True)
    cin = sum(rows)
    dims = (cin, 32, 32, 3)
    weights = [
        jnp.asarray(rng.normal(size=(i, o)).astype(np.float32) / np.sqrt(i))
        for i, o in zip(dims[:-1], dims[1:])
    ]
    biases = [jnp.asarray(rng.normal(size=(o,)).astype(np.float32) * 0.1)
              for o in dims[1:]]
    g = jnp.asarray(rng.normal(size=(3, m)).astype(np.float32))

    d_ins, dws, dbs = fused_shade_cm_bwd_pallas(
        k0, xyz, refl, normal, vd, weights, biases, g,
        pos_pe, ref_pe, view_pe, bs=BS, interpret=True,
    )
    _, vjp = jax.vjp(
        lambda a, b_, c_, d_, e_, w, bi: fused_shade_cm_reference(
            a, b_, c_, d_, e_, w, bi, pos_pe, ref_pe, view_pe
        ),
        k0, xyz, refl, normal, vd, weights, biases,
    )
    refs = vjp(g)
    for got, want, name in zip(
        d_ins, refs[:5], ("k0", "xyz", "refl", "normal", "vd")
    ):
        scale = max(float(np.abs(np.asarray(want)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(want) / scale,
            rtol=2e-2, atol=2e-2, err_msg=name,
        )
    for dw, dw_ref in zip(dws, refs[5]):
        scale = max(float(np.abs(np.asarray(dw_ref)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(dw) / scale, np.asarray(dw_ref) / scale,
            rtol=2e-2, atol=2e-2,
        )
    for db, db_ref in zip(dbs, refs[6]):
        scale = max(float(np.abs(np.asarray(db_ref)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(db) / scale, np.asarray(db_ref) / scale,
            rtol=2e-2, atol=2e-2,
        )
