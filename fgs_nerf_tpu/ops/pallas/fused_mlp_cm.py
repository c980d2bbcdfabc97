"""Pallas TPU kernel: fused channel-major shading MLP (fwd + bwd).

Why: at the coarse bench's 2.36M-sample stream, XLA's layer-by-layer
MLP is HBM-bound on its hidden activations — each [W, M] bf16 hidden
is ~0.9 GB of write+read traffic, and with the input concat and its
activation stash the 3-layer refnet costs ~20 ms/step against ~2 ms of
MXU flops (round-4 trace, PROFILE_r04.md).  This kernel runs the whole
MLP per sample block with every intermediate in VMEM:

* the forward reads the feature ROW BLOCKS directly (no [Cin, M]
  concat in HBM — the concat happens in VMEM at 8-ALIGNED sublane
  offsets, with matching zero rows in the padded weights), and writes
  only the [d_out, M] output;
* the backward recomputes the hiddens from the same feature blocks
  (flops are nearly free), accumulates dW/db in VMEM scratch across
  grid steps (flushed once at the last block), and writes the padded
  [Cin8, M] input cotangent for the upstream encodings.

Weights are passed pre-transposed ([out, in]) so the forward dots are
MXU-native ``A[m, k] @ B[k, n]``; the dW dots contract over the sample
(lane) axis and the dx dots over the out (sublane) axis — both lower
with small in-VMEM operand moves at block sizes.

The role in the reference is the refnet/rgbnet Linear stacks
(`/root/reference/model/nerf.py:125-144`, applied at `nerf.py:884,
1009`); the fusion itself is the TPU answer to the CUDA
fully-fused-MLP pattern.  bf16 matmuls with fp32 accumulation — the
same numerics as ``models.mlp.mlp_apply(bf16=True)`` up to dot order.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad8(r: int) -> int:
    return (r + 7) // 8 * 8


def pad_plan(block_rows: Sequence[int]):
    """(aligned offsets, padded total rows) for the VMEM concat."""
    offs = []
    o = 0
    for r in block_rows:
        offs.append(o)
        o += _pad8(r)
    return tuple(offs), o


def _build_x(f_refs, block_rows, cin8, bs):
    """The in-VMEM aligned concat: [Cin8, bs] bf16, zero pad rows.

    Built as a value-level concatenate of zero-padded blocks — Mosaic
    has no dynamic_update_slice lowering for values."""
    parts = []
    for fr, r in zip(f_refs, block_rows):
        v = fr[:].astype(jnp.bfloat16)
        pad = _pad8(r) - r
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros((pad, bs), jnp.bfloat16)], axis=0
            )
        parts.append(v)
    return jnp.concatenate(parts, axis=0)


def _fwd_pass(x, wt_refs, b_refs):
    """Shared forward: (zs, hs) — pre-relu activations and the input of
    each layer (hs[li] feeds layer li)."""
    n_layers = len(wt_refs)
    zs, hs = [], [x]
    h = x
    for li in range(n_layers):
        z = jax.lax.dot_general(
            wt_refs[li][:].astype(jnp.bfloat16), h,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_refs[li][:]
        zs.append(z)
        if li < n_layers - 1:
            h = jax.nn.relu(z).astype(jnp.bfloat16)
            hs.append(h)
    return zs, hs


def _make_fwd_kernel(block_rows, n_layers):
    n_blocks = len(block_rows)

    def kernel(*refs):
        f_refs = refs[:n_blocks]
        wt_refs = refs[n_blocks:n_blocks + n_layers]
        b_refs = refs[n_blocks + n_layers:n_blocks + 2 * n_layers]
        out_ref = refs[-1]
        bs = f_refs[0].shape[-1]
        cin8 = wt_refs[0].shape[1]
        x = _build_x(f_refs, block_rows, cin8, bs)
        zs, _ = _fwd_pass(x, wt_refs, b_refs)
        out_ref[:] = zs[-1]

    return kernel


def _make_bwd_kernel(block_rows, n_layers):
    n_blocks = len(block_rows)

    def kernel(*refs):
        i = 0
        f_refs = refs[i:i + n_blocks]; i += n_blocks
        wt_refs = refs[i:i + n_layers]; i += n_layers
        b_refs = refs[i:i + n_layers]; i += n_layers
        g_ref = refs[i]; i += 1
        dx_ref = refs[i]; i += 1
        dwt_outs = refs[i:i + n_layers]; i += n_layers
        db_outs = refs[i:i + n_layers]; i += n_layers
        scr = refs[i:]
        dw_accs = scr[:n_layers]
        db_accs = scr[n_layers:2 * n_layers]
        sem = scr[2 * n_layers]

        b = pl.program_id(0)
        nb = pl.num_programs(0)
        bs = f_refs[0].shape[-1]
        cin8 = wt_refs[0].shape[1]

        @pl.when(b == 0)
        def _():
            for a in dw_accs:
                a[:] = jnp.zeros_like(a)
            for a in db_accs:
                a[:] = jnp.zeros_like(a)

        x = _build_x(f_refs, block_rows, cin8, bs)
        zs, hs = _fwd_pass(x, wt_refs, b_refs)

        dh = g_ref[:]  # [out8, bs] f32 (pad rows carry zero cotangent)
        for li in range(n_layers - 1, -1, -1):
            dz = dh if li == n_layers - 1 else dh * (zs[li] > 0)
            dz16 = dz.astype(jnp.bfloat16)
            # dWt[li] [out, in] += dz @ h_in^T (contract the sample axis)
            dw_accs[li][:, :] += jax.lax.dot_general(
                dz16, hs[li], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_accs[li][:, :] += jnp.sum(dz, axis=1, keepdims=True)
            # dh_in [in, bs] = Wt[li]^T @ dz (contract the out axis)
            d_in = jax.lax.dot_general(
                wt_refs[li][:].astype(jnp.bfloat16), dz16,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if li > 0:
                dh = d_in
            else:
                dx_ref[:] = d_in

        @pl.when(b == nb - 1)
        def _():
            for li in range(n_layers):
                dma = pltpu.make_async_copy(dw_accs[li], dwt_outs[li], sem)
                dma.start()
                dma.wait()
                dma2 = pltpu.make_async_copy(db_accs[li], db_outs[li], sem)
                dma2.start()
                dma2.wait()

    return kernel


def _pad_weights(weights, biases, block_rows):
    """[in, out] weight list -> transposed padded list.

    wt0 is [out, Cin8] with zero columns at the aligned-concat pad rows;
    the LAST layer is row-padded to an 8-multiple out dim (zero rows +
    zero bias -> zero outputs, sliced off by the wrappers).  Hidden
    widths must already be 8-multiples (asserted by the caller).
    """
    offs, cin8 = pad_plan(block_rows)
    w0 = weights[0]
    out_dim = w0.shape[1]
    w0_pad = jnp.zeros((cin8, out_dim), w0.dtype)
    o_src = 0
    for r, o in zip(block_rows, offs):
        w0_pad = jax.lax.dynamic_update_slice(
            w0_pad, jax.lax.slice(w0, (o_src, 0), (o_src + r, out_dim)),
            (o, 0),
        )
        o_src += r
    wts = [w0_pad.T] + [w.T for w in weights[1:]]
    bcols = [b_[:, None] for b_ in biases]
    d_out = weights[-1].shape[1]
    pad_out = _pad8(d_out) - d_out
    if pad_out:
        wts[-1] = jnp.pad(wts[-1], ((0, pad_out), (0, 0)))
        bcols[-1] = jnp.pad(bcols[-1], ((0, pad_out), (0, 0)))
    return wts, bcols


def _unpad_dw(dwts, dbs, weights, block_rows):
    """Kernel dW/db (padded, transposed) -> gradients shaped like the
    original [in, out] weights and [out] biases."""
    offs, _ = pad_plan(block_rows)
    d_out = weights[-1].shape[1]
    dws = []
    for li, w in enumerate(weights):
        dwt = dwts[li]
        if li == len(weights) - 1:
            dwt = dwt[:d_out]
        dw = dwt.T  # [in(_pad for layer 0), out]
        if li == 0:
            parts = []
            for r, o in zip(block_rows, offs):
                parts.append(jax.lax.slice(dw, (o, 0), (o + r, dw.shape[1])))
            dw = jnp.concatenate(parts, axis=0)
        dws.append(dw)
    dbs = [
        (db[:d_out] if li == len(weights) - 1 else db)
        for li, db in enumerate(dbs)
    ]
    return dws, dbs


@functools.partial(
    jax.jit, static_argnames=("block_rows", "bs", "interpret")
)
def fused_mlp_cm_fwd_pallas(blocks, weights, biases, block_rows,
                            bs=1024, interpret=False):
    m = blocks[0].shape[-1]
    assert m % bs == 0
    nb = m // bs
    wts, bcols = _pad_weights(weights, biases, block_rows)
    n_layers = len(weights)
    d_out = weights[-1].shape[1]
    in_specs = (
        [pl.BlockSpec((r, bs), lambda b: (0, b)) for r in block_rows]
        + [pl.BlockSpec(w.shape, lambda b: (0, 0)) for w in wts]
        + [pl.BlockSpec(b_.shape, lambda b: (0, 0)) for b_ in bcols]
    )
    out = pl.pallas_call(
        _make_fwd_kernel(block_rows, n_layers),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_pad8(d_out), bs), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((_pad8(d_out), m), jnp.float32),
        interpret=interpret,
    )(*blocks, *wts, *bcols)
    return out[:d_out]


@functools.partial(
    jax.jit, static_argnames=("block_rows", "bs", "interpret")
)
def fused_mlp_cm_bwd_pallas(blocks, weights, biases, g, block_rows,
                            bs=1024, interpret=False):
    """Returns (dx_pad [Cin8, M] f32, dw list like weights, db list)."""
    m = blocks[0].shape[-1]
    assert m % bs == 0
    nb = m // bs
    wts, bcols = _pad_weights(weights, biases, block_rows)
    n_layers = len(weights)
    d_out = weights[-1].shape[1]
    offs, cin8 = pad_plan(block_rows)
    gp = g
    if g.shape[0] != _pad8(d_out):
        gp = jnp.pad(g, ((0, _pad8(d_out) - g.shape[0]), (0, 0)))
    in_specs = (
        [pl.BlockSpec((r, bs), lambda b: (0, b)) for r in block_rows]
        + [pl.BlockSpec(w.shape, lambda b: (0, 0)) for w in wts]
        + [pl.BlockSpec(b_.shape, lambda b: (0, 0)) for b_ in bcols]
        + [pl.BlockSpec((_pad8(d_out), bs), lambda b: (0, b))]
    )
    out_specs = (
        [pl.BlockSpec((cin8, bs), lambda b: (0, b))]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(2 * n_layers)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((cin8, m), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts]
        + [jax.ShapeDtypeStruct(b_.shape, jnp.float32) for b_ in bcols]
    )
    scratch = (
        [pltpu.VMEM(w.shape, jnp.float32) for w in wts]
        + [pltpu.VMEM(b_.shape, jnp.float32) for b_ in bcols]
        + [pltpu.SemaphoreType.DMA]
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(block_rows, n_layers),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*blocks, *wts, *bcols, gp)
    dx_pad = outs[0]
    dwts = list(outs[1:1 + n_layers])
    dbs = [d[:, 0] for d in outs[1 + n_layers:]]
    dws, dbs = _unpad_dw(dwts, dbs, weights, block_rows)
    return dx_pad, dws, dbs


def fused_mlp_cm_reference(blocks, weights, biases):
    """Pure-XLA value model of the kernel (same bf16 casts + aligned
    zero padding): used by CPU tests and the interpret-parity suite."""
    block_rows = tuple(b.shape[0] for b in blocks)
    offs, cin8 = pad_plan(block_rows)
    m = blocks[0].shape[-1]
    x = jnp.zeros((cin8, m), jnp.bfloat16)
    for blk, o in zip(blocks, offs):
        x = jax.lax.dynamic_update_slice(x, blk.astype(jnp.bfloat16), (o, 0))
    wts, bcols = _pad_weights(weights, biases, block_rows)
    d_out = weights[-1].shape[1]
    h = x
    n_layers = len(weights)
    for li in range(n_layers):
        z = jax.lax.dot_general(
            wts[li].astype(jnp.bfloat16), h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bcols[li]
        h = z if li == n_layers - 1 else jax.nn.relu(z).astype(jnp.bfloat16)
    return h[:d_out]


# ---------------------------------------------------------------------------
# custom-VJP entry point used by the model
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mlp_cm(blocks, weights, biases, bs=1024):
    """bf16 MLP over channel-major feature row blocks -> [d_out, M] f32.

    blocks: tuple of [r_i, M] f32 arrays; weights: list of [in, out]
    (in of layer 0 = sum r_i); biases: list of [out].  M must be a
    multiple of ``bs``; hidden widths must be multiples of 8.
    """
    return _fused_fwd_impl(blocks, weights, biases, bs)


def _use_kernel() -> bool:
    from fgs_nerf_tpu.ops.scatter import _use_pallas_combine

    return _use_pallas_combine()


def _fused_fwd_impl(blocks, weights, biases, bs):
    block_rows = tuple(b.shape[0] for b in blocks)
    if _use_kernel():
        return fused_mlp_cm_fwd_pallas(
            tuple(blocks), list(weights), list(biases), block_rows, bs=bs
        )
    return fused_mlp_cm_reference(blocks, weights, biases)


def _fused_fwd(blocks, weights, biases, bs):
    out = _fused_fwd_impl(blocks, weights, biases, bs)
    return out, (tuple(blocks), list(weights), list(biases))


def _fused_bwd(bs, res, g):
    blocks, weights, biases = res
    block_rows = tuple(b.shape[0] for b in blocks)
    offs, cin8 = pad_plan(block_rows)
    if _use_kernel():
        dx_pad, dws, dbs = fused_mlp_cm_bwd_pallas(
            blocks, weights, biases, g, block_rows, bs=bs
        )
    else:
        # CPU fallback: autodiff through the reference
        _, vjp = jax.vjp(
            lambda bl, w, b_: fused_mlp_cm_reference(bl, w, b_),
            blocks, weights, biases,
        )
        dblocks, dws, dbs = vjp(g)
        return dblocks, dws, dbs
    dblocks = tuple(
        jax.lax.slice(dx_pad, (o, 0), (o + r, dx_pad.shape[1]))
        for r, o in zip(block_rows, offs)
    )
    return dblocks, dws, dbs


fused_mlp_cm.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Fully fused shading head: sincos encodings computed IN KERNEL
# ---------------------------------------------------------------------------
#
# The coarse refnet's input is [k0 | xyz_emb | reflect_emb | normal |
# vd_emb] where each _emb is [v, sin(v f), cos(v f)].  Feeding the MLP
# kernel the ENCODED blocks still moves ~850 MB of encoded features
# (and their cotangents) through HBM per pass; feeding the RAW vectors
# (24 rows instead of 90) and encoding on the VPU inside the kernel
# cuts the stream traffic ~4x and removes the encode concats + cosine
# fusions from the XLA graph (~7 ms/step at the bench).  The backward
# recomputes the encodings and contracts the sin/cos cotangents back to
# the raw vectors in VMEM.

def _shade_layout(k0_dim, pos_pe, ref_pe, view_pe, use_viewdir):
    """Unpadded row sizes of the w0 concat, in reference order
    (`model/nerf.py:993-1009`): k0 | xyz, sin, cos | refl, sin, cos |
    normal | [vd, sin, cos]."""
    rows = [k0_dim, 3, 3 * pos_pe, 3 * pos_pe, 3, 3 * ref_pe, 3 * ref_pe, 3]
    if use_viewdir:
        rows += [3, 3 * view_pe, 3 * view_pe]
    return tuple(rows)


def _enc_sub(v, pe, bs):
    """[3, bs] f32 -> (identity, sin, cos) value blocks ([3], [3pe],
    [3pe]) in component-major frequency order (torch flatten(-2)).

    Frequencies are python literals (a captured jnp constant array is
    rejected by pallas_call)."""
    xf = jnp.stack([v * (2.0**i) for i in range(pe)], axis=1)  # [3, pe, bs]
    xf = xf.reshape(3 * pe, bs)
    return v, jnp.sin(xf), jnp.cos(xf)


def _build_shade_x(k0, xyz, refl, normal, vd, pos_pe, ref_pe, view_pe,
                   use_viewdir, bs):
    """The padded in-VMEM feature build from RAW inputs -> [Cin8, bs]
    bf16 + the pre-activation sub-values needed by the backward."""
    subs = [k0]
    subs += list(_enc_sub(xyz, pos_pe, bs))
    subs += list(_enc_sub(refl, ref_pe, bs))
    subs.append(normal)
    if use_viewdir:
        subs += list(_enc_sub(vd, view_pe, bs))
    parts = []
    for v in subs:
        v16 = v.astype(jnp.bfloat16)
        pad = _pad8(v.shape[0]) - v.shape[0]
        if pad:
            v16 = jnp.concatenate(
                [v16, jnp.zeros((pad, bs), jnp.bfloat16)], axis=0
            )
        parts.append(v16)
    return jnp.concatenate(parts, axis=0)


def _enc_bwd(v, pe, d_id, d_sin, d_cos, bs):
    """Cotangent of a sincos sub-block back to the raw [3, bs] vector
    (python-literal frequencies, see _enc_sub)."""
    ds = d_sin.reshape(3, pe, bs)
    dc = d_cos.reshape(3, pe, bs)
    out = d_id
    for i in range(pe):
        f = 2.0**i
        xf = v * f
        out = out + f * (jnp.cos(xf) * ds[:, i] - jnp.sin(xf) * dc[:, i])
    return out


def _make_shade_fwd_kernel(k0_dim, pos_pe, ref_pe, view_pe, use_viewdir,
                           n_layers):
    n_in = 5 if use_viewdir else 4

    def kernel(*refs):
        ins = refs[:n_in]
        wt_refs = refs[n_in:n_in + n_layers]
        b_refs = refs[n_in + n_layers:n_in + 2 * n_layers]
        out_ref = refs[-1]
        bs = ins[0].shape[-1]
        vd = ins[4][:] if use_viewdir else None
        x = _build_shade_x(
            ins[0][:], ins[1][:], ins[2][:], ins[3][:], vd,
            pos_pe, ref_pe, view_pe, use_viewdir, bs,
        )
        zs, _ = _fwd_pass(x, wt_refs, b_refs)
        out_ref[:] = zs[-1]

    return kernel


def _make_shade_bwd_kernel(k0_dim, pos_pe, ref_pe, view_pe, use_viewdir,
                           n_layers):
    n_in = 5 if use_viewdir else 4
    rows = _shade_layout(k0_dim, pos_pe, ref_pe, view_pe, use_viewdir)
    offs, cin8 = pad_plan(rows)

    def kernel(*refs):
        i = 0
        ins = refs[i:i + n_in]; i += n_in
        wt_refs = refs[i:i + n_layers]; i += n_layers
        b_refs = refs[i:i + n_layers]; i += n_layers
        g_ref = refs[i]; i += 1
        d_outs = refs[i:i + n_in]; i += n_in
        dwt_outs = refs[i:i + n_layers]; i += n_layers
        db_outs = refs[i:i + n_layers]; i += n_layers
        scr = refs[i:]
        dw_accs = scr[:n_layers]
        db_accs = scr[n_layers:2 * n_layers]
        sem = scr[2 * n_layers]

        b = pl.program_id(0)
        nb = pl.num_programs(0)
        bs = ins[0].shape[-1]

        @pl.when(b == 0)
        def _():
            for a in dw_accs:
                a[:] = jnp.zeros_like(a)
            for a in db_accs:
                a[:] = jnp.zeros_like(a)

        k0 = ins[0][:]
        xyz = ins[1][:]
        refl = ins[2][:]
        normal = ins[3][:]
        vd = ins[4][:] if use_viewdir else None
        x = _build_shade_x(k0, xyz, refl, normal, vd,
                           pos_pe, ref_pe, view_pe, use_viewdir, bs)
        zs, hs = _fwd_pass(x, wt_refs, b_refs)

        dh = g_ref[:]
        for li in range(n_layers - 1, -1, -1):
            dz = dh if li == n_layers - 1 else dh * (zs[li] > 0)
            dz16 = dz.astype(jnp.bfloat16)
            dw_accs[li][:, :] += jax.lax.dot_general(
                dz16, hs[li], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_accs[li][:, :] += jnp.sum(dz, axis=1, keepdims=True)
            dh = jax.lax.dot_general(
                wt_refs[li][:].astype(jnp.bfloat16), dz16,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dx = dh  # [Cin8, bs] f32, padded layout

        def sub(j):
            return jax.lax.slice(dx, (offs[j], 0), (offs[j] + rows[j], bs))

        d_outs[0][:] = sub(0)  # k0
        d_outs[1][:] = _enc_bwd(xyz, pos_pe, sub(1), sub(2), sub(3), bs)
        d_outs[2][:] = _enc_bwd(refl, ref_pe, sub(4), sub(5), sub(6), bs)
        d_outs[3][:] = sub(7)  # normal
        if use_viewdir:
            d_outs[4][:] = _enc_bwd(vd, view_pe, sub(8), sub(9), sub(10), bs)

        @pl.when(b == nb - 1)
        def _():
            for li in range(n_layers):
                dma = pltpu.make_async_copy(dw_accs[li], dwt_outs[li], sem)
                dma.start()
                dma.wait()
                dma2 = pltpu.make_async_copy(db_accs[li], db_outs[li], sem)
                dma2.start()
                dma2.wait()

    return kernel


def fused_shade_cm_reference(k0, xyz, refl, normal, vd, weights, biases,
                             pos_pe, ref_pe, view_pe):
    """Pure-XLA value model (same bf16 casts + aligned padding)."""
    use_viewdir = vd is not None
    m = k0.shape[-1]
    x = _build_shade_x(k0, xyz, refl, normal, vd,
                       pos_pe, ref_pe, view_pe, use_viewdir, m)
    rows = _shade_layout(k0.shape[0], pos_pe, ref_pe, view_pe, use_viewdir)
    wts, bcols = _pad_weights(weights, biases, rows)
    d_out = weights[-1].shape[1]
    h = x
    n_layers = len(weights)
    for li in range(n_layers):
        z = jax.lax.dot_general(
            wts[li].astype(jnp.bfloat16), h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bcols[li]
        h = z if li == n_layers - 1 else jax.nn.relu(z).astype(jnp.bfloat16)
    return h[:d_out]


@functools.partial(
    jax.jit,
    static_argnames=("pos_pe", "ref_pe", "view_pe", "bs", "interpret"),
)
def fused_shade_cm_fwd_pallas(k0, xyz, refl, normal, vd, weights, biases,
                              pos_pe, ref_pe, view_pe, bs=1024,
                              interpret=False):
    use_viewdir = vd is not None
    m = k0.shape[-1]
    assert m % bs == 0
    nb = m // bs
    rows = _shade_layout(k0.shape[0], pos_pe, ref_pe, view_pe, use_viewdir)
    wts, bcols = _pad_weights(weights, biases, rows)
    n_layers = len(weights)
    d_out = weights[-1].shape[1]
    ins = [k0, xyz, refl, normal] + ([vd] if use_viewdir else [])
    in_specs = (
        [pl.BlockSpec((a.shape[0], bs), lambda b: (0, b)) for a in ins]
        + [pl.BlockSpec(w.shape, lambda b: (0, 0)) for w in wts]
        + [pl.BlockSpec(b_.shape, lambda b: (0, 0)) for b_ in bcols]
    )
    out = pl.pallas_call(
        _make_shade_fwd_kernel(k0.shape[0], pos_pe, ref_pe, view_pe,
                               use_viewdir, n_layers),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_pad8(d_out), bs), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((_pad8(d_out), m), jnp.float32),
        interpret=interpret,
    )(*ins, *wts, *bcols)
    return out[:d_out]


@functools.partial(
    jax.jit,
    static_argnames=("pos_pe", "ref_pe", "view_pe", "bs", "interpret"),
)
def fused_shade_cm_bwd_pallas(k0, xyz, refl, normal, vd, weights, biases,
                              g, pos_pe, ref_pe, view_pe, bs=1024,
                              interpret=False):
    use_viewdir = vd is not None
    m = k0.shape[-1]
    assert m % bs == 0
    nb = m // bs
    rows = _shade_layout(k0.shape[0], pos_pe, ref_pe, view_pe, use_viewdir)
    wts, bcols = _pad_weights(weights, biases, rows)
    n_layers = len(weights)
    d_out = weights[-1].shape[1]
    gp = g
    if g.shape[0] != _pad8(d_out):
        gp = jnp.pad(g, ((0, _pad8(d_out) - g.shape[0]), (0, 0)))
    ins = [k0, xyz, refl, normal] + ([vd] if use_viewdir else [])
    in_specs = (
        [pl.BlockSpec((a.shape[0], bs), lambda b: (0, b)) for a in ins]
        + [pl.BlockSpec(w.shape, lambda b: (0, 0)) for w in wts]
        + [pl.BlockSpec(b_.shape, lambda b: (0, 0)) for b_ in bcols]
        + [pl.BlockSpec((_pad8(d_out), bs), lambda b: (0, b))]
    )
    out_specs = (
        [pl.BlockSpec((a.shape[0], bs), lambda b: (0, b)) for a in ins]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(2 * n_layers)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in ins]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts]
        + [jax.ShapeDtypeStruct(b_.shape, jnp.float32) for b_ in bcols]
    )
    scratch = (
        [pltpu.VMEM(w.shape, jnp.float32) for w in wts]
        + [pltpu.VMEM(b_.shape, jnp.float32) for b_ in bcols]
        + [pltpu.SemaphoreType.DMA]
    )
    outs = pl.pallas_call(
        _make_shade_bwd_kernel(k0.shape[0], pos_pe, ref_pe, view_pe,
                               use_viewdir, n_layers),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*ins, *wts, *bcols, gp)
    n_in = len(ins)
    d_ins = list(outs[:n_in])
    dwts = list(outs[n_in:n_in + n_layers])
    dbs = [d[:, 0] for d in outs[n_in + n_layers:]]
    dws, dbs = _unpad_dw(dwts, dbs, weights, rows)
    return d_ins, dws, dbs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10)
)
def fused_shade_cm(k0, xyz, refl, normal, vd, weights, biases,
                   pos_pe, ref_pe, view_pe, bs=1024):
    """The whole coarse shading head (sincos encodings + refnet) from
    RAW channel-major inputs -> [3, M] pre-sigmoid logits.

    vd may be None (use_viewdir=False).  M must divide ``bs``; hidden
    widths must be 8-multiples.
    """
    return _shade_fwd_impl(k0, xyz, refl, normal, vd, weights, biases,
                           pos_pe, ref_pe, view_pe, bs)


def _shade_fwd_impl(k0, xyz, refl, normal, vd, weights, biases,
                    pos_pe, ref_pe, view_pe, bs):
    if _use_kernel():
        return fused_shade_cm_fwd_pallas(
            k0, xyz, refl, normal, vd, list(weights), list(biases),
            pos_pe, ref_pe, view_pe, bs=bs,
        )
    return fused_shade_cm_reference(
        k0, xyz, refl, normal, vd, weights, biases, pos_pe, ref_pe, view_pe
    )


def _shade_fwd(k0, xyz, refl, normal, vd, weights, biases,
               pos_pe, ref_pe, view_pe, bs):
    out = _shade_fwd_impl(k0, xyz, refl, normal, vd, weights, biases,
                          pos_pe, ref_pe, view_pe, bs)
    return out, (k0, xyz, refl, normal, vd, list(weights), list(biases))


def _shade_bwd(pos_pe, ref_pe, view_pe, bs, res, g):
    k0, xyz, refl, normal, vd, weights, biases = res
    if _use_kernel():
        d_ins, dws, dbs = fused_shade_cm_bwd_pallas(
            k0, xyz, refl, normal, vd, weights, biases, g,
            pos_pe, ref_pe, view_pe, bs=bs,
        )
        d_vd = d_ins[4] if vd is not None else None
        return (d_ins[0], d_ins[1], d_ins[2], d_ins[3], d_vd, dws, dbs)
    _, vjp = jax.vjp(
        lambda a, b_, c_, d_, e_, w, bi: fused_shade_cm_reference(
            a, b_, c_, d_, e_, w, bi, pos_pe, ref_pe, view_pe
        ),
        k0, xyz, refl, normal, vd, weights, biases,
    )
    return vjp(g)


fused_shade_cm.defvjp(_shade_fwd, _shade_bwd)
