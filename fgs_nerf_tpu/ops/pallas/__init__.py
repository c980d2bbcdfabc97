"""Pallas TPU kernels — status and design notes.

Measured primitive costs on TPU v5e (see ``bench.py`` history):
XLA dynamic-gather ~6 ns/row (independent of row width), scatter-add
~15 ns/row, pair-sort ~5 ns/element.  The render pipeline is
gather/scatter-row bound: pass-1 field sampling is 8 corners x
rays x sample_k rows and its backward is the same row count of
scatter-adds.

Direct in-kernel vectorized gather (``jnp.take`` /
``take_along_axis`` on VMEM refs) does not lower in the current Mosaic
build ("Only 2D gather is supported", and the supported 2-D forms
fail lowering on this stack), so a VMEM-resident-grid gather kernel is
not yet implementable.  The planned design that *is* compatible with
the hardware and this toolchain:

1. **Morton grid layout**: store voxel grids in Z-order so the 8
   corners of any 2x2x2 cell fall in a small contiguous row window
   (usually <= 64 rows).
2. **Sort samples by Morton(base cell)** — XLA pair-sort at ~5
   ns/element is far cheaper than scatter rows.
3. **Blockwise one-hot matmul**: for each block of ~1k sorted samples,
   corners hit a ~640-row window; gather becomes
   ``onehot[B, W] @ window[W, C]`` and scatter-add becomes
   ``onehot.T[W, B] @ updates[B, C]`` — both MXU work at a few
   GFLOP/step instead of serialized scalar scatter.  Spill samples at
   Morton discontinuities take the slow path.
4. Fuse alpha + scan + composite per ray-block once (3) lands.

Estimated effect: backward grid scatter 390 ms -> <100 ms per step at
the coarse-stage workload, before any Pallas fusion.  Step (1)-(3) are
expressible in pure XLA and are the first perf milestone of the next
round; the Pallas fusion of (4) follows.
"""
