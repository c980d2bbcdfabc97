"""Pallas TPU kernels — status and design notes (round 4).

Landed kernels:

* ``scatter_combine.dense_accumulate_pallas`` — sorted scatter-add into
  the dense padded row space via a sliding one-hot-MXU window (the
  lattice engine's grid-gradient backward; replaces ATen's
  nondeterministic atomicAdd, SURVEY.md §2.7 N11).  Serve base is
  sublane-quantized so any block size compiles; B=512 measured fastest
  (13.4 ms at the coarse bench's 2.36M-sample stream).
* ``window_gather_cm.sorted_window_gather_cm_pallas`` — the
  channel-major forward serve of the sorted engine: a row-sorted sample
  stream served from scalar-prefetched, block-pipelined ``[8C, bw]``
  pack windows by MXU-native ``win @ onehot`` matmuls, with an in-body
  DMA slide loop completing rare blocks that out-span the fast window.
  Exact (zero-padding semantics via the zero pack tail).
* ``scatter_combine_cm.dense_accumulate_cm_pallas`` — the sorted
  engine's backward accumulate: updates are built IN KERNEL as the
  outer product ``w8 x g`` (the ``[M, 8C]`` update tensor never exists
  in HBM) and served over the full ``2B`` accumulator window with one
  native dot per iteration — no dynamic vector offsets at all.

Measured bounds that shaped (and bound) these designs — full evidence
in PROFILE_r03.md:

* XLA's dynamic row gather costs ~11.5 ns/row at >=256 B rows and does
  NOT improve with wider rows (~80 GB/s per gather stream regardless);
  index distribution is irrelevant.
* Mosaic has no vectorized VMEM gather ("multiple source vregs along
  gather dimension" — only intra-vreg lane shuffles lower), and per-row
  DMA issue overhead rules out descriptor-per-row gathers.
* A stable ``lax.sort`` moves 1 payload channel for 5.9 ms (+1.6 ms per
  extra f32 column) — the cheapest few-channel permutation primitive.
* The one-hot-MXU serve floors at ~6 ns/sample: ~2-3 us/grid-step
  pipeline overhead plus the onehot build traffic; ablations show the
  floor persists with the matmuls removed.
* Standalone XLA transposes are cheap (0.3 ms for [1.5M, 16] f32,
  round-4 `scripts/microbench_layout.py` section B) — the serial
  "relayout while-loops" of earlier rounds were fusion artifacts, so
  explicit layout changes at engine boundaries are affordable.

Consequence: every crossing mechanism on this stack clusters at ~5-7
ns/sample, so the coarse bench's two unavoidable crossings bound the
step from below; the channel-major sorted engine (``ops/sorted_cm.py``)
eliminates the backward permutation entirely and runs its elementwise
tail at full lane width.
"""
