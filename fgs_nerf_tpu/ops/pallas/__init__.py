"""Pallas TPU kernels — status and design notes (round 3).

Landed kernels:

* ``scatter_combine.dense_accumulate_pallas`` — sorted scatter-add into
  the dense padded row space via a sliding one-hot-MXU window (the
  grid-gradient backward; replaces ATen's nondeterministic atomicAdd,
  SURVEY.md §2.7 N11).  Serve base is sublane-quantized so any block
  size compiles; B=512 measured fastest (13.4 ms at the coarse bench's
  2.36M-sample stream).
* ``window_gather.sorted_window_gather_pallas`` — the forward twin: a
  row-sorted sample stream served from scalar-prefetched, block-
  pipelined pack windows by one-hot MXU matmuls, with an in-body DMA
  slide loop completing rare blocks that out-span the fast window.
  Exact (zero-padding semantics via the zero pack tail).  15.5–21 ms
  at bench scale.

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

Consequence: every crossing mechanism on this stack clusters at ~5-7
ns/sample, so the coarse bench's two unavoidable crossings bound the
step from below; the sorted-stream engine (``ops/sorted_stream.py``)
eliminates the backward permutation entirely and is the path below the
XLA-take floor once its elementwise work is channel-major.
"""
