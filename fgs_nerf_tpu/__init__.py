"""FGS-NeRF-TPU: a TPU-native glossy-surface reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of FGS-NeRF
(voxel-SDF reconstruction with reflection-direction shading in the
DVGO/Voxurf lineage).  This is *not* a port: the reference is a
single-GPU PyTorch+CUDA codebase built around ragged, data-dependent
point streams; this framework is built around the TPU compilation
model instead:

* **Static shapes everywhere.**  The reference's ragged CUDA ray
  sampler (`model/cuda/render_utils_kernel.cu:144-242`) and its three
  layers of boolean compaction become a fixed ``[n_rays, S_max]``
  sample lattice with validity masks (``ops/ray_sample.py``).
* **Scans, not serial loops.**  The per-ray early-exiting
  transmittance loop (`render_utils_kernel.cu:577-707`) becomes a
  masked exclusive cumulative product with a custom VJP that
  reproduces the reference's truncated backward exactly
  (``ops/transmittance.py``).
* **Gather/scatter as XLA/Pallas ops.**  ``F.grid_sample`` trilinear
  interpolation and its nondeterministic scatter-add backward
  (`model/grid.py:49-68`) become an 8-corner gather with a
  deterministic scatter-add VJP (``ops/interp.py``), with Pallas
  kernels for the hot paths (``ops/pallas/``).
* **SPMD scaling.**  The reference has no distributed support; here
  rays are sharded over a ``jax.sharding.Mesh`` with replicated grids
  and psum'd gradients (``parallel/``).

Layout:
  ops/       pure-functional numerical kernels (jnp + pallas)
  core/      grids, scene box, masks, field containers
  models/    the SDF voxel renderer + DVGO-style density model
  optim/     masked / per-voxel Adam and LR schedules
  data/      dataset loaders and the ray engine
  train/     stage orchestration, losses, checkpoints
  eval/      metrics, image rendering, marching cubes + meshes
  parallel/  device mesh and sharding helpers
  config/    stage/scene configuration dataclasses
"""

__version__ = "0.1.0"
