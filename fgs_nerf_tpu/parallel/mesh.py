"""Device mesh and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.9); here the
parallel plan is ray-sharded data parallelism: the ray batch is sharded
over the ``dp`` mesh axis, grids + MLP parameters are replicated, and
XLA inserts the gradient psum over ICI when the jitted train step's
output shardings demand replication.  A second ``sp`` axis is reserved
for spatial grid sharding (halo-exchange stencils) at high resolution.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("dp",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def maybe_distributed_init() -> None:
    """Multi-host SPMD bootstrap (`jax.distributed.initialize`).

    The reference is single-process (SURVEY.md §2.9); multi-host here is
    per-host same-program SPMD over one global mesh.  Gated on the
    standard coordinator env vars so single-host runs (and the CPU test
    mesh) never pay the rendezvous: set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES and JAX_PROCESS_ID (or run under a launcher that
    sets them — `jax.distributed.initialize()` reads them itself), or
    set FGS_DISTRIBUTED=1 on TPU pods where JAX can auto-detect.
    """
    import os

    # NB: must not touch the backend before initialize() — even
    # jax.process_count() initializes XLA and makes a later
    # jax.distributed.initialize() raise (caught by
    # tests/test_distributed.py).
    if jax.distributed.is_initialized():
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        # this JAX's initialize() only auto-detects managed clusters
        # (SLURM / TPU pods); pass the generic env contract explicitly
        missing = [
            k for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
            if k not in os.environ
        ]
        if missing:
            raise ValueError(
                "JAX_COORDINATOR_ADDRESS is set but "
                f"{', '.join(missing)} is missing — the generic "
                "multi-host contract needs all three env vars"
            )
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    elif os.environ.get("FGS_DISTRIBUTED") == "1":
        jax.distributed.initialize()


def build_mesh(spec: str, parallel_cfg=None) -> Optional[Mesh]:
    """Resolve a CLI/config mesh request into a device mesh.

    spec: ``'none'`` -> None (single device);
          ``'auto'`` -> None on 1 device, else 1-D dp mesh over all
          devices using the config's ``mesh_axes`` names;
          ``'dp=4'`` / ``'dp=4,sp=2'`` -> explicit axis sizes (row-major
          over ``jax.devices()``; dp outermost so ray shards stay on
          ICI neighbors when sp subdivides a host).
    """
    parallel_cfg = parallel_cfg or {}
    if spec in ("none", "1", ""):
        return None
    devices = jax.devices()
    if spec == "auto":
        if len(devices) == 1:
            return None
        axes = tuple(parallel_cfg.get("mesh_axes", ("dp",)))
        return make_mesh(axes, devices)
    names, sizes = [], []
    for part in spec.split(","):
        name, _, size = part.partition("=")
        if not size:
            raise ValueError(f"bad mesh spec part {part!r}; want name=N")
        names.append(name.strip())
        sizes.append(int(size))
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"mesh spec {spec!r} needs {total} devices, have {len(devices)}"
        )
    return Mesh(
        np.asarray(devices[:total]).reshape(sizes), tuple(names)
    )


def batch_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    """Rays sharded over dp; None on a single device."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], *arrays):
    """Device-put host arrays with the ray axis sharded over dp.

    Multi-host: every process computes the same global batch (ray
    selection is seed-deterministic), and each contributes only its
    process-local slice of the dp axis via
    ``jax.make_array_from_process_local_data`` — no cross-host data
    movement, DCN carries only the gradient psum.
    """
    if mesh is None:
        return tuple(jax.device_put(a) for a in arrays)
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, s) for a in arrays)
    out = []
    for a in arrays:
        a = np.asarray(a)
        out.append(jax.make_array_from_process_local_data(
            s, a[_local_rows(s, a.shape)], a.shape
        ))
    return tuple(out)


def _local_rows(sharding: NamedSharding, global_shape) -> slice:
    """The contiguous dp-axis row range this process owns."""
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    starts = [sl[0].start or 0 for sl in idx_map.values()]
    stops = [
        sl[0].stop if sl[0].stop is not None else global_shape[0]
        for sl in idx_map.values()
    ]
    return slice(min(starts), max(stops))
