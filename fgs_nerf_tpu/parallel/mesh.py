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
    """Device-put host arrays with the ray axis sharded over dp."""
    if mesh is None:
        return tuple(jax.device_put(a) for a in arrays)
    s = batch_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)
