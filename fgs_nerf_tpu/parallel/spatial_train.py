"""Spatial sharding wired into training: the ``sp`` mesh axis carries
the voxel grids through a real train step.

Composition (SURVEY.md §2.9's TP analog; no reference counterpart —
the reference is single-GPU, `run.py:11`):

* ``sdf`` / ``k0`` parameters — and their Adam moments — are placed
  x-sharded over ``sp`` (`spatial_shardings`); every other leaf is
  replicated.  GSPMD then partitions all the *structured* grid work
  (gaussian smoothing convs, central-difference gradients, TV
  slices/diffs, the elementwise masked-Adam update) along x with
  automatic halo exchange, at slab-local memory cost.
* The one op GSPMD cannot partition profitably — the trilinear field
  gather, whose XLA fallback would all-gather the grid — is overridden
  via the model's ``gather_fn`` hook with a ``shard_map`` wrapper
  around :func:`parallel.spatial.sharded_trilinear_sample`: each device
  serves the samples whose base cell it owns from its 1-plane-haloed
  slab and a ``psum`` over ``sp`` completes every sample.  Its backward
  (differentiated through the shard_map) runs the deterministic
  sort-scatter per slab and routes halo-plane cotangents to their
  owners via the ppermute transpose.
* Rays stay sharded over ``dp``; along ``sp`` the per-sample pipeline
  is replicated (the documented cost model: sp buys grid *memory*
  scaling — resolution per chip — not gather throughput).

Grids whose x extent does not divide ``sp`` are zero-padded inside the
gather wrapper only; padded planes sit past the logical extent, read as
the zero padding the gather semantics already prescribe, and receive
zero cotangent.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fgs_nerf_tpu.parallel.spatial import sharded_trilinear_sample

shard_map = jax.shard_map

GRID_PARAMS = ("sdf", "k0")


def mesh_sp_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or "sp" not in mesh.axis_names:
        return 1
    return mesh.devices.shape[mesh.axis_names.index("sp")]


def make_spatial_gather(mesh: Mesh):
    """The model ``gather_fn``: trilinear gather against sp-sharded
    grids, rays sharded over dp.  ``gather(field [X,Y,Z,C], idx
    [N, ..., 3] index-space) -> [N, ..., C]``."""
    sp = mesh_sp_size(mesh)

    def gather(field: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        x = field.shape[0]
        pad = (-x) % sp
        if pad:
            field = jnp.pad(field, [(0, pad)] + [(0, 0)] * (field.ndim - 1))
        gx = field.shape[0]
        fn = shard_map(
            functools.partial(
                sharded_trilinear_sample, global_x=gx, axis_name="sp"
            ),
            mesh=mesh,
            in_specs=(P("sp"), P("dp")),
            out_specs=P("dp"),
            # the psum over sp makes the output sp-replicated, which the
            # static varying-manual-axes checker cannot prove
            check_vma=False,
        )
        return fn(field, idx)

    return gather


def spatial_shardings(mesh: Mesh, params: Any):
    """Per-leaf shardings: grid params x-sharded over sp, rest
    replicated.  Works for any pytree shaped like ``params`` (Adam
    moments included)."""
    grid = NamedSharding(mesh, P("sp"))
    repl = NamedSharding(mesh, P())

    def pick(path, leaf):
        name = path[0].key if path else None
        return grid if name in GRID_PARAMS else repl

    return jax.tree_util.tree_map_with_path(pick, params)


def place_spatial(mesh: Mesh, params: Any, opt_state=None):
    """Device-put params (and optionally an AdamState) with grid leaves
    sp-sharded."""
    params = jax.device_put(params, spatial_shardings(mesh, params))
    if opt_state is None:
        return params
    new_m = jax.device_put(
        opt_state.exp_avg, spatial_shardings(mesh, opt_state.exp_avg)
    )
    new_v = jax.device_put(
        opt_state.exp_avg_sq, spatial_shardings(mesh, opt_state.exp_avg_sq)
    )
    opt_state = type(opt_state)(jax.device_put(opt_state.step), new_m, new_v)
    return params, opt_state
