"""Checkpoint schema and stage-handoff artifacts.

Replaces ``torch.save({global_step, model_kwargs, MaskCache_kwargs,
model_state_dict, optimizer_state_dict})`` (`model/nerf_training.py:
521-531`) with a pickle-free ``.npz`` of flattened arrays plus a JSON
metadata blob.  The per-stage artifact set matches the reference's
handoff chain (SURVEY.md §5.4): the ``sdf_mask`` occupancy summary is
embedded so the *next* stage can build its MaskCache and shrink its
bbox from the file alone.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _to_host(leaf) -> np.ndarray:
    """Fetch one array to host memory, multi-host safe.

    ``jax.device_get`` crashes on arrays that are not process-
    addressable (sp-sharded grids on a multi-host mesh: each process
    holds only its x-slabs).  Those are gathered with a collective
    allgather — every process ends up with the full array, so the
    single-writer logic below can run anywhere.  Fully-addressable
    arrays (the single-host case, and all replicated leaves) take the
    direct path with no collective.
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(jax.device_get(leaf))


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}", v, out)
    elif tree is None:
        pass
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def save_checkpoint(
    path: str,
    *,
    global_step: int,
    params: Dict[str, Any],
    opt_state: Optional[Any] = None,
    sdf_mask: Optional[jnp.ndarray] = None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    xyz_min=None,
    xyz_max=None,
    lrs: Optional[Dict[str, float]] = None,
) -> None:
    flat: Dict[str, np.ndarray] = {}
    # _to_host runs a collective allgather for non-addressable leaves,
    # so on multi-host EVERY process must reach this point (the
    # single-writer gate comes after the gathers)
    _flatten("params", jax.tree.map(_to_host, params), flat)
    if opt_state is not None:
        _flatten("opt/exp_avg", jax.tree.map(_to_host, opt_state.exp_avg), flat)
        _flatten(
            "opt/exp_avg_sq", jax.tree.map(_to_host, opt_state.exp_avg_sq), flat
        )
        flat["opt/step"] = np.asarray(opt_state.step)
    if sdf_mask is not None:
        flat["artifacts/sdf_mask"] = _to_host(sdf_mask)
    meta = {
        "global_step": int(global_step),
        "model_kwargs": model_kwargs or {},
        "xyz_min": None if xyz_min is None else np.asarray(xyz_min).tolist(),
        "xyz_max": None if xyz_max is None else np.asarray(xyz_max).tolist(),
        "lrs": lrs or {},
        "format_version": 1,
    }
    flat["meta_json"] = np.frombuffer(
        json.dumps(meta, default=_json_default).encode(), dtype=np.uint8
    )
    # multi-host: one writer (a shared filesystem would otherwise see
    # concurrent writes to the same path); everyone else waits at the
    # barrier so no process reads a half-written file afterwards
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **flat)
        os.replace(tmp, path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_save:{path}")


def _json_default(o):
    if dataclasses.is_dataclass(o):
        return dataclasses.asdict(o)
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, (np.ndarray, jnp.ndarray)):
        return np.asarray(o).tolist()
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(f"not json-serializable: {type(o)}")


class Checkpoint:
    """Loaded checkpoint with lazy tree access."""

    def __init__(self, path: str):
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        self.meta = json.loads(bytes(flat.pop("meta_json").tobytes()).decode())
        tree = _unflatten(flat)
        self.params = tree.get("params", {})
        self.opt = tree.get("opt", None)
        self.artifacts = tree.get("artifacts", {})

    @property
    def global_step(self) -> int:
        return self.meta["global_step"]

    @property
    def sdf_mask(self) -> Optional[np.ndarray]:
        return self.artifacts.get("sdf_mask")

    @property
    def box(self) -> Tuple[np.ndarray, np.ndarray]:
        return (
            np.asarray(self.meta["xyz_min"], np.float32),
            np.asarray(self.meta["xyz_max"], np.float32),
        )


def load_checkpoint(path: str) -> Checkpoint:
    return Checkpoint(path)
