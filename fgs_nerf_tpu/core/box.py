"""Scene bounding box + voxel-grid geometry helpers.

Mirrors the grid-resolution bookkeeping of the reference model
(`model/nerf.py:298-307`): given a target voxel count the voxel size is
``(volume / num_voxels)**(1/3)`` and the per-axis resolution is
``floor(extent / voxel_size)``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SceneBox:
    """Axis-aligned world-space bounding box.

    ``xyz_min``/``xyz_max`` are float32 arrays of shape [3].  They are
    pytree leaves so a traced function can close over them dynamically,
    but in practice they are fixed per training stage.
    """

    xyz_min: jnp.ndarray
    xyz_max: jnp.ndarray

    def tree_flatten(self):
        return (self.xyz_min, self.xyz_max), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def extent(self) -> jnp.ndarray:
        return self.xyz_max - self.xyz_min

    def normalize(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """World coords -> [0, 1]^3 (same mapping as `model/grid.py:55`)."""
        return (xyz - self.xyz_min) / (self.xyz_max - self.xyz_min)

    def scale(self, world_bound_scale: float) -> "SceneBox":
        """Symmetric box inflation (`model/nerf_training.py:73-76`)."""
        shift = (self.xyz_max - self.xyz_min) * (world_bound_scale - 1.0) / 2.0
        return SceneBox(self.xyz_min - shift, self.xyz_max + shift)

    @staticmethod
    def create(xyz_min, xyz_max) -> "SceneBox":
        return SceneBox(
            jnp.asarray(xyz_min, jnp.float32), jnp.asarray(xyz_max, jnp.float32)
        )


def grid_resolution(
    xyz_min: np.ndarray, xyz_max: np.ndarray, num_voxels: int
) -> Tuple[Tuple[int, int, int], float]:
    """Voxel size and integer world resolution for a voxel budget.

    Reference: `model/nerf.py:298-307` (``_set_grid_resolution``);
    resolution uses trunc-toward-zero (torch ``.long()``).  Arithmetic
    is float32 on purpose: the truncation result depends on fp32
    rounding (e.g. 120^3 voxels in a [-1,1]^3 box gives 120 in fp32 but
    119 in fp64), and the reference computes in torch fp32.
    """
    ext = (np.asarray(xyz_max, np.float32) - np.asarray(xyz_min, np.float32))
    voxel_size = np.power(
        ext.prod() / np.float32(num_voxels), np.float32(1.0 / 3.0), dtype=np.float32
    )
    world_size = tuple(int(v) for v in (ext / voxel_size).astype(np.int64))
    return world_size, float(voxel_size)


def max_samples_per_ray(world_size: Tuple[int, int, int], stepsize: float) -> int:
    """Static upper bound on samples along any ray through the box.

    The ragged CUDA sampler allocates ``ceil((t_max-t_min)*|d|/stepdist)``
    samples per ray (`render_utils_kernel.cu:38-55`); the longest chord
    is the box diagonal, so with stepdist = stepsize * voxel_size the
    bound is ``|world_size| / stepsize``.  +1 for the ceil and the
    at-least-one-sample rule; rounded up to a multiple of 8 for TPU
    sublane alignment.
    """
    diag = float(np.linalg.norm(np.asarray(world_size, np.float64)))
    s_max = int(np.ceil(diag / stepsize)) + 1
    return ((s_max + 7) // 8) * 8
