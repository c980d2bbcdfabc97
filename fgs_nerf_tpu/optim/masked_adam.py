"""Masked / per-voxel Adam as a pure functional transform.

Replaces the fused CUDA optimizer (`model/cuda/adam_upd_kernel.cu:8-132`
driven by ``MaskedAdam.step``, `model/adam.py:167-221`) with an
elementwise XLA update that fuses equally well on TPU and composes with
sharded parameters:

* bias correction is folded into the step size host-equivalently:
  ``step_size = lr * sqrt(1 - beta2**t) / (1 - beta1**t)``
  (`adam_upd_kernel.cu:72`);
* ``skip_zero_grad`` parameters leave both moments *and* the parameter
  untouched wherever grad == 0 (`adam_upd_kernel.cu:35` — the sparse
  voxel-update speedup, which on TPU is a select rather than a skip);
* a per-voxel LR array (visibility-count based,
  `model/adam.py:185-187`) scales the step where the shapes match
  (`adam_upd_kernel.cu:56`).

Each parameter leaf carries a :class:`ParamOpts`; learning rates are
runtime scalars so LR schedules never retrace.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ParamOpts:
    """Static per-parameter-group options (hashable; safe as jit static)."""

    skip_zero_grad: bool = False
    has_per_lr: bool = False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AdamState:
    step: jnp.ndarray  # [] int32 — shared Adam step count for the group set
    exp_avg: Any  # pytree matching params
    exp_avg_sq: Any  # pytree matching params

    def tree_flatten(self):
        return (self.step, self.exp_avg, self.exp_avg_sq), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_state(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    zeros_sq = jax.tree.map(jnp.zeros_like, params)
    return AdamState(jnp.zeros((), jnp.int32), zeros, zeros_sq)


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lrs: Any,
    opts: Dict[str, ParamOpts],
    per_lr: Optional[Any] = None,
    beta1: float = 0.9,
    beta2: float = 0.99,
    eps: float = 1e-8,
):
    """One fused Adam step over a flat dict-of-pytrees parameter layout.

    ``params``/``grads`` are dicts ``{group_name: leaf_or_subtree}``;
    ``lrs`` maps group name -> scalar learning rate (traced value);
    ``opts`` maps group name -> :class:`ParamOpts`; ``per_lr`` maps
    group name -> per-element LR array (or None).  Groups without an
    entry in ``lrs`` are frozen (the reference freezes lr==0 /
    unlisted attrs, `model/nerf_training.py:34-36`).

    Returns (new_params, new_state).
    """
    step = state.step + 1
    t = step.astype(jnp.float32)
    bias = jnp.sqrt(1.0 - beta2**t) / (1.0 - beta1**t)

    new_params = {}
    new_m = {}
    new_v = {}
    for name, p in params.items():
        if name not in lrs:
            new_params[name] = p
            new_m[name] = state.exp_avg[name]
            new_v[name] = state.exp_avg_sq[name]
            continue
        g = grads[name]
        o = opts.get(name, ParamOpts())
        lr = lrs[name]
        plr = per_lr.get(name) if (per_lr and o.has_per_lr) else None

        def leaf_update(p_l, g_l, m_l, v_l, plr_l=None):
            m_n = beta1 * m_l + (1.0 - beta1) * g_l
            v_n = beta2 * v_l + (1.0 - beta2) * g_l * g_l
            step_scale = lr * bias
            if plr_l is not None:
                step_scale = step_scale * plr_l
            p_n = p_l - step_scale * m_n / (jnp.sqrt(v_n) + eps)
            if o.skip_zero_grad:
                live = g_l != 0.0
                p_n = jnp.where(live, p_n, p_l)
                m_n = jnp.where(live, m_n, m_l)
                v_n = jnp.where(live, v_n, v_l)
            return p_n, m_n, v_n

        if plr is not None:
            out = jax.tree.map(leaf_update, p, g, state.exp_avg[name], state.exp_avg_sq[name], plr)
        else:
            out = jax.tree.map(leaf_update, p, g, state.exp_avg[name], state.exp_avg_sq[name])
        # unzip the (p, m, v) tuples back into three trees
        leaves, treedef = jax.tree.flatten(out, is_leaf=lambda x: isinstance(x, tuple))
        new_params[name] = jax.tree.unflatten(treedef, [l[0] for l in leaves])
        new_m[name] = jax.tree.unflatten(treedef, [l[1] for l in leaves])
        new_v[name] = jax.tree.unflatten(treedef, [l[2] for l in leaves])

    return new_params, AdamState(step, new_m, new_v)
