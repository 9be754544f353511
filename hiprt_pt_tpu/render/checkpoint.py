"""Render-state checkpoint / resume.

The reference has no true checkpointing (SURVEY.md §5.4 — its render state is
the accumulation buffer + sample counter + reservoirs, reset by flag). Here the
whole RenderState is one pytree, so checkpointing is a flat .npz of its leaves
— resumable across processes and backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import RenderState


def _flatten_with_paths(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(path: str, state: RenderState):
    leaves, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, template: RenderState) -> RenderState:
    """Restore into the structure of `template` (shapes must match — i.e. the
    same resolution and the same ReSTIR on/off configuration)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = _flatten_with_paths(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(leaf.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {leaf.shape}"
            )
        new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
