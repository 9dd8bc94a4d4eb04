"""Pytree <-> flat-vector utilities.

The reference exchanges model weights as *lists of tensors in parameter
order* (reference: src/client/fl_client.py:62-74, experiments/
run_experiments.py:238). Here the canonical exchange format is a single
flat f32 vector per client, so robust aggregation rules see a dense
``[num_clients, dim]`` matrix that maps directly onto TPU reductions
(MXU matmuls for pairwise distances, sorts over the client axis).

All helpers are shape-static and jit/vmap-safe.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Any


def tree_size(tree: Pytree) -> int:
    """Total number of scalar elements across all leaves."""
    return sum(int(np.prod(leaf.shape)) for leaf in jax.tree_util.tree_leaves(tree))


def flatten_tree(tree: Pytree) -> jnp.ndarray:
    """Flatten a pytree of arrays into one 1-D f32 vector (static order)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate(
        [jnp.reshape(leaf, (-1,)).astype(jnp.float32) for leaf in leaves]
    )


def unflatten_tree(template: Pytree, flat: jnp.ndarray) -> Pytree:
    """Inverse of :func:`flatten_tree` given a template with the same structure."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    offset = 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape))
        out.append(
            jnp.reshape(flat[offset : offset + n], leaf.shape).astype(leaf.dtype)
        )
        offset += n
    return jax.tree_util.tree_unflatten(treedef, out)


def flatten_stacked(stacked: Pytree) -> jnp.ndarray:
    """Flatten a client-stacked pytree (leading axis C on every leaf) to [C, D]."""
    leaves = jax.tree_util.tree_leaves(stacked)
    c = leaves[0].shape[0]
    return jnp.concatenate(
        [jnp.reshape(leaf, (c, -1)).astype(jnp.float32) for leaf in leaves], axis=1
    )


def unflatten_like(template: Pytree, flat: jnp.ndarray) -> Pytree:
    """Alias of :func:`unflatten_tree` (template-first naming)."""
    return unflatten_tree(template, flat)


def make_flattener(
    template: Pytree,
) -> Tuple[int, Callable[[Pytree], jnp.ndarray], Callable[[jnp.ndarray], Pytree]]:
    """Return (dim, flatten_fn, unflatten_fn) bound to a template's structure."""
    dim = tree_size(template)

    def _flatten(tree: Pytree) -> jnp.ndarray:
        return flatten_tree(tree)

    def _unflatten(flat: jnp.ndarray) -> Pytree:
        return unflatten_tree(template, flat)

    return dim, _flatten, _unflatten


def tree_zeros_like(tree: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def tree_add(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(tree: Pytree, s) -> Pytree:
    return jax.tree_util.tree_map(lambda x: x * s, tree)


def global_norm(tree: Pytree) -> jnp.ndarray:
    """L2 norm over all leaves (matches torch.nn.utils.clip_grad_norm_ semantics)."""
    sq = sum(
        jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        for leaf in jax.tree_util.tree_leaves(tree)
    )
    return jnp.sqrt(sq)
