"""Model registry + init helper."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.core.registry import Registry

MODELS: Registry = Registry("model")


def create_model(name: str, num_classes: int = 10, **kwargs):
    """Instantiate a model by registry name.

    Mirrors the reference's ``create_model``/``create_cub200_model`` factories
    (reference: src/models/simple_cnn.py:90-102, src/models/cub200_cnn.py:121-132)
    but returns a stateless flax module; parameters are created by
    :func:`init_model`.
    """
    return MODELS.create(name, num_classes=num_classes, **kwargs)


def init_model(model, sample_batch: Dict[str, Any], seed: int = 0,
               rng: Optional[jax.Array] = None):
    """Initialize model variables from a sample batch (shapes only matter)."""
    if rng is None:
        rng = jax.random.PRNGKey(seed)
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, sample_batch, train=False
    )
    return variables


def param_count(variables) -> int:
    return sum(
        int(jnp.size(p)) for p in jax.tree_util.tree_leaves(variables["params"])
    )


def get_weights(params) -> list:
    """Parameters as a list of numpy arrays in pytree order — the
    reference's weight-exchange format (reference: simple_cnn.py:78-87,
    fl_client.py:62-74)."""
    import numpy as np

    return [np.asarray(p) for p in jax.tree_util.tree_leaves(params)]


def set_weights(params, weights: list):
    """Inverse of :func:`get_weights`: rebuild the pytree from the list."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    if len(leaves) != len(weights):
        raise ValueError(f"expected {len(leaves)} arrays, got {len(weights)}")
    new_leaves = [
        jnp.asarray(w, dtype=leaf.dtype).reshape(leaf.shape)
        for leaf, w in zip(leaves, weights)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
