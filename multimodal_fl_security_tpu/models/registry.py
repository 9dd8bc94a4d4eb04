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
