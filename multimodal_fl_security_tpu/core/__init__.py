"""Core utilities: pytree flattening, PRNG plumbing, registries."""

from multimodal_fl_security_tpu.core.pytrees import (  # noqa: F401
    tree_size,
    flatten_tree,
    unflatten_tree,
    flatten_stacked,
    unflatten_like,
    tree_zeros_like,
)
from multimodal_fl_security_tpu.core.registry import Registry  # noqa: F401
