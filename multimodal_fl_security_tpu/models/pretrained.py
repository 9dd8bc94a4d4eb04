"""Local pretrained-weight loading + backbone freezing.

The reference fine-tunes an ImageNet ResNet-50 and optionally freezes the
backbone (reference: src/models/cub200_cnn.py:29-54 — torchvision
``IMAGENET1K_V2`` weights, fc replaced by a fresh Dropout+Linear head,
``freeze_backbone`` loops ``requires_grad=False`` over non-fc params).
This environment has no network egress, so the equivalent here is a
file-drop: ``save_params`` writes a parameter pytree to a local pickle,
``load_pretrained`` merges one into a freshly initialized model by
name+shape — any leaf whose shape differs (e.g. a classifier head with a
different class count) keeps its fresh initialization, exactly like the
reference's replaced fc. Freezing is handled in the training step
(rounds/engine.py TrainSpec.frozen_prefixes): frozen subtrees are masked
out of both the gradients (so they don't consume clip-norm budget, like
``requires_grad=False``) and the final updates (so weight decay cannot
move them either).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List, Tuple

import numpy as np


def save_params(path: str, params: Any) -> None:
    """Write a parameter pytree to ``path`` as a pickle of numpy leaves."""
    import jax

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_params(path: str) -> Any:
    """Read a parameter pytree written by :func:`save_params` (or any
    pickled dict-of-arrays with the same structure)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def load_pretrained(
    init_params: Any,
    path: str,
) -> Tuple[Any, Dict[str, List[str]]]:
    """Merge a local pretrained checkpoint into freshly initialized params.

    Leaves are matched by path (joined key names) and shape:

    * present in both, same shape  -> pretrained value (cast to init dtype)
    * present in both, shape mismatch -> fresh init (the "replaced head"
      case — a 1000-class checkpoint meets a 200-class model)
    * only in init -> fresh init; only in checkpoint -> ignored

    Returns ``(params, info)`` where ``info`` lists the ``loaded``,
    ``reinitialized`` (shape-mismatch) and ``missing`` leaf paths, so
    callers can assert the expected transfer actually happened.
    """
    import jax

    loaded_tree = load_params(path)

    def _flatten(tree, prefix=""):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(_flatten(v, f"{prefix}{k}/"))
        else:
            out[prefix[:-1]] = tree
        return out

    src = _flatten(loaded_tree)
    info: Dict[str, List[str]] = {
        "loaded": [], "reinitialized": [], "missing": [],
    }

    flat_init, treedef = jax.tree_util.tree_flatten_with_path(init_params)
    new_leaves = []
    for key_path, leaf in flat_init:
        name = "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in key_path
        )
        cand = src.get(name)
        if cand is None:
            info["missing"].append(name)
            new_leaves.append(leaf)
        elif tuple(np.shape(cand)) == tuple(np.shape(leaf)):
            info["loaded"].append(name)
            new_leaves.append(np.asarray(cand, dtype=np.asarray(leaf).dtype))
        else:
            info["reinitialized"].append(name)
            new_leaves.append(leaf)
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(init_params), new_leaves
    )
    return params, info


def backbone_prefixes(params: Any,
                      head_prefixes: Tuple[str, ...] = None
                      ) -> Tuple[str, ...]:
    """Top-level subtrees that constitute the backbone: everything except
    the classifier head. Matches the reference's freeze loop, which skips
    only ``fc.*`` (reference: cub200_cnn.py:40-44). Flax auto-names the
    classifier ``Dense_N`` at the top level for every model in this zoo;
    by default ONLY the highest-numbered Dense is the head — earlier
    top-level Dense layers (e.g. a fusion/hidden layer) are backbone and
    must freeze with it, exactly like the reference's all-but-final-fc
    loop. Pass ``head_prefixes`` explicitly to override.
    """
    keys = list(params)
    if head_prefixes is None:
        dense = sorted(
            (k for k in keys
             if k.startswith("Dense_") and k.split("_")[-1].isdigit()),
            key=lambda k: int(k.split("_")[-1]),
        )
        head_prefixes = (dense[-1],) if dense else ("Dense",)
    return tuple(
        k for k in keys
        if not any(k.startswith(p) for p in head_prefixes)
    )
