"""Checkpoint/resume for federated training state.

The reference saves torch checkpoints every 10 rounds but never loads them
(SURVEY.md §5 — "checkpoints are never loaded by any code path"); resume
only exists at the experiment-matrix level via result files. Here
checkpointing is functional: (global params, round index, PRNG key, round
history) are saved via orbax and ``latest``/``restore`` actually resume a
run mid-experiment.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, round_idx: int, params: Any,
                    key: jax.Array,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    extra_arrays = {
        k: np.asarray(v, np.float64) for k, v in (extra or {}).items()
    }
    state = {
        "params": params,
        "key": np.asarray(jax.random.key_data(key))
        if hasattr(jax.random, "key_data") else np.asarray(key),
        "round": np.asarray(round_idx, np.int64),
        "extra": extra_arrays,
    }
    mgr.save(round_idx, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_round(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    try:
        mgr = _manager(directory)
        step = mgr.latest_step()
        return int(step) if step is not None else None
    except Exception:
        return None


def restore_checkpoint(directory: str, template_params: Any
                       ) -> Optional[Tuple[int, Any, jax.Array, Dict]]:
    """Restore the latest checkpoint; returns (round, params, key, extra)."""
    import orbax.checkpoint as ocp

    step = latest_round(directory)
    if step is None:
        return None
    mgr = _manager(directory)
    state = mgr.restore(step)
    key = jax.random.wrap_key_data(np.asarray(state["key"], np.uint32)) \
        if hasattr(jax.random, "wrap_key_data") \
        else jax.numpy.asarray(state["key"], dtype=jax.numpy.uint32)
    params = jax.tree_util.tree_map(
        lambda t, s: jax.numpy.asarray(s, dtype=t.dtype),
        template_params, state["params"],
    )
    extra = {k: np.asarray(v).tolist()
             for k, v in dict(state.get("extra", {})).items()}
    return int(np.asarray(state["round"])), params, key, extra
