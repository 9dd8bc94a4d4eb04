"""Defense base contract + FedAvg.

Contract parity with the reference (reference: src/defenses/base_defense.py:31-64):
``aggregate`` consumes all client updates and example counts; ``detect``
optionally flags suspicious clients. The data layout differs by design —
a dense [C, D] float32 matrix instead of lists of tensors — because that is
the shape TPU reductions want.

Updates are *new parameter vectors* (not deltas), matching the reference's
weight-exchange convention (reference: experiments/run_experiments.py:238).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from multimodal_fl_security_tpu.core.registry import Registry
from multimodal_fl_security_tpu.ops.reductions import weighted_mean

DEFENSES: Registry = Registry("defense")


def get_defense(defense_type: str, config: Optional[Dict[str, Any]] = None):
    """Factory, mirroring the reference's get_defense (defenses/__init__.py:28-59)."""
    return DEFENSES.create(defense_type or "none", config or {})


class BaseDefense:
    """Base class. Subclasses override ``aggregate_with_aux``.

    ``ctx`` carries round context the reference passed through side channels:
      - "global": [D] current global params (FLTrust, model-replacement math)
      - "key": PRNG key for randomized defenses (DP noise)
      - "server_grad": [D] FLTrust's root-trained server delta
    """

    name = "base"
    #: set by defenses that need ctx["server_grad"] (engine computes it)
    needs_server_grad = False
    #: stateful defenses thread a state pytree through the jitted round
    #: (init_state/aggregate_stateful); see foolsgold.py, centered_clip.py
    stateful = False
    #: for stateful defenses: True when state leaves carry a leading
    #: per-client axis (e.g. FoolsGold's [C, D] history). The engine then
    #: gathers the sampled clients' rows into aggregate_stateful and
    #: scatters the returned rows back, so client subsampling composes —
    #: each client's history accumulates across the rounds it participates
    #: in. False = global state (e.g. centered clipping's [D] center),
    #: passed through unsliced.
    state_per_client = False

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        self.config = dict(config or {})

    # -- core API ----------------------------------------------------------
    def aggregate(self, updates: jnp.ndarray, weights: jnp.ndarray,
                  ctx: Optional[Dict[str, Any]] = None) -> jnp.ndarray:
        return self.aggregate_with_aux(updates, weights, ctx)[0]

    def aggregate_with_aux(
        self, updates: jnp.ndarray, weights: jnp.ndarray,
        ctx: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    def detect(self, updates: jnp.ndarray, weights: jnp.ndarray,
               ctx: Optional[Dict[str, Any]] = None) -> jnp.ndarray:
        """Suspicion mask [C] (1.0 = flagged malicious). Default: none."""
        return jnp.zeros((updates.shape[0],), jnp.float32)

    def get_metrics(self) -> Dict[str, Any]:
        return {"defense_type": self.name}


@DEFENSES.register("none", "fedavg")
class NoDefense(BaseDefense):
    """Example-count-weighted FedAvg (reference: base_defense.py:80-97)."""

    name = "fedavg"

    def aggregate_with_aux(self, updates, weights, ctx=None):
        return weighted_mean(updates, weights), {}
