"""FLTrust (Cao et al., NDSS'21) — server-root-of-trust aggregation.

Semantics (reference: src/defenses/fltrust.py:93-270, corrected to the
published algorithm):
  - the server trains the global model for one epoch on a small root dataset
    and uses the parameter delta as the trusted direction (:93-150);
  - trust_i = ReLU(cosine(client_DELTA_i, server_delta)); each client delta
    is rescaled to the server delta's norm; aggregate = global +
    trust-weighted mean of normalized deltas (zero total trust -> global +
    server delta).

DOCUMENTED DIVERGENCE: the reference computes the cosine against the
client's full *parameter vector* and rescales the whole vector to the
delta's (tiny) norm (:152-216) — which would collapse the global model —
but that code path never actually executes: the simulation and server both
call ``aggregate`` without ``global_params``, FLTrust raises, and the
caller falls back to FedAvg (SURVEY.md §2.9-3). There is therefore no
recorded behavior to match; this implementation is Cao et al., NDSS'21 as
published, operating in delta space via ctx["global"]. When ctx has no
"global", deltas degenerate to the raw updates (useful for unit tests and
for callers that already pass deltas).

The server's root-training step runs as its own jitted program: the engine
computes ctx["server_grad"] = flat(delta) each round and hands it to this
defense, so aggregation itself stays a pure [C, D] reduction. FLTrust's
"train inside aggregate" (SURVEY.md §3.5) therefore costs one extra fused
train program per round, not a host round-trip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from multimodal_fl_security_tpu.defenses.base import DEFENSES, BaseDefense


@DEFENSES.register("fltrust")
class FLTrustDefense(BaseDefense):
    name = "fltrust"
    needs_server_grad = True

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.trust_threshold = float(self.config.get("trust_threshold", 0.0))
        self.root_dataset_size = int(self.config.get("root_dataset_size", 100))
        self.learning_rate = float(self.config.get("learning_rate", 0.01))
        self.local_epochs = int(self.config.get("local_epochs", 1))
        self.batch_size = int(self.config.get("batch_size", 32))

    def trust_scores(self, updates: jnp.ndarray,
                     server_grad: jnp.ndarray) -> jnp.ndarray:
        dots = updates @ server_grad
        u_norms = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(updates), axis=1), 0.0))
        s_norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(server_grad)), 0.0))
        cos = dots / jnp.maximum(u_norms * s_norm, 1e-10)
        # Zero trust for degenerate norms (reference: fltrust.py:178-180).
        ok = jnp.logical_and(u_norms >= 1e-10, s_norm >= 1e-10)
        return jnp.maximum(jnp.where(ok, cos, 0.0), 0.0)

    def aggregate_with_aux(self, updates, weights, ctx=None):
        ctx = ctx or {}
        if "server_grad" not in ctx:
            raise ValueError(
                "FLTrust requires ctx['server_grad'] (the round engine computes "
                "it by training the global model on the root dataset)."
            )
        server_grad = ctx["server_grad"]
        global_flat = ctx.get("global")
        deltas = updates if global_flat is None else updates - global_flat[None, :]
        trust = self.trust_scores(deltas, server_grad)

        # Rescale each delta to the server delta's norm; zero-norm deltas
        # pass through unscaled (fltrust.py:188-216, in delta space).
        d_norms = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(deltas), axis=1), 0.0))
        s_norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(server_grad)), 0.0))
        scale = jnp.where(d_norms >= 1e-10, s_norm / jnp.maximum(d_norms, 1e-10), 1.0)
        normalized = deltas * scale[:, None]

        total_trust = jnp.sum(trust)
        weighted = jnp.einsum("c,cd->d", trust, normalized) / jnp.maximum(
            total_trust, 1e-10
        )
        # All-zero trust -> fall back to the server delta (fltrust.py:262-264).
        agg_delta = jnp.where(total_trust < 1e-10, server_grad, weighted)
        agg = agg_delta if global_flat is None else global_flat + agg_delta
        return agg, {"trust_scores": trust, "total_trust": total_trust}

    def detect(self, updates, weights, ctx=None):
        ctx = ctx or {}
        global_flat = ctx.get("global")
        deltas = updates if global_flat is None else updates - global_flat[None, :]
        trust = self.trust_scores(deltas, ctx["server_grad"])
        # <= (not <): trust is ReLU-clamped to >= 0, so with the default
        # threshold 0.0 a strict < could never flag anyone — the classic
        # FLTrust signal is exactly trust == 0 (non-positive cosine).
        return (trust <= self.trust_threshold).astype(jnp.float32)

    def get_metrics(self):
        return {
            "defense_type": self.name,
            "trust_threshold": self.trust_threshold,
            "root_dataset_size": self.root_dataset_size,
        }
