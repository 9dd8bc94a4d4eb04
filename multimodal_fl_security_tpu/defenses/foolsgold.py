"""FoolsGold (Fung, Yoon, Beschastnikh — RAID'20 "The Limitations of
Federated Learning in Sybil Settings").

Not present in the reference; added because it is THE classical defense for
the colluding-sybil regime this framework demonstrates (the
2-of-5-colluders backdoor in artifacts/attack_efficacy/, where
trimmed-mean only suppresses ASR to ~0.38): colluding clients push
consistently similar updates round after round, so their *historical*
update directions converge while honest clients' directions stay diverse.

Algorithm per round (paper §4):
  1. accumulate each client's delta into a historical aggregate H_i (the
     defense STATE, threaded through the jitted round by the engine);
  2. cs_ij = cosine(H_i, H_j) for i != j;
  3. pardoning: cs_ij *= maxcs_i / maxcs_j wherever maxcs_j > maxcs_i
     (protects honest clients that happen to resemble a sybil);
  4. wv_i = 1 - max_j cs_ij, clipped to [0, 1], rescaled by the max,
     then sharpened through the logit function and re-clipped;
  5. aggregate = global + sum_i wv_i * delta_i / sum_i wv_i.

The whole rule is a handful of fused XLA ops on the [C, D] matrix: one
Gram matmul for the cosines, elementwise pardoning, a weighted mean.
State cost: one [C, D] float32 buffer (the history).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from multimodal_fl_security_tpu.defenses.base import DEFENSES, BaseDefense


@DEFENSES.register("foolsgold")
class FoolsGoldDefense(BaseDefense):
    name = "foolsgold"
    stateful = True
    state_per_client = True  # history rows indexed by client id

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.eps = float(self.config.get("eps", 1e-5))

    # -- state -------------------------------------------------------------
    def init_state(self, num_clients: int, dim: int):
        """Historical per-client delta aggregates H [C, D]."""
        return jnp.zeros((num_clients, dim), jnp.float32)

    # -- weights -----------------------------------------------------------
    def weights_from_history(self, hist: jnp.ndarray) -> jnp.ndarray:
        """FoolsGold weight vector wv [C] from historical aggregates."""
        c = hist.shape[0]
        norms = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(hist), axis=1), self.eps ** 2))
        cs = (hist @ hist.T) / (norms[:, None] * norms[None, :])
        off = 1.0 - jnp.eye(c, dtype=cs.dtype)
        cs = cs * off                                   # zero self-similarity
        # Negative cosine = dissimilar = no collusion signal; clamp to
        # [0, 1] BEFORE pardoning — otherwise an all-negative-similarity
        # round makes maxcs negative, the eps-clamped ratio explodes to
        # ~-maxcs/eps, and every honest client's weight collapses to 0.
        cs = jnp.clip(cs, 0.0, 1.0)
        maxcs = jnp.max(cs, axis=1)                     # [C]
        # Pardoning (paper alg. 1 lines 9-13).
        ratio = maxcs[:, None] / jnp.maximum(maxcs[None, :], self.eps)
        cs = jnp.where(maxcs[None, :] > maxcs[:, None], cs * ratio, cs)
        wv = 1.0 - jnp.max(cs, axis=1)
        wv = jnp.clip(wv, 0.0, 1.0)
        wv = wv / jnp.maximum(jnp.max(wv), self.eps)
        wv = jnp.where(wv == 1.0, 0.99, wv)
        # Logit sharpening, then re-clip (paper alg. 1 lines 18-21).
        wv = jnp.log(wv / jnp.maximum(1.0 - wv, self.eps) + self.eps) + 0.5
        return jnp.clip(wv, 0.0, 1.0)

    # -- aggregation -------------------------------------------------------
    def aggregate_stateful(self, updates, weights, ctx, state):
        global_flat = ctx["global"]
        deltas = updates - global_flat[None, :]
        hist = state + deltas
        wv = self.weights_from_history(hist)
        agg_delta = jnp.einsum("c,cd->d", wv, deltas) / jnp.maximum(
            jnp.sum(wv), self.eps)
        aux = {"fg_weights": wv}
        return global_flat + agg_delta, aux, hist

    def aggregate_with_aux(self, updates, weights, ctx=None):
        """Stateless fallback (one-shot history = this round's deltas)."""
        ctx = ctx or {}
        global_flat = ctx.get("global")
        if global_flat is None:
            global_flat = jnp.zeros((updates.shape[1],), updates.dtype)
        state = self.init_state(updates.shape[0], updates.shape[1])
        agg, aux, _ = self.aggregate_stateful(updates, weights,
                                              {"global": global_flat}, state)
        return agg, aux

    def detect(self, updates, weights, ctx=None):
        _, aux = self.aggregate_with_aux(updates, weights, ctx)
        return (aux["fg_weights"] < 0.5).astype(jnp.float32)

    def get_metrics(self) -> Dict[str, Any]:
        return {"defense_type": self.name, "eps": self.eps}
