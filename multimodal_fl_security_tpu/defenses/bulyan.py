"""Bulyan (El Mhamdi, Guerraoui, Rouault — ICML'18).

Not present in the reference (its defense registry stops at
src/defenses/__init__.py:39-54); added here because it composes the two
robust primitives this framework already accelerates — Krum selection over
the MXU Gram distance matrix and a coordinate-wise sorted reduction — into
the strongest classical Byzantine rule.

Algorithm (requires n >= 4f + 3):
  1. SELECTION: run Krum iteratively theta = n - 2f times; each iteration
     scores the still-active clients (sum of m - f - 2 nearest active
     distances, m = current active count) and moves the argmin into the
     selected set.
  2. AGGREGATION: over the theta selected updates, coordinate-wise sort and
     average the middle beta = theta - 2f values (the values closest to the
     coordinate median; for sorted data the closest-to-median window is the
     centered one, the standard Bulyan simplification).

TPU-native: the O(n^2) distances are ONE Gram matmul computed once
(ops/pairwise.py, Pallas-dispatched at large D); the theta selection
iterations are a ``lax.fori_loop`` over a [C] active mask doing masked
sorts of the fixed [C, C] matrix — no re-computation of distances; the
final reduction is one sort over the gathered [theta, D] block.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.defenses.base import DEFENSES, BaseDefense
from multimodal_fl_security_tpu.ops.pairwise import pairwise_dists

_INF = jnp.float32(jnp.inf)


@DEFENSES.register("bulyan")
class BulyanDefense(BaseDefense):
    name = "bulyan"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.num_malicious = int(self.config.get("num_malicious", 1))

    def _check(self, n: int) -> None:
        f = self.num_malicious
        if n < 4 * f + 3:
            raise ValueError(
                f"Bulyan requires n >= 4f + 3. Got n={n}, f={f}. "
                f"Need at least {4 * f + 3} clients."
            )

    def select_from_dists(self, dists: jnp.ndarray) -> jnp.ndarray:
        """Iterated-Krum selection from a precomputed [C, C] distance matrix.

        Split out so the parameter-sharded path (parallel/dshard.py) can
        feed a psum-reduced distance matrix.
        """
        n = dists.shape[0]
        f = self.num_malicious
        self._check(n)
        theta = n - 2 * f
        col = jnp.arange(n)

        def body(t, state):
            active, selected = state
            m = jnp.sum(active).astype(jnp.int32)  # active count this iter
            # Mask distances to inactive clients with +inf, sort each row,
            # and sum the m - f - 2 nearest non-self entries (sorted index
            # 0 is the zero self-distance of an active row).
            masked = jnp.where(active[None, :] > 0, dists, _INF)
            srt = jnp.sort(masked, axis=1)
            take = (col >= 1) & (col <= m - f - 2)
            scores = jnp.sum(jnp.where(take[None, :], srt, 0.0), axis=1)
            scores = jnp.where(active > 0, scores, _INF)
            best = jnp.argmin(scores)
            return active.at[best].set(0.0), selected.at[t].set(best)

        active0 = jnp.ones((n,), jnp.float32)
        selected0 = jnp.zeros((theta,), jnp.int32)
        _, selected = jax.lax.fori_loop(0, theta, body, (active0, selected0))
        return selected

    def select(self, updates: jnp.ndarray) -> jnp.ndarray:
        """Iterated-Krum selection: indices [theta] of the chosen clients."""
        return self.select_from_dists(pairwise_dists(updates))

    def aggregate_with_aux(self, updates, weights, ctx=None):
        n = updates.shape[0]
        f = self.num_malicious
        selected = self.select(updates)
        theta = selected.shape[0]
        block = updates[selected]                      # [theta, D]
        srt = jnp.sort(block, axis=0)
        agg = jnp.mean(srt[f : theta - f], axis=0)     # beta = theta - 2f
        mask = jnp.zeros((n,), jnp.float32).at[selected].set(1.0)
        return agg, {"selected_mask": mask, "num_selected": jnp.int32(theta)}

    def detect(self, updates, weights, ctx=None):
        _, aux = self.aggregate_with_aux(updates, weights, ctx)
        return 1.0 - aux["selected_mask"]

    def get_metrics(self) -> Dict[str, Any]:
        return {"defense_type": self.name,
                "num_malicious": self.num_malicious}
