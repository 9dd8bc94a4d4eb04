"""Krum / Multi-Krum (Blanchard et al., NeurIPS'17).

Semantics parity with the reference (reference: src/defenses/krum.py:55-237):
  - pairwise *Euclidean* (unsquared) distances between flattened updates;
  - score_i = sum of the n - f - 2 smallest distances from i (self excluded);
  - single Krum returns the argmin update; Multi-Krum returns the unweighted
    mean of the ``multi_k`` lowest-scoring updates;
  - requires n >= 2f + 3 (raises at construction/first use, host-side);
  - detect_malicious = the non-selected clients (reference: krum.py:194-209).

TPU-native: the reference's O(n^2) Python loop of torch.norm calls becomes a
single MXU Gram matmul (ops/pairwise.py), the per-row sort is one
``jnp.sort`` over the [C, C] matrix, and selection is a top_k — the whole
rule is a few fused XLA ops inside the jitted round program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.defenses.base import DEFENSES, BaseDefense
from multimodal_fl_security_tpu.ops.pairwise import pairwise_dists


class KrumDefense(BaseDefense):
    name = "krum"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.num_malicious = int(self.config.get("num_malicious", 1))
        self.multi_k = int(self.config.get("multi_k", 1))

    def _check(self, n: int) -> None:
        f = self.num_malicious
        if n < 2 * f + 3:
            raise ValueError(
                f"Krum requires n >= 2f + 3. Got n={n}, f={f}. "
                f"Need at least {2 * f + 3} clients."
            )

    def scores_from_dists(self, dists: jnp.ndarray) -> jnp.ndarray:
        """Krum scores from a precomputed [C, C] distance matrix.

        Split out so the parameter-sharded path (parallel/dshard.py) can
        feed a psum-reduced Gram distance matrix without re-gathering the
        full [C, D] update matrix on every device.
        """
        n = dists.shape[0]
        self._check(n)
        num_neighbors = n - self.num_malicious - 2
        srt = jnp.sort(dists, axis=1)
        # srt[:, 0] is the zero self-distance; sum the next num_neighbors.
        return jnp.sum(srt[:, 1 : num_neighbors + 1], axis=1)

    def scores(self, updates: jnp.ndarray) -> jnp.ndarray:
        """Krum score per client: sum of n-f-2 nearest neighbor distances."""
        return self.scores_from_dists(pairwise_dists(updates))

    def aggregate_with_aux(self, updates, weights, ctx=None):
        n = updates.shape[0]
        k = min(self.multi_k, n)
        scores = self.scores(updates)
        # Lowest-k scores win. argsort matches the reference's np.argsort
        # stable tie order (reference: krum.py:172-175).
        order = jnp.argsort(scores)
        selected = order[:k]
        selected_mask = jnp.zeros((n,), jnp.float32).at[selected].set(1.0)
        if k == 1:
            agg = updates[selected[0]]
        else:
            agg = jnp.mean(updates[selected], axis=0)
        aux = {
            "krum_scores": scores,
            "selected_mask": selected_mask,
            "selected_first": selected[0],
        }
        return agg, aux

    def detect(self, updates, weights, ctx=None):
        _, aux = self.aggregate_with_aux(updates, weights, ctx)
        return 1.0 - aux["selected_mask"]

    def get_metrics(self) -> Dict[str, Any]:
        return {
            "defense_type": self.name,
            "num_malicious": self.num_malicious,
            "multi_k": self.multi_k,
        }


@DEFENSES.register("krum")
def _make_krum(config):
    return KrumDefense(config)


@DEFENSES.register("multi_krum")
def _make_multi_krum(config):
    cfg = dict(config or {})
    # Reference default: multi_k = default_k (3) when unset (krum.py:225-237).
    cfg.setdefault("multi_k", cfg.get("default_k", 3))
    d = KrumDefense(cfg)
    d.name = "multi_krum"
    return d
