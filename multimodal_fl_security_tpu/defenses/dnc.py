"""DnC — Divide-and-Conquer spectral defense
(Shejwalkar & Houmansadr, NDSS'21, Algorithm 1).

Not present in the reference (its registry stops at
src/defenses/__init__.py:39-54); added because it is the strongest
published defense against the AGR-agnostic Min-Max/Min-Sum and ALIE
attacks this framework ships (attacks/agr_agnostic.py, attacks/alie.py):
colluding small-perturbation attackers shift the update distribution
along a common direction, which is exactly what the top singular vector
of the centered update matrix exposes.

Per iteration:
  1. subsample ``sub_dim`` coordinates of the [C, D] update matrix;
  2. center the sub-matrix and take its top right singular vector v
     (power iteration on the [C, C] Gram — C is small, so the O(C^2)
     eigenproblem costs nothing next to the [C, D] reads);
  3. outlier score_i = <centered_i, v>^2; mark the ``c * f`` highest
     scores as outliers;
  4. good set = clients below the cutoff.
Final good set = INTERSECTION over ``niters`` random coordinate draws;
aggregate = example-count-weighted mean of the good set.

TPU-native: the whole procedure is masked linear algebra inside the
jitted round — one gather of [C, sub_dim], a fori_loop power iteration,
top_k for the cutoff; no data-dependent shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.defenses.base import DEFENSES, BaseDefense
from multimodal_fl_security_tpu.ops.reductions import weighted_mean


@DEFENSES.register("dnc")
class DnCDefense(BaseDefense):
    name = "dnc"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.num_malicious = int(self.config.get("num_malicious", 1))
        self.niters = int(self.config.get("niters", 3))
        self.sub_dim = int(self.config.get("sub_dim", 10000))
        #: the paper's filter multiplier: remove c * f clients per iteration
        self.filter_frac = float(self.config.get("filter_frac", 1.0))
        self.power_iters = int(self.config.get("power_iters", 10))

    # ------------------------------------------------------------------
    def _keep_mask_one_iter(self, updates: jnp.ndarray,
                            key: jnp.ndarray) -> jnp.ndarray:
        c, d = updates.shape
        b = min(self.sub_dim, d)
        # With-replacement draw: O(b) instead of choice(replace=False)'s
        # full D-length permutation (an O(D log D) sort + a D-sized int
        # array per iteration — ~100 MB at ResNet-50 scale). Collisions
        # double-count ~b^2/2D coordinates (<0.2% at the default
        # sub_dim=1e4 on SimpleCNN), statistically immaterial to the
        # spectral score.
        idx = jax.random.randint(key, (b,), 0, d)
        sub = updates[:, idx]                          # [C, b]
        centered = sub - jnp.mean(sub, axis=0, keepdims=True)

        # Top right singular vector via power iteration on the [C, C] Gram:
        # if G = centered @ centered.T and u its top eigenvector, then
        # v = centered.T @ u / ||.|| is the top right singular vector.
        gram = centered @ centered.T                   # [C, C]
        u0 = jnp.ones((c,), centered.dtype) / jnp.sqrt(jnp.float32(c))

        def body(_, u):
            u = gram @ u
            return u / jnp.maximum(jnp.linalg.norm(u), 1e-12)

        u = jax.lax.fori_loop(0, self.power_iters, body, u0)
        proj = centered.T @ u                          # ∝ v (unnormalized)
        v = proj / jnp.maximum(jnp.linalg.norm(proj), 1e-12)

        scores = jnp.square(centered @ v)              # [C]
        n_remove = min(
            max(int(self.filter_frac * self.num_malicious), 1), c - 1
        )
        # Highest-score clients are the outliers.
        cutoff = jnp.sort(scores)[c - n_remove - 1]
        return (scores <= cutoff).astype(jnp.float32)

    def _keep_mask(self, updates: jnp.ndarray, ctx) -> jnp.ndarray:
        """Intersection of the per-iteration good sets (shared by
        aggregate and detect so the two can never silently diverge)."""
        key = (ctx or {}).get("key")
        if key is None:
            # A fixed fallback would inspect the SAME coordinates every
            # round — an adaptive attacker could hide its shift in the
            # never-sampled ones. Fail loudly instead.
            raise ValueError(
                "dnc requires ctx['key'] (a fresh per-round PRNG key) for "
                "its coordinate subsampling"
            )
        keep = jnp.ones((updates.shape[0],), jnp.float32)
        for i in range(self.niters):
            keep = keep * self._keep_mask_one_iter(
                updates, jax.random.fold_in(key, i)
            )
        return keep

    # ------------------------------------------------------------------
    def aggregate_with_aux(self, updates, weights, ctx=None):
        keep = self._keep_mask(updates, ctx)
        # Degenerate all-filtered case (tiny C with aggressive filtering):
        # fall back to plain FedAvg rather than a zero model.
        any_kept = jnp.sum(keep) > 0
        w = jnp.where(any_kept, weights * keep, weights)
        agg = weighted_mean(updates, w)
        return agg, {
            "dnc_num_kept": jnp.sum(keep),
            "dnc_filtered_weight": jnp.sum(weights * (1.0 - keep)),
        }

    def detect(self, updates, weights, ctx=None):
        return 1.0 - self._keep_mask(updates, ctx)

    def get_metrics(self) -> Dict[str, Any]:
        return {"defense_type": self.name, "niters": self.niters,
                "sub_dim": self.sub_dim, "filter_frac": self.filter_frac,
                "num_malicious": self.num_malicious}
