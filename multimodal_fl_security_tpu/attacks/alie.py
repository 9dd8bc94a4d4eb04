"""ALIE — "A Little Is Enough" (Baruch, Baruch, Goldberg — NeurIPS'19).

Not present in the reference (its attack registry stops at
src/attacks/__init__.py:42-54); added because it is the canonical
*small-perturbation* Byzantine attack: instead of large malicious updates
(which Krum-style distance rules catch), every colluder submits

    crafted = benign_mean - z * benign_std        (coordinate-wise)

with z chosen just small enough that the crafted point still looks like a
plausible benign sample, so majority-based and distance-based rules accept
it while the accumulated bias derails training.

z selection (paper §3): with n clients and m colluders, the attackers need
s = floor(n/2 + 1) - m benign "supporters" whose updates are farther from
the mean than the crafted one. That holds when z <= Phi^-1((n - m - s) /
(n - m)), Phi the standard normal CDF. Config ``z`` overrides the derived
value.

TPU-native: one masked mean + one masked variance over the stacked [C, D]
matrix inside the jitted round; all colluders emit the same row.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
# Host scipy, NOT jax.scipy: alie_z is pure Python-float math evaluated at
# trace time, and a jnp ppf becomes an abstract tracer under shard_map's
# manual-mesh tracing (where nothing evaluates eagerly), breaking float().
from scipy.stats import norm

from multimodal_fl_security_tpu.attacks.base import ATTACKS, BaseAttack, masked_mean


def alie_z(num_clients: int, num_malicious: int) -> float:
    """The paper's z_max for n clients / m colluders (clipped to >= 0)."""
    n, m = int(num_clients), int(num_malicious)
    s = n // 2 + 1 - m
    denom = max(n - m, 1)
    phi = max(min((n - m - s) / denom, 1.0 - 1e-6), 0.5)
    return float(norm.ppf(phi))


@ATTACKS.register("alie")
class ALIEAttack(BaseAttack):
    name = "alie"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.num_malicious = int(self.config.get("num_malicious", 1))
        self.z = self.config.get("z")  # None = derive from (n, m)

    def poison_updates(self, key, updates, global_flat, malicious_mask,
                       num_clients):
        benign = 1.0 - malicious_mask
        mean = masked_mean(updates, benign)
        var = masked_mean(jnp.square(updates - mean[None, :]), benign)
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        z = (float(self.z) if self.z is not None
             else alie_z(num_clients, self.num_malicious))
        crafted = mean - z * std
        return jnp.where(malicious_mask[:, None] > 0,
                         jnp.broadcast_to(crafted[None, :], updates.shape),
                         updates)

    def is_model_poisoning(self) -> bool:
        return True

    def get_metrics(self) -> Dict[str, Any]:
        return {"attack_type": self.name,
                "z": self.z if self.z is not None else "derived",
                "num_malicious": self.num_malicious}
