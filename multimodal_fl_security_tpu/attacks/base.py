"""Attack base contract.

Parity with the reference's BaseAttack ABC
(reference: src/attacks/base_attack.py:14-107): the dual
data-poisoning/model-poisoning interface, classification flags, and
per-attack metrics. The model-poisoning surface is vectorized — one call
transforms the whole [C, D] update matrix under a malicious mask — so it can
live inside the jitted round.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.core.registry import Registry
from multimodal_fl_security_tpu.data.datasets import Dataset

ATTACKS: Registry = Registry("attack")


def get_attack(attack_type: str, config: Optional[Dict[str, Any]] = None):
    """Factory, mirroring the reference's get_attack (attacks/__init__.py:31-59)."""
    return ATTACKS.create(attack_type or "none", config or {})


class BaseAttack:
    name = "base"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        self.config = dict(config or {})
        self.seed = int(self.config.get("seed", 42))
        self.num_poisoned = 0
        self.poisoned_indices: list = []

    # -- data poisoning (host-side one-time transform of a client shard) ----
    def poison_dataset(self, dataset: Dataset) -> Dataset:
        """Transform a client's shard. Default: passthrough."""
        return dataset

    # -- model poisoning (on-device, inside the jitted round) ---------------
    def poison_updates(
        self,
        key: jnp.ndarray,
        updates: jnp.ndarray,        # [C, D] new parameter vectors
        global_flat: jnp.ndarray,    # [D]
        malicious_mask: jnp.ndarray,  # [C] 1.0 where malicious
        num_clients: int,
    ) -> jnp.ndarray:
        """Transform the stacked update matrix. Default: passthrough."""
        return updates

    # -- ASR evaluation ------------------------------------------------------
    def create_poisoned_testset(self, testset: Dataset) -> Optional[Dataset]:
        """Triggered eval set for ASR, or None if the attack has no trigger."""
        return None

    # -- classification ------------------------------------------------------
    def is_data_poisoning(self) -> bool:
        return False

    def is_model_poisoning(self) -> bool:
        return False

    def get_metrics(self) -> Dict[str, Any]:
        return {"attack_type": self.name, "num_poisoned": self.num_poisoned}


@ATTACKS.register("none")
class NoAttack(BaseAttack):
    """Null attack (reference: base_attack.py:79-107)."""

    name = "none"


def masked_mean(updates: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over rows where mask==1 (returns zeros if mask is empty).

    Shared by every update-space attack that estimates benign statistics
    (model_poisoning, alie, agr_agnostic)."""
    total = jnp.maximum(jnp.sum(mask), 1e-12)
    return jnp.einsum("c,cd->d", mask, updates) / total


def choose_poison_indices(num_candidates: int, poison_ratio: float,
                          seed: int) -> np.ndarray:
    """Seeded exact-count selection, matching the reference's
    np.random.choice(replace=False) convention (e.g. backdoor.py:263-278)."""
    num = int(num_candidates * poison_ratio)
    rng = np.random.RandomState(seed)
    if num <= 0:
        return np.zeros((0,), np.int64)
    return rng.choice(num_candidates, size=num, replace=False).astype(np.int64)
