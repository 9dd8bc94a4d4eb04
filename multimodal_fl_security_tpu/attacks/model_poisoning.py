"""Model (update-space) poisoning attacks, vectorized over the client axis.

Parity with the reference (reference: src/attacks/model_poisoning.py):
  - ``ModelReplacementAttack``: delta = update - global, scaled by
    boost_factor or (num_clients / num_malicious) * scale_factor, re-added to
    the global params (:48-80);
  - ``AdaptiveKrumAttack``: estimate the benign center and emit
    center + perturbation_scale * noise, evading Krum's distance scoring
    (:125-198);
  - ``ScalingAttack``: multiply the raw parameter vector by ``scale`` (:229-236);
  - ``InnerProductManipulationAttack``: -epsilon * sign(benign_mean), or
    plain negation when no benign mean is available (:266-284).

The reference applied these one client at a time on host tensors (and never
at all in its simulation path, SURVEY.md §2.9-2). Here each attack is one
masked transform of the whole [C, D] matrix inside the jitted round: benign
statistics (center/mean) are masked reductions over the same matrix.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.attacks.base import ATTACKS, BaseAttack, masked_mean


@ATTACKS.register("model_replacement")
class ModelReplacementAttack(BaseAttack):
    name = "model_replacement"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.scale_factor = float(self.config.get("scale_factor", 10.0))
        self.num_malicious = int(self.config.get("num_malicious", 1))
        self.boost_factor = self.config.get("boost_factor", None)

    def poison_updates(self, key, updates, global_flat, malicious_mask,
                       num_clients):
        if self.boost_factor is not None:
            scale = float(self.boost_factor)
        else:
            scale = (num_clients / max(self.num_malicious, 1)) * self.scale_factor
        deltas = updates - global_flat[None, :]
        boosted = global_flat[None, :] + deltas * scale
        return jnp.where(malicious_mask[:, None] > 0, boosted, updates)

    def is_model_poisoning(self) -> bool:
        return True

    def get_metrics(self):
        return {
            "attack_type": self.name,
            "scale_factor": self.scale_factor,
            "num_malicious": self.num_malicious,
        }


@ATTACKS.register("adaptive_krum")
class AdaptiveKrumAttack(BaseAttack):
    name = "adaptive_krum"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.perturbation_scale = float(self.config.get("perturbation_scale", 0.1))

    def poison_updates(self, key, updates, global_flat, malicious_mask,
                       num_clients):
        benign_mask = 1.0 - malicious_mask
        center = masked_mean(updates, benign_mask)
        noise = self.perturbation_scale * jax.random.normal(
            key, updates.shape, updates.dtype
        )
        crafted = center[None, :] + noise
        return jnp.where(malicious_mask[:, None] > 0, crafted, updates)

    def is_model_poisoning(self) -> bool:
        return True

    def get_metrics(self):
        return {
            "attack_type": self.name,
            "perturbation_scale": self.perturbation_scale,
        }


@ATTACKS.register("scaling")
class ScalingAttack(BaseAttack):
    name = "scaling"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.scale = float(self.config.get("scale", 10.0))

    def poison_updates(self, key, updates, global_flat, malicious_mask,
                       num_clients):
        return jnp.where(malicious_mask[:, None] > 0, updates * self.scale, updates)

    def is_model_poisoning(self) -> bool:
        return True

    def get_metrics(self):
        return {"attack_type": self.name, "scale": self.scale}


@ATTACKS.register("ipm")
class InnerProductManipulationAttack(BaseAttack):
    """Xie et al., "Fall of Empires": negative-inner-product updates."""

    name = "ipm"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.epsilon = float(self.config.get("epsilon", 0.1))
        # The reference negates the raw update when no benign mean is known
        # (model_poisoning.py:270-272); with the stacked matrix the benign
        # mean is always available, so sign-flipping is the default mode.
        self.use_benign_mean = bool(self.config.get("use_benign_mean", True))

    def poison_updates(self, key, updates, global_flat, malicious_mask,
                       num_clients):
        if self.use_benign_mean:
            benign_mask = 1.0 - malicious_mask
            benign_mean = masked_mean(updates, benign_mask)
            crafted = -self.epsilon * jnp.sign(benign_mean)
            crafted = jnp.broadcast_to(crafted[None, :], updates.shape)
        else:
            crafted = -updates
        return jnp.where(malicious_mask[:, None] > 0, crafted, updates)

    def is_model_poisoning(self) -> bool:
        return True

    def get_metrics(self):
        return {"attack_type": self.name, "epsilon": self.epsilon}
