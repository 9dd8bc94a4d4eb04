"""DP-SGD-style aggregation, gradient clipping, norm bounding.

Semantics parity with the reference (reference: src/defenses/differential_privacy.py):
  - DP-SGD: per-client L2 clip to ``clip_norm`` (:74-95), example-weighted
    mean, Gaussian noise with std = clip_norm * noise_multiplier / n (:97-119);
  - GradientClipping: clip-only, l2 or linf (:202-280);
  - NormBounding: reject clients whose update norm falls outside
    [min_norm, max_norm]; if every client is rejected, fall back to accepting
    all (:283-349).

Privacy accounting: the reference's per-round epsilon
``sqrt(2 ln(1.25/delta)) / sigma`` with naive linear composition (:166-184)
is dimensionally broken (SURVEY.md §2.9-6) — it treats the noise multiplier
as if it were the noise *scale* relative to sensitivity. We expose that exact
formula as ``reference_epsilon_per_round`` for artifact parity, and a correct
Gaussian-mechanism accountant (noise_multiplier = sigma/sensitivity, basic
composition over rounds) as the default ``privacy_spent``.

Noise is drawn on-device from ctx["key"]; the defense stays jit-pure.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.defenses.base import DEFENSES, BaseDefense
from multimodal_fl_security_tpu.ops.reductions import (
    clip_rows,
    row_norms,
    weighted_mean,
)


@DEFENSES.register("dp_sgd", "dp")
class DPSGDDefense(BaseDefense):
    name = "dp_sgd"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        # Reference defaults (differential_privacy.py:46-48). NOTE: the rule
        # clips each client's FULL parameter vector; with clip_norm << the
        # model's weight norm this collapses the global model — the
        # reference's paper grid (clip 1.0) has this exact property.
        self.clip_norm = float(self.config.get("clip_norm", 10.0))
        self.noise_multiplier = float(self.config.get("noise_multiplier", 0.005))
        self.delta = float(self.config.get("delta", 1e-5))
        self.rounds_applied = 0  # stepped by account_round() on the host
        # Noise std is clip_norm * z / n while per-client sensitivity of the
        # weighted mean is ~clip_norm / n, so the accountant's effective
        # noise multiplier (sigma / sensitivity) is z itself.
        # ``sampling_rate`` < 1 (set by the runner from clients_per_round /
        # num_clients, or via config) turns on subsampling amplification
        # (utils/privacy.py, Poisson bound at q = k/C).
        self.sampling_rate = float(self.config.get("sampling_rate", 1.0))
        self._weight_ratio = 1.0
        self._accountant = None
        if self.noise_multiplier > 0:
            self._rebuild_accountant()

    def _rebuild_accountant(self) -> None:
        from multimodal_fl_security_tpu.utils.privacy import RDPAccountant

        steps = self._accountant.steps if self._accountant is not None else 0
        self._accountant = RDPAccountant(
            self.noise_multiplier * self._weight_ratio,
            sampling_rate=self.sampling_rate,
        )
        self._accountant.step(steps)  # preserve rounds already applied

    def aggregate_with_aux(self, updates, weights, ctx=None):
        # NOTE: traced under jit — NO host-side accounting here (a Python
        # counter in this body would tick once per compile, not per round;
        # the reference has the same structural flaw, SURVEY.md §2.9-6).
        # The round loop calls account_round() after each applied round.
        n = updates.shape[0]
        clipped = clip_rows(updates, self.clip_norm)
        mean = weighted_mean(clipped, weights)
        std = self.clip_norm * self.noise_multiplier / n
        key = (ctx or {}).get("key")
        if key is None:
            # A fixed fallback key would re-add the IDENTICAL noise vector
            # every round — deterministic bias, not privacy. Fail loudly.
            raise ValueError(
                "dp_sgd requires ctx['key'] (a fresh per-round PRNG key); "
                "the round engine, TCP server, and fedbuff paths all "
                "provide one"
            )
        noise = std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean + noise, {"dp_noise_std": jnp.float32(std)}

    # -- accounting (host-side) --------------------------------------------
    def set_client_weights(self, weights) -> None:
        """Tighten accounting to the actual weighted-mean sensitivity.

        Noise std is ``clip * z / n`` but the weighted mean's per-client
        sensitivity is ``clip * w_i / sum_w`` — for the heaviest client
        that is ``clip * max_w / sum_w``, not ``clip / n``, so with
        heterogeneous example counts the effective noise multiplier is
        ``z * sum_w / (n * max_w)`` (== z only when weights are uniform).
        Callers that know the client example counts (the runner does)
        should install them BEFORE training so privacy_spent() reports
        the worst-case-client epsilon instead of underestimating it.
        """
        import numpy as np

        w = np.asarray(weights, np.float64)
        if w.size == 0 or self._accountant is None:
            return
        self._weight_ratio = float(w.sum() / (w.size * w.max()))
        self._rebuild_accountant()

    def set_sampling_rate(self, q: float) -> None:
        """Enable subsampling amplification at participation rate ``q``
        (= clients_per_round / num_clients). Called by the runner when the
        engine subsamples clients; preserves rounds already accounted."""
        self.sampling_rate = float(q)
        if self._accountant is not None:
            self._rebuild_accountant()

    def account_round(self, n: int = 1) -> None:
        """Record ``n`` applied rounds; called by the training loop."""
        self.rounds_applied += n
        if self._accountant is not None:
            self._accountant.step(n)

    def reference_epsilon_per_round(self) -> float:
        """The reference's (broken) per-round epsilon, for artifact parity."""
        if self.noise_multiplier <= 0:
            return float("inf")
        return math.sqrt(2.0 * math.log(1.25 / self.delta)) / self.noise_multiplier

    def privacy_spent(self, rounds: Optional[int] = None) -> Dict[str, float]:
        """Cumulative privacy cost.

        ``epsilon`` is the correct RDP-composed Gaussian-mechanism value
        (utils/privacy.py); ``reference_epsilon`` is the reference's naive
        linear formula, reported for artifact parity.
        """
        r = self.rounds_applied if rounds is None else rounds
        if self._accountant is not None:
            eps = self._accountant.epsilon(self.delta, steps=r)
        else:
            eps = float("inf")
        return {
            "epsilon": eps,
            "reference_epsilon": self.reference_epsilon_per_round() * r,
            "delta": self.delta,
            "rounds": r,
        }

    def get_metrics(self):
        return {
            "defense_type": self.name,
            "clip_norm": self.clip_norm,
            "noise_multiplier": self.noise_multiplier,
            **{f"privacy_{k}": v for k, v in self.privacy_spent().items()},
        }


@DEFENSES.register("gradient_clipping", "clipping")
class GradientClippingDefense(BaseDefense):
    name = "gradient_clipping"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.clip_norm = float(self.config.get("clip_norm", 1.0))
        self.norm_type = str(self.config.get("norm_type", "l2"))

    def aggregate_with_aux(self, updates, weights, ctx=None):
        if self.norm_type == "linf":
            clipped = jnp.clip(updates, -self.clip_norm, self.clip_norm)
        else:
            clipped = clip_rows(updates, self.clip_norm, ord="l2")
        num_clipped = jnp.sum(
            (row_norms(updates, self.norm_type) > self.clip_norm).astype(jnp.float32)
        )
        return weighted_mean(clipped, weights), {"num_clipped": num_clipped}

    def get_metrics(self):
        return {
            "defense_type": self.name,
            "clip_norm": self.clip_norm,
            "norm_type": self.norm_type,
        }


@DEFENSES.register("norm_bounding")
class NormBoundingDefense(BaseDefense):
    name = "norm_bounding"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.min_norm = float(self.config.get("min_norm", 0.0))
        self.max_norm = float(self.config.get("max_norm", 100.0))

    def _valid_mask(self, updates: jnp.ndarray) -> jnp.ndarray:
        norms = row_norms(updates)
        valid = jnp.logical_and(norms >= self.min_norm, norms <= self.max_norm)
        valid = valid.astype(jnp.float32)
        # Fallback: if every client is rejected, accept all
        # (reference: differential_privacy.py:334-340).
        any_valid = jnp.sum(valid) > 0
        return jnp.where(any_valid, valid, jnp.ones_like(valid))

    def aggregate_with_aux(self, updates, weights, ctx=None):
        valid = self._valid_mask(updates)
        agg = weighted_mean(updates, weights * valid)
        return agg, {"accepted_mask": valid, "num_rejected": jnp.sum(1.0 - valid)}

    def detect(self, updates, weights, ctx=None):
        return 1.0 - self._valid_mask(updates)

    def get_metrics(self):
        return {
            "defense_type": self.name,
            "min_norm": self.min_norm,
            "max_norm": self.max_norm,
        }
