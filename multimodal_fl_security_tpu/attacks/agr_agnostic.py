"""Min-Max / Min-Sum AGR-agnostic model-poisoning attacks
(Shejwalkar & Houmansadr, NDSS'21, "Manipulating the Byzantine").

Not present in the reference (its attack registry stops at
src/attacks/__init__.py:42-54); added because they are the standard strong
baselines against exactly the robust rules this framework ships
(Krum/Multi-Krum/Bulyan/trimmed-mean/median).

Crafted update: ``benign_mean + gamma * p`` where the perturbation ``p`` is
  - "std"  : -std(benign updates) per coordinate (strongest in the paper),
  - "sign" : -sign(benign_mean),
  - "unit" : -benign_mean / ||benign_mean||,
and gamma is the LARGEST value keeping the crafted update inside the benign
spread:
  Min-Max:  max_j ||crafted - u_j||  <=  max_{j,k} ||u_j - u_k||
  Min-Sum:  sum_j ||crafted - u_j||^2  <=  max_j sum_k ||u_j - u_k||^2
(j, k over benign clients).

TPU-native: because ||(mean - u_j) + gamma p||^2 is quadratic in gamma with
precomputable coefficients (||mean - u_j||^2, <mean - u_j, p>, ||p||^2),
the bisection over gamma is pure SCALAR math inside the jitted round — the
[C, D] matrix is read a fixed number of times regardless of the number of
bisection steps. All malicious clients emit the same crafted vector
(the colluding-sybil model of the paper).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.attacks.base import ATTACKS, BaseAttack, masked_mean

_BIG = jnp.float32(1e30)


class _AGRAgnosticAttack(BaseAttack):
    mode = "min_max"  # overridden by subclasses

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.perturbation = str(self.config.get("perturbation", "std"))
        self.gamma_max = float(self.config.get("gamma_max", 50.0))
        self.bisection_steps = int(self.config.get("bisection_steps", 20))

    def _perturbation(self, updates, benign_mask, mean):
        if self.perturbation == "sign":
            return -jnp.sign(mean)
        if self.perturbation == "unit":
            return -mean / jnp.maximum(jnp.linalg.norm(mean), 1e-12)
        # "std": coordinate-wise std over benign clients.
        var = masked_mean(jnp.square(updates - mean[None, :]), benign_mask)
        return -jnp.sqrt(jnp.maximum(var, 0.0))

    def poison_updates(self, key, updates, global_flat, malicious_mask,
                       num_clients):
        benign = 1.0 - malicious_mask
        mean = masked_mean(updates, benign)
        p = self._perturbation(updates, benign, mean)

        # Quadratic coefficients of ||(mean - u_j) + gamma p||^2 per client.
        a = mean[None, :] - updates                       # [C, D]
        a2 = jnp.sum(jnp.square(a), axis=1)               # ||a_j||^2   [C]
        ap = a @ p                                        # <a_j, p>    [C]
        p2 = jnp.sum(jnp.square(p))                       # ||p||^2     scalar

        # Benign pairwise squared distances (for the thresholds).
        sq = jnp.sum(jnp.square(updates), axis=1)
        gram = updates @ updates.T
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
        pair_mask = benign[:, None] * benign[None, :]
        d2b = jnp.where(pair_mask > 0, d2, 0.0)

        if self.mode == "min_max":
            threshold = jnp.max(d2b)

            def excess(gamma):
                crafted_d2 = a2 + 2.0 * gamma * ap + gamma * gamma * p2
                crafted_d2 = jnp.where(benign > 0, crafted_d2, 0.0)
                return jnp.max(crafted_d2) - threshold
        else:  # min_sum
            threshold = jnp.max(jnp.sum(d2b, axis=1) * benign)

            def excess(gamma):
                crafted_d2 = a2 + 2.0 * gamma * ap + gamma * gamma * p2
                return jnp.sum(crafted_d2 * benign) - threshold

        # Largest feasible gamma in [0, gamma_max] by bisection (the
        # feasible set {excess <= 0} is an interval containing 0: excess is
        # a max/sum of upward quadratics in gamma).
        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            ok = excess(mid) <= 0.0
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        lo, hi = jax.lax.fori_loop(
            0, self.bisection_steps, body,
            (jnp.float32(0.0), jnp.float32(self.gamma_max)),
        )
        gamma = lo
        crafted = mean + gamma * p
        # (No self._last_gamma stash: this body runs under jit, so the
        # assignment would leak a tracer onto the attack object — the
        # cached trace makes any later host read raise
        # UnexpectedTracerError instead of yielding the bisection result.)
        return jnp.where(malicious_mask[:, None] > 0,
                         jnp.broadcast_to(crafted[None, :], updates.shape),
                         updates)

    def is_model_poisoning(self) -> bool:
        return True

    def get_metrics(self) -> Dict[str, Any]:
        return {
            "attack_type": self.name,
            "perturbation": self.perturbation,
            "gamma_max": self.gamma_max,
        }


@ATTACKS.register("min_max")
class MinMaxAttack(_AGRAgnosticAttack):
    name = "min_max"
    mode = "min_max"


@ATTACKS.register("min_sum")
class MinSumAttack(_AGRAgnosticAttack):
    name = "min_sum"
    mode = "min_sum"
