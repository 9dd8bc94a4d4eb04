"""Differential-privacy accounting.

The reference's accountant is dimensionally broken (SURVEY.md §2.9-6:
``eps = sqrt(2 ln(1.25/delta)) / sigma`` with naive linear composition, and
never consulted by training). This module provides a correct Renyi-DP
accountant for the Gaussian mechanism with composition over rounds,
alongside the reference-compatible formula (kept in
defenses/differential_privacy.py) for artifact parity.

RDP of the full-participation Gaussian mechanism with noise multiplier z
(= sigma/sensitivity):
    eps_RDP(alpha) = alpha / (2 z^2)
Composition over T rounds multiplies by T; conversion to (eps, delta)-DP:
    eps = min_alpha [ eps_RDP(alpha) * T + log(1/delta) / (alpha - 1) ]
(Mironov 2017, Prop. 3; standard orders grid.)

Subsampling amplification
-------------------------
When only a ``sampling_rate`` = q fraction of clients participates per
round (rounds/engine.py ``clients_per_round``), the per-round cost
shrinks: this accountant applies the Poisson-subsampled Gaussian RDP
bound at integer orders alpha >= 2 (Mironov, Talwar & Zhang 2019,
arXiv:1908.10530, eq. 9):

    eps_RDP(alpha) = 1/(alpha-1) * log( sum_{k=0}^{alpha}
        C(alpha, k) (1-q)^(alpha-k) q^k exp(k(k-1) / (2 z^2)) )

evaluated in log-space so small z / large alpha cannot overflow. At
q = 1 the sum telescopes to exp(alpha(alpha-1)/(2 z^2)) and the formula
reduces exactly to the full-participation line above. NOTE: the engine
samples a FIXED-SIZE subset without replacement, not Poisson — applying
the Poisson bound with q = k/C is the standard practical approximation
(as in TF-Privacy / Opacus, which account fixed-size batches the same
way); the two sampling schemes' bounds agree closely at these rates.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

DEFAULT_ORDERS = tuple([1 + x / 10.0 for x in range(1, 100)]
                       + list(range(12, 64)) + [128, 256, 512])


def _log_binom(n: int, k: int) -> float:
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def _logsumexp(vals) -> float:
    m = max(vals)
    if m == -math.inf:
        return -math.inf
    return m + math.log(sum(math.exp(v - m) for v in vals))


def subsampled_gaussian_rdp(q: float, z: float, alpha: int) -> float:
    """Per-step RDP of the Poisson-subsampled Gaussian at INTEGER order
    ``alpha`` >= 2 (module docstring; log-space evaluation)."""
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"sampling rate must be in [0, 1]; got {q}")
    if alpha < 2 or alpha != int(alpha):
        raise ValueError(f"subsampled bound needs integer alpha >= 2; got {alpha}")
    if q == 0.0:
        return 0.0
    if q == 1.0:
        return alpha / (2.0 * z * z)
    a = int(alpha)
    log_q, log_1q = math.log(q), math.log1p(-q)
    terms = []
    for k in range(a + 1):
        t = _log_binom(a, k) + (a - k) * log_1q + k * (k - 1) / (2.0 * z * z)
        if k > 0:
            t += k * log_q
        terms.append(t)
    return max(_logsumexp(terms), 0.0) / (a - 1.0)


class RDPAccountant:
    """Tracks Gaussian-mechanism rounds and converts RDP -> (eps, delta).

    ``sampling_rate`` < 1 switches to the subsampled bound (integer
    orders only — the grid's fractional orders are skipped there).
    """

    def __init__(self, noise_multiplier: float,
                 orders: Iterable[float] = DEFAULT_ORDERS,
                 sampling_rate: float = 1.0):
        if noise_multiplier <= 0:
            raise ValueError("noise_multiplier must be positive")
        if not (0.0 <= sampling_rate <= 1.0):
            raise ValueError("sampling_rate must be in [0, 1]")
        self.z = float(noise_multiplier)
        self.q = float(sampling_rate)
        self.orders = tuple(float(a) for a in orders if a > 1)
        if self.q < 1.0:
            usable = tuple(a for a in self.orders
                           if a >= 2 and a == int(a))
            if not usable:
                raise ValueError(
                    "subsampled accounting needs integer orders >= 2"
                )
            self._eval_orders = usable
        else:
            self._eval_orders = self.orders
        # Per-step RDP is step-count independent: precompute per order.
        self._per_step = {a: self._per_step_rdp(a) for a in self._eval_orders}
        self.steps = 0

    def _per_step_rdp(self, alpha: float) -> float:
        if self.q >= 1.0:
            return alpha / (2.0 * self.z ** 2)
        return subsampled_gaussian_rdp(self.q, self.z, int(alpha))

    def step(self, n: int = 1) -> None:
        self.steps += n

    def rdp(self, alpha: float) -> float:
        """Accumulated RDP at order alpha."""
        return self.steps * self._per_step_rdp(alpha)

    def epsilon(self, delta: float = 1e-5,
                steps: Optional[int] = None) -> float:
        """(eps, delta)-DP via the optimal order on the grid."""
        t = self.steps if steps is None else steps
        if t == 0:
            return 0.0
        best = math.inf
        for a in self._eval_orders:
            eps = t * self._per_step[a] + math.log(1.0 / delta) / (a - 1.0)
            best = min(best, eps)
        return best

    def summary(self, delta: float = 1e-5) -> dict:
        return {
            "noise_multiplier": self.z,
            "sampling_rate": self.q,
            "rounds": self.steps,
            "delta": delta,
            "epsilon": self.epsilon(delta),
        }
