"""Differential-privacy accounting.

The reference's accountant is dimensionally broken (SURVEY.md §2.9-6:
``eps = sqrt(2 ln(1.25/delta)) / sigma`` with naive linear composition, and
never consulted by training). This module provides a correct Renyi-DP
accountant for the subsampled/unsubsampled Gaussian mechanism with
composition over rounds, alongside the reference-compatible formula (kept in
defenses/differential_privacy.py) for artifact parity.

RDP of the Gaussian mechanism with noise multiplier z (= sigma/sensitivity):
    eps_RDP(alpha) = alpha / (2 z^2)
Composition over T rounds multiplies by T; conversion to (eps, delta)-DP:
    eps = min_alpha [ eps_RDP(alpha) * T + log(1/delta) / (alpha - 1) ]
(Mironov 2017, Prop. 3; standard orders grid.)
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

DEFAULT_ORDERS = tuple([1 + x / 10.0 for x in range(1, 100)]
                       + list(range(12, 64)) + [128, 256, 512])


class RDPAccountant:
    """Tracks Gaussian-mechanism rounds and converts RDP -> (eps, delta)."""

    def __init__(self, noise_multiplier: float,
                 orders: Iterable[float] = DEFAULT_ORDERS):
        if noise_multiplier <= 0:
            raise ValueError("noise_multiplier must be positive")
        self.z = float(noise_multiplier)
        self.orders = tuple(float(a) for a in orders if a > 1)
        self.steps = 0

    def step(self, n: int = 1) -> None:
        self.steps += n

    def rdp(self, alpha: float) -> float:
        """Accumulated RDP at order alpha."""
        return self.steps * alpha / (2.0 * self.z ** 2)

    def epsilon(self, delta: float = 1e-5,
                steps: Optional[int] = None) -> float:
        """(eps, delta)-DP via the optimal order on the grid."""
        t = self.steps if steps is None else steps
        if t == 0:
            return 0.0
        best = math.inf
        for a in self.orders:
            eps = t * a / (2.0 * self.z ** 2) + math.log(1.0 / delta) / (a - 1.0)
            best = min(best, eps)
        return best

    def summary(self, delta: float = 1e-5) -> dict:
        return {
            "noise_multiplier": self.z,
            "rounds": self.steps,
            "delta": delta,
            "epsilon": self.epsilon(delta),
        }
