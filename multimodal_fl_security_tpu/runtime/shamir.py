"""Shamir secret sharing over GF(p), p = 2^521 - 1 (Mersenne).

Used by the secure-aggregation runtime (runtime/secure_agg.py) to make
unmasking dropout-robust, as in Bonawitz et al. CCS'17 §4: every client
t-of-n shares (a) its per-round self-mask seed and (b) its DH private
key among all round participants, so the server can reconstruct

  * b_i of a CONTRIBUTOR (to remove its self-mask) even if that
    contributor dies after submitting its masked vector, and
  * x_d of a DROPPED client (to recompute and strip every pairwise mask
    it owed) without any survivor having to be individually available —

any t of the n shareholders suffice. The security invariant (enforced by
the clients, see SecAggClient.unmask_reply) is that no owner's b and x
are ever BOTH revealed: contributors reveal b only, dropped reveal x
only.

Secrets here are 256-bit integers (32-byte seeds, 256-bit DH exponents),
far below p, so encoding is direct. Shares are evaluated at x = 1..n;
reconstruction is Lagrange interpolation at 0.
"""

from __future__ import annotations

import secrets as _secrets
from typing import Dict, Iterable, List, Tuple

#: 13th Mersenne prime exponent 521: p = 2^521 - 1
PRIME = (1 << 521) - 1


def split_secret(secret: int, holders: Iterable[int], threshold: int,
                 ) -> Dict[int, int]:
    """Share ``secret`` among ``holders`` (share index = holder id + 1,
    so ids may be any non-negative ints); any ``threshold`` shares
    reconstruct, fewer reveal nothing (information-theoretically)."""
    holders = list(holders)
    t = int(threshold)
    if not 1 <= t <= len(holders):
        raise ValueError(f"threshold {t} not in [1, {len(holders)}]")
    if not 0 <= secret < PRIME:
        raise ValueError("secret out of field range")
    coeffs = [secret] + [_secrets.randbelow(PRIME) for _ in range(t - 1)]

    def poly(x: int) -> int:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % PRIME
        return acc

    return {h: poly(h + 1) for h in holders}


def combine_shares(shares: Dict[int, int]) -> int:
    """Lagrange interpolation at 0 from {holder_id: share}. The caller is
    responsible for providing at least ``threshold`` shares — with fewer,
    the result is uniformly wrong, not an error."""
    points: List[Tuple[int, int]] = [(h + 1, y) for h, y in shares.items()]
    if not points:
        raise ValueError("no shares")
    secret = 0
    for i, (xi, yi) in enumerate(points):
        num, den = 1, 1
        for j, (xj, _) in enumerate(points):
            if i == j:
                continue
            num = (num * (-xj)) % PRIME
            den = (den * (xi - xj)) % PRIME
        secret = (secret + yi * num * pow(den, PRIME - 2, PRIME)) % PRIME
    return secret
