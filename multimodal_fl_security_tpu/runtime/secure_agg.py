"""Secure aggregation for the distributed TCP runtime.

Simplified Bonawitz et al. (CCS'17) pairwise-masking protocol: the server
learns ONLY the weighted SUM of client updates, never an individual
update. Beyond-reference — the reference's Flower path ships every
client's full parameter vector to the server in the clear
(reference: src/server/robust_server.py:95-104).

Protocol
--------
1. Key agreement: every client generates an ephemeral finite-field
   Diffie-Hellman keypair (RFC 3526 2048-bit MODP group, stdlib ``pow``);
   public keys are relayed through the server. Each pair (i, j) then
   shares a secret only they can compute.
2. Masking: client i fixed-point-encodes ``weight_i * delta_i`` (delta
   from the broadcast global, so magnitudes stay small) into int64,
   reinterprets mod 2**64, and adds a pairwise mask vector
   ``sign(i, j) * PRG(seed_ij, round)`` for every OTHER participant j of
   the round, where ``seed_ij = SHA-256(DH(i, j) || round)`` and sign is
   +1 for i < j, -1 for i > j. Uint64 addition wraps, so each mask is a
   one-time pad; in the SUM over all participants the masks cancel
   exactly (pair antisymmetry), leaving sum_i enc(w_i * delta_i).
3. Decoding: the server sums the masked vectors mod 2**64, reinterprets
   as signed int64, divides by the fixed-point scale and sum(w), and adds
   the global back: ``new_global = global + sum w_i d_i / sum w_i``.
4. Dropout recovery: if client j dies after the round's masks were
   committed (fit sent, no reply), every SURVIVOR i reveals seed_ij to
   the server, which recomputes and subtracts the uncancelled
   ``sign(i, j) * PRG(seed_ij)`` terms. (Full SecAgg uses Shamir shares
   so that even a survivor dying mid-unmask is recoverable; here that
   rare double-fault aborts the round — the server keeps the previous
   global and continues.)

What the server still sees: per-client example counts and training-loss
metrics (cleartext, like the reference), and the exact participant set.
What it can no longer see: any individual model update — so secure
aggregation composes only with defenses that never inspect per-client
updates (weighted FedAvg). The server enforces that at construction.

Overflow headroom: |enc| <= weight * clip * scale; with the defaults
(scale 2**16, clip 32) a client with 10**6 examples stays below 2**51,
and 2**12 such clients below the 2**63 signed boundary.
"""

from __future__ import annotations

import hashlib
import secrets
from typing import Dict, Iterable, List, Optional

import numpy as np

# RFC 3526 group 14: 2048-bit MODP prime, generator 2.
DH_PRIME = int(
    "FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E08"
    "8A67CC74020BBEA63B139B22514A08798E3404DDEF9519B3CD3A431B"
    "302B0A6DF25F14374FE1356D6D51C245E485B576625E7EC6F44C42E9"
    "A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F24117C4B1FE6"
    "49286651ECE45B3DC2007CB8A163BF0598DA48361C55D39A69163FA8"
    "FD24CF5F83655D23DCA3AD961C62F356208552BB9ED529077096966D"
    "670C354E4ABC9804F1746C08CA18217C32905E462E36CE3BE39E772C"
    "180E86039B2783A2EC07A28FB5C55DF06F4C52C9DE2BCBF695581718"
    "3995497CEA956AE515D2261898FA051015728E5A8AACAA68FFFFFFFF"
    "FFFFFFFF",
    16,
)
DH_GENERATOR = 2

#: fixed-point scale for encoding weighted deltas
DEFAULT_SCALE = float(1 << 16)
#: per-coordinate clip on the delta before encoding (overflow headroom)
DEFAULT_CLIP = 32.0


def generate_keypair() -> tuple:
    """(private, public) ephemeral DH keypair."""
    x = secrets.randbits(256)
    return x, pow(DH_GENERATOR, x, DH_PRIME)


def shared_seed(private: int, peer_public: int, round_idx: int) -> bytes:
    """32-byte pairwise seed, symmetric in (i, j) and bound to the round."""
    s = pow(peer_public, private, DH_PRIME)
    material = s.to_bytes((DH_PRIME.bit_length() + 7) // 8, "big")
    return hashlib.sha256(
        material + round_idx.to_bytes(8, "big") + b"mfs-secagg-v1"
    ).digest()


def expand_mask(seed: bytes, dim: int) -> np.ndarray:
    """Deterministic uint64 mask vector from a 32-byte seed (Philox PRG)."""
    key = np.frombuffer(seed[:16], dtype=np.uint64)  # Philox takes 2 words
    gen = np.random.Generator(np.random.Philox(key=key))
    # Full-range uint64 draws: two uint32 halves, no bound-rejection cost.
    halves = gen.integers(0, 1 << 32, size=2 * dim, dtype=np.uint32)
    return (
        halves[:dim].astype(np.uint64) << np.uint64(32)
    ) | halves[dim:].astype(np.uint64)


def encode_fixed(vec: np.ndarray, scale: float = DEFAULT_SCALE,
                 clip: float = DEFAULT_CLIP) -> np.ndarray:
    """Float vector -> fixed-point int64 reinterpreted as uint64."""
    v = np.clip(np.asarray(vec, np.float64), -clip, clip)
    return np.rint(v * scale).astype(np.int64).astype(np.uint64)


def decode_fixed(acc: np.ndarray, scale: float = DEFAULT_SCALE) -> np.ndarray:
    """Uint64 accumulator (mod 2**64 sum) -> float64 vector."""
    return acc.astype(np.int64).astype(np.float64) / scale


class SecAggClient:
    """Client-side masking state for one FL run."""

    def __init__(self, client_id: int, scale: float = DEFAULT_SCALE,
                 clip: float = DEFAULT_CLIP):
        self.client_id = int(client_id)
        self.scale = float(scale)
        self.clip = float(clip)
        self._private, self.public = generate_keypair()
        self._peer_pubs: Dict[int, int] = {}

    # -- key exchange ------------------------------------------------------
    def public_key_hex(self) -> str:
        return format(self.public, "x")

    def set_peer_keys(self, pubs: Dict[str, str]) -> None:
        """Install the server-relayed {client_id: public_key_hex} directory."""
        self._peer_pubs = {
            int(cid): int(pub, 16)
            for cid, pub in pubs.items()
            if int(cid) != self.client_id
        }

    # -- masking -----------------------------------------------------------
    def _pair_seed(self, peer: int, round_idx: int) -> bytes:
        return shared_seed(self._private, self._peer_pubs[peer], round_idx)

    def mask_update(
        self,
        delta: np.ndarray,
        weight: float,
        round_idx: int,
        participants: Iterable[int],
    ) -> np.ndarray:
        """Masked uint64 encoding of ``weight * delta`` for this round.

        ``participants`` is the round's full participant id set as
        announced by the server (self included or not — ignored).

        The per-coordinate clip applies to the DELTA (before weighting),
        so example-count weights never push honest values into the clip.
        """
        d = np.clip(np.asarray(delta, np.float64), -self.clip, self.clip)
        enc = encode_fixed(d * float(weight), self.scale,
                           clip=self.clip * max(float(weight), 1.0))
        for peer in participants:
            peer = int(peer)
            if peer == self.client_id:
                continue
            mask = expand_mask(self._pair_seed(peer, round_idx), enc.shape[0])
            if self.client_id < peer:
                enc = enc + mask  # uint64 wrap-add
            else:
                enc = enc - mask
        return enc

    def reveal_seeds(self, dropped: Iterable[int],
                     round_idx: int) -> Dict[str, str]:
        """Seeds shared with dropped participants, for server-side unmasking."""
        return {
            str(int(j)): self._pair_seed(int(j), round_idx).hex()
            for j in dropped
            if int(j) != self.client_id and int(j) in self._peer_pubs
        }


class SecAggServerRound:
    """Server-side accumulator for one round's masked sum."""

    def __init__(self, dim: int, scale: float = DEFAULT_SCALE):
        self.dim = int(dim)
        self.scale = float(scale)
        self.acc = np.zeros((dim,), np.uint64)
        self.total_weight = 0.0
        self.contributors: List[int] = []

    def add(self, client_id: int, masked: np.ndarray, weight: float) -> None:
        self.acc = self.acc + np.asarray(masked, np.uint64)
        self.total_weight += float(weight)
        self.contributors.append(int(client_id))

    def strip_dropout_masks(
        self,
        revealed: Dict[int, Dict[str, str]],
        dropped: Iterable[int],
    ) -> None:
        """Remove uncancelled masks after dropouts.

        ``revealed[i][str(j)]`` is survivor i's hex seed with dropped
        client j. Survivor i added ``sign(i, j) * mask_ij`` to its
        contribution; subtract exactly that.
        """
        dropped = {int(j) for j in dropped}
        for i, seeds in revealed.items():
            i = int(i)
            if i not in self.contributors:
                continue  # never contributed; nothing to strip
            for j_str, seed_hex in seeds.items():
                j = int(j_str)
                if j not in dropped:
                    continue  # only dropped participants' masks are stripped
                mask = expand_mask(bytes.fromhex(seed_hex), self.dim)
                if i < j:
                    self.acc = self.acc - mask
                else:
                    self.acc = self.acc + mask

    def weighted_mean_delta(self) -> np.ndarray:
        """Decode: sum(w_i * d_i) / sum(w_i), float32."""
        total = decode_fixed(self.acc, self.scale)
        return (total / max(self.total_weight, 1e-12)).astype(np.float32)


#: defenses that never inspect per-client updates — the only ones secure
#: aggregation composes with
SECAGG_COMPATIBLE_DEFENSES = frozenset({"none", "fedavg"})
