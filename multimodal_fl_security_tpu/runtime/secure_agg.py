"""Secure aggregation for the distributed TCP runtime.

Bonawitz et al. (CCS'17) double-masking protocol with Shamir-share
dropout recovery: the server learns ONLY the weighted SUM of client
updates, never an individual update. Beyond-reference — the reference's
Flower path ships every client's full parameter vector to the server in
the clear (reference: src/server/robust_server.py:95-104).

Protocol
--------
1. Key agreement: every client generates an ephemeral finite-field
   Diffie-Hellman keypair (RFC 3526 2048-bit MODP group, stdlib ``pow``);
   public keys are relayed through the server (with the t-of-n
   threshold). Each pair (i, j) then shares a secret only they can
   compute. Each client also t-of-n Shamir-shares its DH PRIVATE key
   among all participants (runtime/shamir.py), each share encrypted for
   its holder with the pairwise key and relayed through the server.
2. Masking: client i fixed-point-encodes ``weight_i * delta_i`` (delta
   from the broadcast global, so magnitudes stay small) into int64,
   reinterprets mod 2**64, and adds (a) a pairwise mask vector
   ``sign(i, j) * PRG(seed_ij, round)`` for every OTHER participant j
   (``seed_ij = SHA-256(DH(i, j) || round)``, sign +1 for i < j), and
   (b) a SELF mask ``PRG(b_i)`` from a fresh per-round seed ``b_i``,
   which it t-of-n shares alongside the masked vector (encrypted per
   holder). Uint64 addition wraps, so each mask is a one-time pad; in
   the sum over all participants the pairwise masks cancel exactly.
3. Unmask round (every round): the server tells the surviving
   contributors who contributed and who dropped, forwarding each holder
   its encrypted shares. Each survivor returns plaintext shares of
   ``b_i`` for CONTRIBUTORS and of the DH key ``x_d`` for DROPPED
   clients — never both for the same owner (clients enforce the
   disjointness; revealing both would unmask an individual update).
   With >= t share replies the server reconstructs every contributor's
   ``b_i`` (subtracting the self masks — including a contributor that
   died AFTER submitting) and every dropped ``x_d`` (recomputing and
   stripping its uncancelled pairwise masks), then decodes:
   ``new_global = global + sum w_i d_i / sum w_i``. Fewer than t share
   replies abort the round (params unchanged).
4. PER-ROUND KEY ROTATION: Bonawitz et al.'s protocol is one-shot — in
   a multi-round deployment a single long-lived DH key would let a
   server that reconstructs ``x_i`` after client i drops in round k
   retroactively strip i's pairwise masks from every EARLIER round
   (where it also legitimately learned ``b_i^r``), unmasking i's past
   individual updates. So every round uses FRESH DH keys, piggybacked
   on the existing legs: each fit reply carries the client's public key
   for the NEXT round (``next_pub``); the unmask request relays the
   assembled next-round directory (``next_pubs``); and each unmask
   reply carries t-of-n shares of the client's next-round private key,
   encrypted per holder under next-round pairwise keys
   (``next_x_shares``). Reconstructing ``x_d^r`` therefore unlocks
   round r's pairwise masks ONLY — every other round used different
   keys, and per round the contributor/dropped disjointness keeps
   ``b_i^r`` and ``x_i^r`` mutually exclusive.

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
from typing import Any, Dict, Iterable, List, Optional

import numpy as np

from multimodal_fl_security_tpu.runtime.shamir import (
    combine_shares,
    split_secret,
)

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


def shared_seed(private: int, peer_public: int, round_idx: int,
                domain: bytes = b"mfs-secagg-v1") -> bytes:
    """32-byte pairwise seed, symmetric in (i, j), bound to the round and
    to a domain (pairwise masks, b-share encryption, x-share encryption
    each use a distinct domain so keystreams never collide)."""
    s = pow(peer_public, private, DH_PRIME)
    material = s.to_bytes((DH_PRIME.bit_length() + 7) // 8, "big")
    return hashlib.sha256(
        material + round_idx.to_bytes(8, "big") + domain
    ).digest()


#: share-encryption domains (see shared_seed)
DOMAIN_BSHARE = b"mfs-secagg-bshare"
DOMAIN_XSHARE = b"mfs-secagg-xshare"
#: fixed width of an encrypted field element (p < 2^521 -> 66 bytes)
SHARE_BYTES = 66


def _stream_xor(key: bytes, data: bytes) -> bytes:
    """XOR ``data`` with a SHA-256 counter keystream from ``key``."""
    out = bytearray()
    ctr = 0
    while len(out) < len(data):
        out += hashlib.sha256(key + ctr.to_bytes(4, "big")).digest()
        ctr += 1
    return bytes(a ^ b for a, b in zip(data, out[: len(data)]))


def encrypt_share(key: bytes, share: int) -> str:
    return _stream_xor(key, share.to_bytes(SHARE_BYTES, "big")).hex()


def decrypt_share(key: bytes, enc_hex: str) -> int:
    return int.from_bytes(_stream_xor(key, bytes.fromhex(enc_hex)), "big")


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
    """Client-side masking + sharing state for one FL run."""

    def __init__(self, client_id: int, scale: float = DEFAULT_SCALE,
                 clip: float = DEFAULT_CLIP):
        self.client_id = int(client_id)
        self.scale = float(scale)
        self.clip = float(clip)
        self._private, self.public = generate_keypair()
        self._peer_pubs: Dict[int, int] = {}
        self.threshold: int = 2
        #: round -> (b_seed bytes, own Shamir share of int(b_seed))
        self._round_b: Dict[int, tuple] = {}
        #: own Shamir share of the DH private key
        self._x_self_share: Optional[int] = None
        #: fresh (private, public) for the NEXT round (per-round key
        #: rotation — see module docstring §4); generated with each
        #: round_payload, shared in the unmask reply, promoted to
        #: current by begin_round when the next fit's directory arrives.
        self._next: Optional[tuple] = None

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

    def handshake(self, pubs: Dict[str, str], threshold: int
                  ) -> Dict[str, Any]:
        """Install the key directory and produce the x-share message:
        this client's DH private key t-of-n shared among all directory
        members (self share kept), each share encrypted for its holder
        with the pairwise key (the server relays but cannot read them)."""
        self.set_peer_keys(pubs)
        self.threshold = int(threshold)
        holders = sorted(int(c) for c in pubs)
        shares = split_secret(self._private, holders, self.threshold)
        self._x_self_share = shares[self.client_id]
        enc = {
            str(j): encrypt_share(
                shared_seed(self._private, self._peer_pubs[j], 0,
                            DOMAIN_XSHARE),
                sh,
            )
            for j, sh in shares.items()
            if j != self.client_id
        }
        return {"type": "x_shares", "client_id": self.client_id,
                "shares": enc}

    def begin_round(self, pubs: Dict[str, str]) -> None:
        """Install the round's key directory, promoting this client's
        next-round keypair first when the directory says so (the server
        builds each round's directory from the ``next_pub`` values of the
        previous round's fit replies)."""
        mine = int(pubs[str(self.client_id)], 16)
        if mine != self.public:
            if self._next is not None and self._next[1] == mine:
                self._private, self.public = self._next
                self._next = None
            else:
                raise ValueError(
                    "server directory carries a public key for this client "
                    "that is neither its current nor its announced next key"
                )
        self.set_peer_keys(pubs)

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

    def round_payload(self, delta: np.ndarray, weight: float,
                      round_idx: int, participants: Iterable[int]
                      ) -> Dict[str, Any]:
        """Full double-masked submission for one round: the pairwise-masked
        encoding PLUS a fresh self mask ``PRG(b_i)``, with ``b_i`` t-of-n
        shared among the round's participants (own share kept, others
        encrypted per holder)."""
        participants = [int(p) for p in participants]
        enc = self.mask_update(delta, weight, round_idx, participants)
        b_seed = secrets.token_bytes(32)
        enc = enc + expand_mask(b_seed, enc.shape[0])
        shares = split_secret(int.from_bytes(b_seed, "big"), participants,
                              self.threshold)
        self._round_b[round_idx] = (b_seed, shares.get(self.client_id))
        enc_shares = {
            str(j): encrypt_share(
                shared_seed(self._private, self._peer_pubs[j], round_idx,
                            DOMAIN_BSHARE),
                sh,
            )
            for j, sh in shares.items()
            if j != self.client_id
        }
        # Prune stale per-round state; announce fresh keys for round r+1.
        self._round_b.pop(round_idx - 2, None)
        self._next = generate_keypair()
        return {"masked": enc, "b_shares": enc_shares,
                "next_pub": format(self._next[1], "x")}

    def unmask_reply(self, msg: Dict[str, Any]) -> Dict[str, Any]:
        """Answer the server's unmask request with plaintext shares.

        ``msg`` carries the round's ``contributors`` and ``dropped`` id
        lists plus the encrypted shares this client holds (``enc_b`` for
        contributors' self-mask seeds, ``enc_x`` for dropped clients' DH
        keys). SECURITY INVARIANT enforced here: an owner may appear in
        only ONE of the two lists — revealing both b_i and x_i would let
        the server unmask client i's individual update.
        """
        round_idx = int(msg["round"])
        contributors = {int(c) for c in msg.get("contributors", [])}
        dropped = {int(d) for d in msg.get("dropped", [])}
        overlap = contributors & dropped
        if overlap:
            raise ValueError(
                f"refusing unmask: owners {sorted(overlap)} listed as both "
                "contributor and dropped (server would learn their "
                "individual update)"
            )
        b_out: Dict[str, str] = {}
        for owner_s, enc in dict(msg.get("enc_b", {})).items():
            owner = int(owner_s)
            if owner not in contributors or owner not in self._peer_pubs:
                continue
            key = shared_seed(self._private, self._peer_pubs[owner],
                              round_idx, DOMAIN_BSHARE)
            b_out[owner_s] = format(decrypt_share(key, enc), "x")
        # Own self-mask share (we are a contributor answering unmask).
        own = self._round_b.get(round_idx)
        if own is not None and self.client_id in contributors:
            b_out[str(self.client_id)] = format(own[1], "x")
        x_out: Dict[str, str] = {}
        for owner_s, enc in dict(msg.get("enc_x", {})).items():
            owner = int(owner_s)
            if owner == self.client_id:
                continue  # never reveal a share of one's own live key
            if owner not in dropped or owner not in self._peer_pubs:
                continue
            key = shared_seed(self._private, self._peer_pubs[owner], 0,
                              DOMAIN_XSHARE)
            x_out[owner_s] = format(decrypt_share(key, enc), "x")
        reply = {"type": "unmask_reply", "client_id": self.client_id,
                 "round": round_idx, "b": b_out, "x": x_out}
        # Key rotation (module docstring §4): distribute t-of-n shares of
        # this client's NEXT-round private key among the next-round
        # directory, each share encrypted under next-round pairwise keys.
        next_pubs = msg.get("next_pubs")
        if next_pubs and self._next is not None:
            holders = sorted(int(c) for c in next_pubs)
            if len(holders) >= self.threshold:
                x_priv = self._next[0]
                shares = split_secret(x_priv, holders, self.threshold)
                reply["next_x_shares"] = {
                    str(j): encrypt_share(
                        shared_seed(x_priv, int(next_pubs[str(j)], 16), 0,
                                    DOMAIN_XSHARE),
                        sh,
                    )
                    for j, sh in shares.items()
                    if j != self.client_id
                }
        return reply


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

    def subtract_self_masks(self, b_seeds: Dict[int, int]) -> None:
        """Remove every contributor's self mask given the reconstructed
        per-round seeds ``{owner: int(b_seed)}`` (Shamir-combined)."""
        for owner, b_int in b_seeds.items():
            if int(owner) not in self.contributors:
                continue
            if not 0 <= b_int < (1 << 256):
                raise ValueError(
                    f"reconstructed b for client {owner} out of range — "
                    "bad/insufficient shares"
                )
            self.acc = self.acc - expand_mask(
                int(b_int).to_bytes(32, "big"), self.dim
            )

    def strip_dropped_with_keys(
        self,
        x_keys: Dict[int, int],
        pubs: Dict[int, int],
        round_idx: int,
    ) -> None:
        """Remove the uncancelled pairwise masks owed by dropped clients,
        given their reconstructed DH PRIVATE keys ``{dropped_id: x_d}``
        and the public-key directory. Contributor i added
        ``sign(i, d) * PRG(seed_id)``; ``seed_id`` is symmetric, so the
        server recomputes it as ``shared_seed(x_d, pub_i, round)``.

        Every reconstructed key is verified against the directory
        (``g^x_d == pub_d``) BEFORE any mask is applied: Shamir
        reconstruction from >= t shares succeeds arithmetically even
        when one share is wrong (malicious or corrupted holder), and an
        unverified wrong key would silently strip garbage into the
        aggregate. Raises ValueError so the caller aborts the round."""
        for d, x_d in x_keys.items():
            if pow(DH_GENERATOR, int(x_d), DH_PRIME) != int(pubs[int(d)]):
                raise ValueError(
                    f"reconstructed DH key for dropped client {d} does not "
                    "match its public key — bad share(s); aborting round "
                    "instead of applying a corrupt unmask"
                )
        for d, x_d in x_keys.items():
            d = int(d)
            for i in self.contributors:
                if i == d:
                    continue
                seed = shared_seed(int(x_d), pubs[i], round_idx)
                mask = expand_mask(seed, self.dim)
                if i < d:
                    self.acc = self.acc - mask
                else:
                    self.acc = self.acc + mask

    def weighted_mean_delta(self) -> np.ndarray:
        """Decode: sum(w_i * d_i) / sum(w_i), float32."""
        total = decode_fixed(self.acc, self.scale)
        return (total / max(self.total_weight, 1e-12)).astype(np.float32)


def reconstruct_secrets(replies: List[Dict[str, Any]], field: str,
                        owners: Iterable[int], threshold: int
                        ) -> Dict[int, int]:
    """Shamir-combine per-owner shares out of unmask replies.

    ``field`` is ``"b"`` (contributors' self-mask seeds) or ``"x"``
    (dropped clients' DH keys). Raises ValueError when any requested
    owner has fewer than ``threshold`` shares — the caller aborts the
    round rather than apply a garbage reconstruction.
    """
    out: Dict[int, int] = {}
    for owner in owners:
        shares: Dict[int, int] = {}
        for rep in replies:
            sh = rep.get(field, {}).get(str(int(owner)))
            if sh is not None:
                shares[int(rep["client_id"])] = int(sh, 16)
        if len(shares) < threshold:
            raise ValueError(
                f"only {len(shares)} shares for {field!r} of client "
                f"{owner} (threshold {threshold})"
            )
        out[int(owner)] = combine_shares(shares)
    return out


#: defenses that never inspect per-client updates — the only ones secure
#: aggregation composes with
SECAGG_COMPATIBLE_DEFENSES = frozenset({"none", "fedavg"})
