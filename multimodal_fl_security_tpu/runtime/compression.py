"""Uplink update compression for the distributed TCP runtime.

Beyond-reference (its Flower path ships full float32 ndarrays both ways
every round, reference: src/server/robust_server.py:101,126). FL uplink is
usually the constrained direction, so clients can quantize their update
DELTA (update - global) to int8 with a per-message scale before sending;
the server dequantizes and adds the global back before aggregation — the
defense stack sees ordinary float32 updates and is unaffected.

Error feedback (Seide'14 / Karimireddy'19 "EF-SGD"): each client keeps the
quantization residual and adds it to the next round's delta, so the
quantization error is compensated over time instead of accumulating —
without it, 8-bit training visibly stalls.

Wire cost: 1 int8 byte per parameter + a float scale = ~4x smaller uplink
than float32 (the transport frames raw bytes, transport.py).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _finite_or_reset(delta: np.ndarray, owner) -> np.ndarray:
    """Guard the error-feedback loop against a diverged local step: a
    single NaN/Inf delta would otherwise be stored as the residual and
    contaminate EVERY later round (the client silently uploads zeros
    forever). Drop the poisoned delta and reset the residual instead."""
    if np.all(np.isfinite(delta)):
        return delta
    logger.warning(
        "%s: non-finite delta; dropping it and resetting the "
        "error-feedback residual", type(owner).__name__,
    )
    owner._residual = None
    return np.zeros_like(delta)


def quantize_delta(delta: np.ndarray) -> Tuple[np.ndarray, float]:
    """Symmetric per-message int8 quantization of a float32 vector."""
    scale = float(np.max(np.abs(delta)) / 127.0)
    if scale <= 0 or not np.isfinite(scale):
        return np.zeros(delta.shape, np.int8), 0.0
    q = np.clip(np.rint(delta / scale), -127, 127).astype(np.int8)
    return q, scale


def dequantize_delta(q: np.ndarray, scale: float) -> np.ndarray:
    return q.astype(np.float32) * np.float32(scale)


class Int8UplinkCompressor:
    """Client-side stateful compressor with error feedback."""

    name = "int8"

    def __init__(self):
        self._residual: Optional[np.ndarray] = None

    def compress(self, update: np.ndarray,
                 global_flat: np.ndarray) -> Dict[str, object]:
        delta = update.astype(np.float32) - np.asarray(global_flat, np.float32)
        if self._residual is not None:
            delta = delta + self._residual
        delta = _finite_or_reset(delta, self)
        q, scale = quantize_delta(delta)
        self._residual = delta - dequantize_delta(q, scale)
        return {"q_delta": q, "q_scale": scale, "compression": self.name}


class TopKUplinkCompressor:
    """Top-k sparsification with error feedback (Stich et al. NeurIPS'18,
    "Sparsified SGD with Memory"): send only the ``ratio`` largest-|.|
    delta coordinates; everything dropped joins the residual and is
    retried next round, so every coordinate eventually flushes.

    Wire cost per parameter kept: 4-byte index + 4-byte value (or 1-byte
    value with ``quantize=True``, int8 over the kept set). At ratio 0.01
    that is ~2% (~1.3% quantized) of the dense float32 uplink.
    """

    name = "topk"

    def __init__(self, ratio: float = 0.01, quantize: bool = False):
        self.ratio = float(ratio)
        self.quantize = bool(quantize)
        self._residual: Optional[np.ndarray] = None

    def compress(self, update: np.ndarray,
                 global_flat: np.ndarray) -> Dict[str, object]:
        delta = update.astype(np.float32) - np.asarray(global_flat, np.float32)
        if self._residual is not None:
            delta = delta + self._residual
        delta = _finite_or_reset(delta, self)
        d = delta.shape[0]
        k = max(1, int(round(self.ratio * d)))
        idx = np.argpartition(np.abs(delta), d - k)[d - k:]
        vals = delta[idx]
        self._residual = delta.copy()
        self._residual[idx] = 0.0
        out: Dict[str, object] = {
            "sp_idx": idx.astype(np.uint32),
            "compression": self.name,
        }
        if self.quantize:
            q, scale = quantize_delta(vals)
            out["sp_qval"] = q
            out["sp_scale"] = scale
            # error feedback also covers the value quantization
            self._residual[idx] = vals - dequantize_delta(q, scale)
        else:
            out["sp_val"] = vals.astype(np.float32)
        return out


def make_compressor(name: Optional[str], config: Optional[Dict] = None):
    """Factory for the client's uplink compressor; None/"" = no compression."""
    cfg = config or {}
    if not name:
        return None
    if name == "int8":
        return Int8UplinkCompressor()
    if name in ("topk", "topk8"):
        return TopKUplinkCompressor(
            ratio=float(cfg.get("topk_ratio", 0.01)),
            quantize=(name == "topk8") or bool(cfg.get("topk_quantize")),
        )
    raise ValueError(f"unknown compression {name!r} "
                     "(available: int8, topk, topk8)")


def decompress_reply(reply: Dict[str, object],
                     global_flat: np.ndarray) -> np.ndarray:
    """Server-side: reconstruct the float32 update from a fit reply."""
    g = np.asarray(global_flat, np.float32)
    if reply.get("compression") == "int8":
        delta = dequantize_delta(np.asarray(reply["q_delta"]),
                                 float(reply["q_scale"]))
        return g + delta
    if reply.get("compression") == "topk":
        delta = np.zeros_like(g)
        idx = np.asarray(reply["sp_idx"], np.int64)
        if "sp_qval" in reply:
            delta[idx] = dequantize_delta(
                np.asarray(reply["sp_qval"]), float(reply["sp_scale"])
            )
        else:
            delta[idx] = np.asarray(reply["sp_val"], np.float32)
        return g + delta
    return np.asarray(reply["params"], np.float32)
