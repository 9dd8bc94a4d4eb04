"""Robust reductions over the client axis of a [C, D] update matrix.

These replace the reference's per-parameter Python loops of torch sorts
(reference: src/defenses/trimmed_mean.py:48-103,141-166,225-265) with single
XLA reductions over the whole flattened matrix. C is small (tens to a few
hundred), D is large — XLA lays the sort along the minor axis in VMEM tiles.

Tie conventions match torch for parity: the coordinate median uses the
*lower* of the two middles for even C (torch.median semantics,
reference: trimmed_mean.py:163), not the numpy/jnp average.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_mean(updates: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Example-count-weighted FedAvg (reference: base_defense.py:80-97)."""
    w = weights.astype(jnp.float32)
    return jnp.einsum("c,cd->d", w, updates) / jnp.maximum(jnp.sum(w), 1e-12)


#: D above which the bitonic sorted-reduce Pallas kernel beats XLA's
#: sort-then-reduce lowering on TPU (measured 107 vs 131 ms for the median
#: and 128 vs 136 ms for the trimmed mean at [100, 8M] on v5e —
#: benchmarks/aggregation_bench.py, artifacts/bench/aggregation.json).
SORTED_REDUCE_MIN_D = 2_000_000


def _use_pallas_sort(d: int) -> bool:
    try:
        return (d >= SORTED_REDUCE_MIN_D
                and jax.devices()[0].platform == "tpu")
    except Exception:  # pragma: no cover
        return False


def coordinate_median(updates: jnp.ndarray) -> jnp.ndarray:
    """Coordinate-wise median, lower-middle convention for even C.

    Dispatches to the single-HBM-pass Pallas sorted-reduce for large D on
    TPU (XLA's lowering writes the fully sorted [C, D] matrix back to HBM
    and re-reads it)."""
    c = updates.shape[0]
    if _use_pallas_sort(updates.shape[1]):
        from multimodal_fl_security_tpu.ops.pallas_kernels import (
            sorted_reduce_pallas,
        )

        return sorted_reduce_pallas(updates, mode="median", interpret=False)
    srt = jnp.sort(updates, axis=0)
    return srt[(c - 1) // 2]


def trimmed_mean(updates: jnp.ndarray, trim_ratio: float = 0.1) -> jnp.ndarray:
    """Trim ``max(1, int(C*ratio))`` per end, then mean; median fallback when
    over-trimmed (reference: trimmed_mean.py:66-72,92-103)."""
    c = updates.shape[0]
    t = max(1, int(c * trim_ratio))
    if 2 * t >= c:
        return coordinate_median(updates)
    if _use_pallas_sort(updates.shape[1]):
        from multimodal_fl_security_tpu.ops.pallas_kernels import (
            sorted_reduce_pallas,
        )

        return sorted_reduce_pallas(updates, mode="trimmed", trim=t,
                                    interpret=False)
    srt = jnp.sort(updates, axis=0)
    return jnp.mean(srt[t : c - t], axis=0)


def geometric_median(
    updates: jnp.ndarray,
    max_iters: int = 100,
    tol: float = 1e-5,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Weiszfeld iterations, initialized at the coordinate median
    (reference: trimmed_mean.py:225-265). Runs as a bounded while_loop so it
    stays inside jit."""

    y0 = coordinate_median(updates)

    def step(y):
        dists = jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.square(updates - y[None, :]), axis=1), 0.0)
        )
        inv = 1.0 / jnp.maximum(dists, eps)
        return jnp.einsum("c,cd->d", inv, updates) / jnp.sum(inv)

    def cond(state):
        _, move, it = state
        return jnp.logical_and(it < max_iters, move > tol)

    def body(state):
        y, _, it = state
        y_new = step(y)
        move = jnp.sqrt(jnp.sum(jnp.square(y_new - y)))
        return (y_new, move, it + 1)

    y, _, _ = jax.lax.while_loop(cond, body, (y0, jnp.float32(jnp.inf), 0))
    return y


def row_norms(updates: jnp.ndarray, ord: str = "l2") -> jnp.ndarray:
    if ord == "linf":
        return jnp.max(jnp.abs(updates), axis=1)
    return jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(updates), axis=1), 0.0))


def clip_rows(updates: jnp.ndarray, clip_norm: float, ord: str = "l2") -> jnp.ndarray:
    """Per-client norm clipping (reference: differential_privacy.py:74-95)."""
    norms = row_norms(updates, ord)
    scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norms, 1e-12))
    return updates * scale[:, None]
