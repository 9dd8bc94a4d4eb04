"""Parameter-dimension-sharded robust aggregation.

The row-replicated formulation (shard_round.py) ``all_gather``s the full
[C, D] update matrix onto every device before a robust rule runs. At
ResNet-50 scale that matrix is 100 x 25M x 4 B = 10 GB — replicating it
per chip is the memory wall, and the gather itself moves (p-1)/p of 10 GB
over ICI per round.

This module keeps the matrix *sharded along D* instead: one
``all_to_all`` re-tiles the per-device [C/p, D] training output into
[C, D/p] (every device sees ALL clients, but only its coordinate slice),
and then each rule runs in the layout it actually wants:

  - coordinate-wise rules (trimmed mean, median, Bulyan's second stage,
    clipping/bounding means) are embarrassingly parallel over D — they run
    fully local on [C, D/p] with zero further communication;
  - Krum / Multi-Krum / Bulyan selection need pairwise distances: each
    device computes the partial Gram matrix of its coordinate slice and a
    single ``psum`` of [C, C] scalars (40 kB at C=100) replaces the 10 GB
    row gather — selection is then replicated arithmetic on every device;
  - geometric median (Weiszfeld) iterates with psum-reduced partial
    squared distances and a psum-reduced convergence norm, carrying only
    the local [D/p] iterate;
  - norm-based rules (gradient clipping, norm bounding) psum partial
    squared row norms (or pmax partial linf norms).

Per-device footprint for every rule drops from O(C*D) to O(C*D/p + C^2),
and the only O(D) collective left is the final [D/p] all_gather of the
aggregate itself (which pjit would insert anyway to replicate new params).

The reference has no analog (its Krum is a Python double loop over torch
tensors on one host — reference: src/defenses/krum.py:73-99); this is the
layout the scaling model prescribes for TPU meshes: shard the big axis,
reduce the small one.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Axes = Union[str, Tuple[str, ...], Sequence[str]]

#: Rules with a native D-sharded formulation. Anything else falls back to
#: the row-replicated all_gather path in shard_round.py.
D_SHARDED_RULES = frozenset(
    {
        "fedavg",
        "none",
        "krum",
        "multi_krum",
        "trimmed_mean",
        "median",
        "geometric_median",
        "bulyan",
        "gradient_clipping",
        "norm_bounding",
    }
)


def supports_dshard(defense) -> bool:
    return getattr(defense, "name", None) in D_SHARDED_RULES


def psum_pairwise_dists(upd_local: jnp.ndarray, axes: Axes) -> jnp.ndarray:
    """Euclidean distance matrix [C, C] from a D-shard [C, D/p].

    Local mean-centering subtracts the per-coordinate client mean — a fixed
    translation of all C points (the restriction of the global mean update
    to this coordinate slice), so pairwise distances are exact while the
    Gram cancellation error stays small (same trick as ops/pairwise.py).
    The partial Gram matrices are summed over the mesh with one [C, C] psum.
    """
    c = upd_local.shape[0]
    centered = upd_local - jnp.mean(upd_local, axis=0, keepdims=True)
    gram = jnp.dot(centered, centered.T, preferred_element_type=jnp.float32)
    gram = jax.lax.psum(gram, axes)
    sq_norms = jnp.diagonal(gram)
    d2 = sq_norms[:, None] + sq_norms[None, :] - 2.0 * gram
    d2 = jnp.maximum(d2, 0.0) * (1.0 - jnp.eye(c, dtype=gram.dtype))
    return jnp.sqrt(d2)


def psum_row_norms(upd_local: jnp.ndarray, axes: Axes,
                   ord: str = "l2") -> jnp.ndarray:
    """Full-D per-client update norms [C] from a D-shard [C, D/p]."""
    if ord == "linf":
        return jax.lax.pmax(jnp.max(jnp.abs(upd_local), axis=1), axes)
    part = jnp.sum(jnp.square(upd_local), axis=1)
    return jnp.sqrt(jnp.maximum(jax.lax.psum(part, axes), 0.0))


def _coordinate_median_local(upd_local: jnp.ndarray) -> jnp.ndarray:
    """Lower-middle median over the (complete) client axis — fully local.

    Delegates to the shared reduction (ops/reductions.py) so the sharded
    and unsharded paths can never drift in tie convention or trim math;
    its Pallas dispatch threshold applies to the LOCAL D/p width, which
    is the right scale here."""
    from multimodal_fl_security_tpu.ops.reductions import coordinate_median

    return coordinate_median(upd_local)


def _trimmed_mean_local(upd_local: jnp.ndarray, trim_ratio: float) -> jnp.ndarray:
    from multimodal_fl_security_tpu.ops.reductions import trimmed_mean

    return trimmed_mean(upd_local, trim_ratio)


def _geometric_median_psum(
    upd_local: jnp.ndarray,
    axes: Axes,
    max_iters: int = 100,
    tol: float = 1e-5,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Weiszfeld with psum-reduced distances; carry is the local [D/p] slice.

    Both the per-iteration distances and the convergence norm are reduced
    over the mesh, so the while_loop trip count is identical on every
    device (SPMD programs with device-divergent control flow deadlock).
    """
    y0 = _coordinate_median_local(upd_local)

    def step(y):
        part = jnp.sum(jnp.square(upd_local - y[None, :]), axis=1)
        dists = jnp.sqrt(jnp.maximum(jax.lax.psum(part, axes), 0.0))
        inv = 1.0 / jnp.maximum(dists, eps)
        return jnp.einsum("c,cd->d", inv, upd_local) / jnp.sum(inv)

    def cond(state):
        _, move, it = state
        return jnp.logical_and(it < max_iters, move > tol)

    def body(state):
        y, _, it = state
        y_new = step(y)
        move = jnp.sqrt(
            jnp.maximum(jax.lax.psum(jnp.sum(jnp.square(y_new - y)), axes), 0.0)
        )
        return (y_new, move, it + 1)

    y, _, _ = jax.lax.while_loop(cond, body, (y0, jnp.float32(jnp.inf), 0))
    return y


def dshard_aggregate(
    defense,
    upd_local: jnp.ndarray,
    weights: jnp.ndarray,
    axes: Axes,
) -> jnp.ndarray:
    """Run ``defense`` on a D-sharded update matrix.

    Args:
      defense: a defense instance whose ``name`` is in D_SHARDED_RULES.
      upd_local: [C, D/p] — all clients, this device's coordinate slice.
      weights: [C] example counts (replicated).
      axes: mesh axis name(s) the D dimension is sharded over.

    Returns the local [D/p] slice of the aggregate; ``all_gather`` it
    (tiled) to materialize the replicated [D] vector.
    """
    name = defense.name
    if name in ("fedavg", "none"):
        w = weights.astype(jnp.float32)
        return jnp.einsum("c,cd->d", w, upd_local) / jnp.maximum(
            jnp.sum(w), 1e-12
        )
    if name == "median":
        return _coordinate_median_local(upd_local)
    if name == "trimmed_mean":
        return _trimmed_mean_local(upd_local, defense.trim_ratio)
    if name == "geometric_median":
        return _geometric_median_psum(
            upd_local, axes, max_iters=defense.max_iters, tol=defense.tol
        )
    if name in ("krum", "multi_krum"):
        dists = psum_pairwise_dists(upd_local, axes)
        scores = defense.scores_from_dists(dists)
        k = min(defense.multi_k, dists.shape[0])
        selected = jnp.argsort(scores)[:k]
        if k == 1:
            return upd_local[selected[0]]
        return jnp.mean(upd_local[selected], axis=0)
    if name == "bulyan":
        dists = psum_pairwise_dists(upd_local, axes)
        selected = defense.select_from_dists(dists)
        f = defense.num_malicious
        theta = selected.shape[0]
        block = upd_local[selected]  # [theta, D/p]
        srt = jnp.sort(block, axis=0)
        return jnp.mean(srt[f : theta - f], axis=0)
    if name == "gradient_clipping":
        if defense.norm_type == "linf":
            clipped = jnp.clip(upd_local, -defense.clip_norm, defense.clip_norm)
        else:
            norms = psum_row_norms(upd_local, axes)
            scale = jnp.minimum(
                1.0, defense.clip_norm / jnp.maximum(norms, 1e-12)
            )
            clipped = upd_local * scale[:, None]
        w = weights.astype(jnp.float32)
        return jnp.einsum("c,cd->d", w, clipped) / jnp.maximum(
            jnp.sum(w), 1e-12
        )
    if name == "norm_bounding":
        norms = psum_row_norms(upd_local, axes)
        valid = jnp.logical_and(
            norms >= defense.min_norm, norms <= defense.max_norm
        ).astype(jnp.float32)
        any_valid = jnp.sum(valid) > 0
        valid = jnp.where(any_valid, valid, jnp.ones_like(valid))
        w = weights.astype(jnp.float32) * valid
        return jnp.einsum("c,cd->d", w, upd_local) / jnp.maximum(
            jnp.sum(w), 1e-12
        )
    raise ValueError(f"no D-sharded formulation for defense {name!r}")
