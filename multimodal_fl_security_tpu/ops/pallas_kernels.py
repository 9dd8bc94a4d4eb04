"""Pallas TPU kernels for the robust-aggregation hot path.

Two kernels, both streaming D-blocks of the [C, D] update matrix through
VMEM once (C = clients, D = parameter dimension, up to ~25M for ResNet-50):

- ``gram_pallas``: centered Gram matrix for Krum's pairwise distances.
  Fuses the mean-centering into the MXU matmul so the centered copy of the
  update matrix is never materialized in HBM (one read of U instead of a
  write + read of U_centered).

- ``sorted_reduce_pallas``: coordinate-wise sort over the client axis via an
  in-register bitonic network (VPU min/max stages), immediately reduced to
  the trimmed mean or lower-middle median. XLA's lowering writes the fully
  sorted [C, D] matrix back to HBM and re-reads it for the reduction (3
  HBM passes); this kernel does 1 read + 1 [D]-sized write.

Both have jnp fallbacks and run in interpreter mode off-TPU, so tests
validate the kernel math on CPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_block_d(c_rows: int, requested: Optional[int],
                  budget_bytes: int = 3 << 20) -> int:
    """Pick a lane-aligned D-block so the [c_rows, block_d] f32 VMEM buffer
    (double-buffered by the pipeline) stays within ~budget_bytes."""
    if requested is not None:
        return requested
    block = budget_bytes // (c_rows * 4)
    return max(512, (block // 128) * 128)


# ---------------------------------------------------------------------------
# Centered Gram matrix
# ---------------------------------------------------------------------------


def _gram_kernel(u_ref, mean_ref, out_ref):
    i = pl.program_id(0)
    centered = u_ref[:] - mean_ref[:]
    g = jnp.dot(centered, centered.T, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        out_ref[:] = g

    @pl.when(i > 0)
    def _():
        out_ref[:] = out_ref[:] + g


def gram_pallas(updates: jnp.ndarray, block_d: Optional[int] = None,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """Centered Gram matrix [C, C] of updates [C, D], one HBM pass over U.

    No copies of U are made: whole D-blocks stream through the kernel from
    the original buffer (Mosaic masks the non-8-multiple C sublane), and a
    sub-block D remainder is accumulated with a fused jnp tail — so the
    peak HBM footprint is the input itself plus [C, C].
    """
    if interpret is None:
        interpret = not _on_tpu()
    c, d = updates.shape
    block_d = _auto_block_d(max(_round_up(c, 8), 8), block_d)
    mean = jnp.mean(updates, axis=0, keepdims=True)  # [1, D]
    nblk = d // block_d

    if nblk == 0:
        centered = updates - mean
        return jnp.dot(centered, centered.T,
                       preferred_element_type=jnp.float32)

    gram = pl.pallas_call(
        _gram_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((c, block_d), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, c), jnp.float32),
        interpret=interpret,
    )(updates, mean)
    rem = d - nblk * block_d
    if rem:
        tail = updates[:, nblk * block_d :] - mean[:, nblk * block_d :]
        gram = gram + jnp.dot(tail, tail.T,
                              preferred_element_type=jnp.float32)
    return gram


def pairwise_sq_dists_pallas(updates: jnp.ndarray,
                             block_d: Optional[int] = None,
                             interpret: Optional[bool] = None) -> jnp.ndarray:
    gram = gram_pallas(updates, block_d, interpret)
    sq = jnp.diagonal(gram)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
    return d2 * (1.0 - jnp.eye(d2.shape[0], dtype=d2.dtype))


# ---------------------------------------------------------------------------
# Bitonic sorted-reduce (trimmed mean / median)
# ---------------------------------------------------------------------------


def _bitonic_stages(cp: int):
    """(k, j) stage pairs of a full bitonic sort network over cp rows."""
    stages = []
    k = 2
    while k <= cp:
        j = k // 2
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def _make_sorted_reduce_kernel(c: int, cp: int, mode: str, trim: int):
    stages = _bitonic_stages(cp)

    def kernel(u_ref, out_ref):
        x = u_ref[:]  # [c, BD]
        bd = x.shape[1]
        if cp > c:
            # Pad the client axis to the pow2 network size IN-KERNEL with
            # +inf sentinels (sorted to the bottom), so the [C, D] input is
            # never copied/padded in HBM — at ResNet-50 scale that copy is
            # >10 GB and OOMs the chip.
            x = jnp.concatenate(
                [x, jnp.full((cp - c, bd), jnp.inf, x.dtype)], axis=0
            )
        rows = jax.lax.broadcasted_iota(jnp.int32, (cp, 1), 0)
        for k, j in stages:
            # Partner exchange i <-> i^j via a leading-axis reshape swap
            # (j and k are Python ints; everything here is shape-static).
            # Mosaic has no `rev` lowering, so swap the pair axis with a
            # concatenate instead of [:, ::-1].
            r = x.reshape(cp // (2 * j), 2, j, bd)
            px = jnp.concatenate([r[:, 1:2], r[:, 0:1]], axis=1).reshape(cp, bd)
            lo = jnp.minimum(x, px)
            hi = jnp.maximum(x, px)
            is_lower = (rows & j) == 0
            ascending = (rows & k) == 0
            keep_lo = jnp.logical_or(
                jnp.logical_and(ascending, is_lower),
                jnp.logical_and(~ascending, ~is_lower),
            )
            x = jnp.where(keep_lo, lo, hi)
        if mode == "median":
            out_ref[:] = x[(c - 1) // 2, :][None, :]
        else:  # trimmed mean over rows [trim, c-trim)
            sel = x[trim : c - trim, :]
            out_ref[:] = jnp.mean(sel, axis=0)[None, :]

    return kernel


def sorted_reduce_pallas(updates: jnp.ndarray, mode: str = "median",
                         trim: int = 1, block_d: Optional[int] = None,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Coordinate-wise sorted reduction over the client axis.

    mode="median": lower-middle median (torch convention).
    mode="trimmed": mean of sorted rows [trim, C-trim).
    """
    if interpret is None:
        interpret = not _on_tpu()
    c, d = updates.shape
    cp = 1 << max((c - 1).bit_length(), 3)  # pow2, >= 8 sublanes
    block_d = _auto_block_d(cp, block_d, budget_bytes=2 << 20)
    nblk = d // block_d

    if nblk == 0:
        srt = jnp.sort(updates, axis=0)
        if mode == "median":
            return srt[(c - 1) // 2]
        return jnp.mean(srt[trim : c - trim], axis=0)

    # D-blocks stream straight out of the original [C, D] buffer: the client
    # axis is padded to the pow2 network size inside the kernel, and a
    # non-divisible final block is masked by Mosaic (each output column
    # depends only on its own input column, so masked lanes can't pollute
    # real ones). No HBM copies of the input are ever made.
    grid = (d + block_d - 1) // block_d
    kernel = _make_sorted_reduce_kernel(c, cp, mode, trim)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((c, block_d), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_d), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, d), jnp.float32),
        interpret=interpret,
    )(updates)
    return out[0]


# ---------------------------------------------------------------------------
# Dispatchers (used by ops.reductions / ops.pairwise when beneficial)
# ---------------------------------------------------------------------------


def use_pallas_default() -> bool:
    return _on_tpu()
