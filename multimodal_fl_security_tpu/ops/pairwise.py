"""Pairwise distance ops over the client axis.

The reference computes Krum's O(n^2) distance matrix with a Python double
loop of ``torch.norm`` calls (reference: src/defenses/krum.py:73-99). Here
the whole matrix is one [C, D] x [D, C] Gram matmul on the MXU::

    ||u_i - u_j||^2 = ||u_i||^2 + ||u_j||^2 - 2 <u_i, u_j>

Updates are mean-centered first: distances are translation-invariant, and
centering shrinks the vector norms by orders of magnitude, which keeps the
Gram-trick cancellation error negligible in float32 even for near-identical
parameter vectors with large norms.

For very large D (e.g. ResNet-50's 25M params) the Gram matmul is computed
in D-blocks via ``lax.scan`` so the peak live footprint stays bounded; a
Pallas kernel with explicit HBM->VMEM double-buffering is provided in
``ops.pallas_kernels`` for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dists(updates: jnp.ndarray, block_d: int = 1 << 22) -> jnp.ndarray:
    """Squared Euclidean distance matrix [C, C] from updates [C, D].

    For large D the Gram matrix accumulates over in-place slices of the
    input with the mean-centering fused per block — the centered [C, D]
    matrix is NEVER materialized (at ResNet-50 scale that copy alone is
    10 GB and OOMs a 16 GB chip).
    """
    c, d = updates.shape
    mean = jnp.mean(updates, axis=0, keepdims=True)

    if d <= block_d:
        centered = updates - mean
        gram = jnp.dot(centered, centered.T, preferred_element_type=jnp.float32)
    else:
        nblk = d // block_d

        def body(acc, i):
            blk = jax.lax.dynamic_slice(updates, (0, i * block_d), (c, block_d))
            mblk = jax.lax.dynamic_slice(mean, (0, i * block_d), (1, block_d))
            cb = blk - mblk
            return acc + jnp.dot(cb, cb.T,
                                 preferred_element_type=jnp.float32), None

        gram, _ = jax.lax.scan(
            body, jnp.zeros((c, c), jnp.float32), jnp.arange(nblk)
        )
        rem = d - nblk * block_d
        if rem:
            tail = updates[:, nblk * block_d :] - mean[:, nblk * block_d :]
            gram = gram + jnp.dot(tail, tail.T,
                                  preferred_element_type=jnp.float32)

    sq_norms = jnp.diagonal(gram)
    d2 = sq_norms[:, None] + sq_norms[None, :] - 2.0 * gram
    d2 = jnp.maximum(d2, 0.0)
    # Exact zeros on the diagonal.
    return d2 * (1.0 - jnp.eye(c, dtype=d2.dtype))


#: D above which the fused Pallas kernel beats XLA's lowering on TPU
#: (measured: 34 ms vs 50 ms at [100, 25M] on v5e).
PALLAS_MIN_D = 2_000_000


def _use_pallas(d: int) -> bool:
    try:
        return d >= PALLAS_MIN_D and jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def pairwise_dists(updates: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Euclidean distance matrix (the reference's Krum uses unsquared L2).

    Dispatches to the fused Pallas gram kernel for large D on TPU.
    """
    if _use_pallas(updates.shape[1]):
        from multimodal_fl_security_tpu.ops.pallas_kernels import (
            pairwise_sq_dists_pallas,
        )

        return jnp.sqrt(pairwise_sq_dists_pallas(updates, interpret=False))
    return jnp.sqrt(pairwise_sq_dists(updates, **kwargs))
