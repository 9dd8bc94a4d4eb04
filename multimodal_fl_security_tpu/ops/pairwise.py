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
    """Squared Euclidean distance matrix [C, C] from updates [C, D]."""
    c, d = updates.shape
    centered = updates - jnp.mean(updates, axis=0, keepdims=True)

    if d <= block_d:
        gram = jnp.dot(centered, centered.T, preferred_element_type=jnp.float32)
    else:
        # Blockwise over D: pad to a whole number of blocks and scan.
        nblk = -(-d // block_d)
        pad = nblk * block_d - d
        padded = jnp.pad(centered, ((0, 0), (0, pad)))
        blocks = padded.reshape(c, nblk, block_d).transpose(1, 0, 2)

        def body(acc, blk):
            return acc + jnp.dot(blk, blk.T, preferred_element_type=jnp.float32), None

        gram, _ = jax.lax.scan(body, jnp.zeros((c, c), jnp.float32), blocks)

    sq_norms = jnp.diagonal(gram)
    d2 = sq_norms[:, None] + sq_norms[None, :] - 2.0 * gram
    d2 = jnp.maximum(d2, 0.0)
    # Exact zeros on the diagonal.
    return d2 * (1.0 - jnp.eye(c, dtype=d2.dtype))


def pairwise_dists(updates: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Euclidean distance matrix (the reference's Krum uses unsquared L2)."""
    return jnp.sqrt(pairwise_sq_dists(updates, **kwargs))
