"""Space-to-depth resident layout for the fused conv-pool stem.

The round program's hot op is the SimpleCNN stem under the client vmap:
XLA lowers the stacked per-client-weight conv as ONE grouped convolution
with ``feature_group_count = C`` (replacing the reference's sequential
per-client loop, experiments/run_experiments.py:193-240), but that
grouped lowering carries a large batch-independent overhead — measured
~10x off memory-bound speed-of-light at C=100 (docs/performance.md
"Where the time goes"). A Pallas im2col-in-VMEM kernel was attempted
and falsified: Mosaic cannot express the lane-dimension regrouping that
per-client patch extraction needs (ops/client_conv.py docstring).

Space-to-depth is the classic TPU remedy for small-channel stride-2
stems, and it needs no kernel at all: re-block the RESIDENT images once
at stacking time so the per-step stem becomes plain batched GEMMs.

    image  [.., H, W, ch]          (conv 4x4 / stride 2 / pad 1 on it)
    blocks [.., HB, WB, 4*ch]      HB = (H+2)//2, 2x2 pixel blocks of
                                   the (1,1)-padded image
    stem   y = sum over (di,dj) in {0,1}^2 of
               blocks[.., di:di+OH, dj:dj+OW, :] @ w4[2di:2di+2,
                                                      2dj:2dj+2].reshape
Each term is a ``[B*OH*OW, 4ch] x [4ch, COUT]`` MXU contraction — the
exact same scalar products as the convolution (a 4x4/stride-2 window
always covers a 2x2 block neighborhood), just grouped by layout instead
of gathered by a conv op. The shipped formulation folds the four terms
back into ONE 2x2/stride-1/VALID conv over the block grid
(``s2d_stem_conv``): explicit shifted-slice GEMMs were measured slower
(sliced operands tile-pad), while the small-window stride-1 conv keeps
XLA's conv schedule and halves the stem's weight-gradient time.

Storage cost: HB*WB*4ch vs H*W*ch = ~1.31x at 28x28 (the flat resident
layout's 128-alignment keeps tile waste at zero either way) — against a
~5x per-step saving on the stem's forward+dw (benchmarks/
fused_conv_bench.py).
"""

from __future__ import annotations

import numpy as np


def s2d_block_shape(feature_shape):
    """Logical blocked shape for an image feature shape (H, W, ch)."""
    h, w, ch = feature_shape
    if h % 2 or w % 2:
        raise ValueError(f"space-to-depth stem needs even H, W; got {h}x{w}")
    return ((h + 2) // 2, (w + 2) // 2, 4 * ch)


def space_to_depth(x):
    """[..., H, W, ch] -> [..., HB, WB, 4*ch] blocks of the (1,1)-padded
    image. Block (bi, bj) feature (r*2 + c)*ch + k = padded pixel
    (2bi + r, 2bj + c, k). Works on numpy and jax arrays (pure shape ops;
    under jit everything fuses into the consumer)."""
    xp = np if isinstance(x, np.ndarray) else _jnp()
    h, w, ch = x.shape[-3:]
    hb, wb, _ = s2d_block_shape((h, w, ch))
    lead = x.shape[:-3]
    nlead = len(lead)
    pad = [(0, 0)] * nlead + [(1, 1), (1, 1), (0, 0)]
    xpad = xp.pad(x, pad)
    xb = xpad.reshape(lead + (hb, 2, wb, 2, ch))
    # (.., hb, r, wb, c, ch) -> (.., hb, wb, r, c, ch)
    perm = tuple(range(nlead)) + (nlead, nlead + 2, nlead + 1, nlead + 3,
                                  nlead + 4)
    return xp.transpose(xb, perm).reshape(lead + (hb, wb, 4 * ch))


def s2d_stem_conv(xb, w4):
    """The fused stem contraction on space-to-depth input.

    xb: [B, HB, WB, 4*ch] blocks; w4: [4, 4, ch, COUT] (the pool-window
    embedded kernel ConvPoolFused builds). Returns [B, OH, OW, COUT] with
    OH = HB - 1 — exactly ``conv_general_dilated(image, w4, (2, 2),
    ((1, 1), (1, 1)))`` up to fp summation order.

    Formulation: ONE 2x2 / stride-1 / VALID convolution over the block
    grid with the re-blocked kernel — a 4x4/stride-2 pixel window is a
    2x2 block window. An explicit 4-term shifted-GEMM sum was measured
    SLOWER than the grouped conv it replaces (6.3 vs 2.9 ms fwd at
    [100, 32]: each sliced operand's (14, 32) minor dims tile-pad 4.6x),
    while this conv form halves dw (4.2 -> 2.2 ms) and keeps fwd flat —
    the stem win comes from the layout, with XLA still picking the conv
    schedule (benchmarks: /tmp session log, docs/performance.md).
    """
    jax, jnp = _jax(), _jnp()
    ch = xb.shape[-1] // 4
    cout = w4.shape[-1]
    # [4, 4, ch, COUT] -> [2, 2, 4*ch, COUT]: kernel row (di, dj, (r, c,
    # k)) = w4[2*di + r, 2*dj + c, k] matches block feature order.
    w2 = jnp.transpose(
        w4.reshape(2, 2, 2, 2, ch, cout), (0, 2, 1, 3, 4, 5)
    ).reshape(2, 2, 4 * ch, cout)
    return jax.lax.conv_general_dilated(
        xb, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _jnp():
    import jax.numpy as jnp

    return jnp


def _jax():
    import jax

    return jax
