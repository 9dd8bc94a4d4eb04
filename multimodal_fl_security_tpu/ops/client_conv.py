"""FALSIFIED — kept only as the record of a dead kernel family.

This kernel is NOT buildable on the current Mosaic toolchain (three
compiler walls, errors recorded in docs/performance.md "Falsified
(round 3): Pallas im2col-in-VMEM stem kernel") and is NOT wired into
any product path: ``__all__`` is empty, nothing in the package imports
it, and only tests/test_pallas_kernels.py touches it (interpret-mode
equivalence, preserving the numerical record). Do not dispatch to it.
The shipped remedy is the space-to-depth layout (ops/s2d.py); the
shipped per-client-training kernel is ops/fused_train.py.

Original design notes follow.

Per-client-weight fused stem conv as a Pallas TPU kernel.

The engine's hot op is the SimpleCNN stem under the client vmap: every
client trains its OWN weights, so XLA lowers the stacked conv as ONE
grouped convolution with ``feature_group_count = C`` (reference hot loop
it replaces: experiments/run_experiments.py:193-240 trains clients
sequentially; here they are one op). Measured on v5e, that grouped
lowering runs ~10x off memory-bound speed-of-light with a large
batch-independent component (docs/performance.md "Where the time goes").

This kernel computes the SAME contraction client-by-client on the MXU:

    grid = (C,); per step:  x[c] [B, H*W*ch]  --DMA-->  VMEM
        patches = 16 strided taps of x[c]     (VPU, in VMEM)
        y[c] = patches @ w[c]                 (one [B*196, 128] x [128, 128]
                                               MXU GEMM per client)

Patch extraction happens in VMEM — nothing but x and y ever touch HBM,
which is what the falsified XLA-level im2col could not avoid
(benchmarks/conv_formulation_bench.py: conv_general_dilated_patches +
dot_general materializes [C, B*196, 128] patches through HBM and LOSES
to the grouped lowering; see docs/performance.md).

Shape contract (the bench/engine stem, ConvPoolFused in
models/simple_cnn.py): input [C, B, 28, 28, 8] stored flat [C, B, 6272],
4x4 kernel, stride 2, padding (1, 1), 128 output channels (4 pool-window
groups x 32 features) -> y [C, B, 14, 14, 128]. The caller applies the
group-max / bias / relu (cheap, XLA-fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Falsified kernel family: nothing is exported (see module banner).
__all__: list = []

H = W = 28
CH = 8
OH = OW = 14
KHW = 4            # fused stem kernel size (4x4, stride 2)
PATCH = KHW * KHW * CH   # 128 — one MXU contraction dim, no padding
COUT = 128               # 4 groups x 32 features


def _stem_kernel(x_ref, w_ref, y_ref, patches):
    """x_ref: [1, B, H*W*CH]; w_ref: [1, PATCH, COUT];
    y_ref: [1, B*196, COUT]; patches: VMEM scratch [B*196, PATCH].

    The 16 (di, dj) stride-2 taps of the padded input are written into
    lane-slices of the 2-D scratch in (di, dj, ch) patch order — matching
    w4.reshape(PATCH, COUT) of a [4, 4, 8, 128] kernel — then contracted
    in ONE MXU GEMM. Two Mosaic-dialect constraints shape this:

    * strided slices (``[di:di+27:2]``) lower to an unsupported gather,
      so stride-2 is a contiguous 28-slice -> reshape-to-pairs ->
      take-first, which lowers to plain slices (input padded to 32 so
      every window and its discarded pair-partner stay in bounds);
    * concatenating the 16 taps into a [B,14,14,128] value crashes the
      compiler backend at grid sizes >= 16, while lane-slice *stores*
      into a 2-D scratch compile at every grid size tested — hence the
      scratch buffer instead of jnp.concatenate.
    """
    b = x_ref.shape[1]
    x = x_ref[0].reshape(b, H, W, CH)
    # conv padding is (1, 1); the extra (0, 2) tail rows/cols only feed
    # the reshape-pair trick and are never selected.
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    for di in range(KHW):
        rows = xp[:, di:di + 28, :, :].reshape(b, OH, 2, 32, CH)[:, :, 0]
        for dj in range(KHW):
            tap = rows[:, :, dj:dj + 28, :].reshape(b, OH, OW, 2, CH)[:, :, :, 0]
            off = (di * KHW + dj) * CH
            patches[:, off:off + CH] = tap.reshape(b * OH * OW, CH)
    y_ref[0] = jnp.dot(
        patches[...], w_ref[0], preferred_element_type=jnp.float32
    ).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def client_stem_conv(x_flat: jnp.ndarray, w4: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Per-client stem conv: [C, B, 6272] x [C, 4, 4, 8, 128] -> [C, B, 14, 14, 128].

    ``w4`` is the embedded pool-window kernel ConvPoolFused builds
    (models/simple_cnn.py:50-53). Output dtype follows x (bf16 in, bf16
    out; accumulation is f32 on the MXU either way).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, b, d = x_flat.shape
    assert d == H * W * CH, (x_flat.shape,)
    w = w4.reshape(c, PATCH, COUT)
    y = pl.pallas_call(
        _stem_kernel,
        out_shape=jax.ShapeDtypeStruct((c, b * OH * OW, COUT), x_flat.dtype),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, b, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PATCH, COUT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b * OH * OW, COUT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b * OH * OW, PATCH), x_flat.dtype)],
        interpret=interpret,
    )(x_flat, w)
    return y.reshape(c, b, OH, OW, COUT)


def client_stem_conv_reference(x_flat: jnp.ndarray,
                               w4: jnp.ndarray) -> jnp.ndarray:
    """XLA grouped-conv reference (exactly what the vmapped model runs)."""
    c, b, d = x_flat.shape
    x = x_flat.reshape(c, b, H, W, CH)

    def one(xc, wc):
        return jax.lax.conv_general_dilated(
            xc, wc, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return jax.vmap(one)(x, w4)
