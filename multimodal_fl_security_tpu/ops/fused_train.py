"""Fused local-training megakernel for SimpleCNN on TPU (Pallas/Mosaic).

The design: one client's ENTIRE local training — every SGD step of
every epoch — runs inside a single Pallas kernel over grid ``(C, S)``:
weights and momentum live in VMEM scratch that persists across the S
dimension, so per-client parameters are read from HBM once per ROUND
(and written once) instead of twice per STEP. That removes the cost
the block-grouping bench isolated as the true price of per-client-
weight training — distinct-weight HBM traffic — and the per-op
dispatch floor (docs/performance.md "Feasible (round 3, probed)";
every op form used here passed `benchmarks/mosaic_probe.py` on the
real toolchain). This module holds the packed layout algebra, the
pure-JAX mirror of the kernel's training loop (the testable oracle),
and the kernel itself (ops/fused_kernel.py hosts the pallas_call).

Scope: the north-star bench workload — SimpleCNN (reference
src/models/simple_cnn.py:13-76 architecture; 423,658 tensor params at
the zero-padded 28x28x8 bench shape — 421,642 logical at 28x28x1 —
10 classes) on the space-to-depth resident layout
(ops/s2d.py), B=32, SGD momentum 0.9 + global-norm clip 1.0, exactly
the optimizer chain of rounds/engine.py::make_optimizer.

Semantics vs the engine's `make_local_train_fn`:

- identical math per step: fwd -> masked CE -> grads -> global-norm
  clip -> momentum -> lr (bf16 activations/weights in the GEMMs, f32
  master weights/momentum/reductions — the engine's dtype split);
- batch ORDER differs: the engine draws a threefry permutation per
  epoch; the kernel streams batches in resident order (epoch-repeated).
  With the engine's shuffle disabled the two are numerically
  equivalent (tested); shuffled runs are statistically equivalent
  trainers, not bitwise ones;
- dropout differs in PRNG only: the kernel uses the TPU PRNG
  (pltpu.prng_*, reseeded per (client, step) — masks are REGENERATED
  in the backward pass by reseeding, never stored), the engine uses
  threefry. Same rates (0.25 flatten / 0.5 hidden), same 1/keep
  scaling.

Data layout (all 128-lane aligned, zero tile padding):

    s2d blocks [B, 15, 15, 32]  ->  X [B, 60, 128]
        rows  = (bi in 0..14) * 4 + jq
        lanes = jr * 32 + ch,   block column bj = jq * 4 + jr
        (bj = 15 is a zero pad column; 15*15*32 = 7200 -> 60*128 = 7680)

The same (rows=(i, jq), lanes=(jr, ch)) packing carries through every
layer — no lane-dimension regrouping anywhere (the Mosaic wall that
killed the stem-conv kernel family, ops/client_conv.py). Convolution
taps become lane/row rolls + iota-masked selects; the stem/conv2
weights are embedded block-diagonally over jr so each tap is one MXU
GEMM; max-pool compacts rows by a sublane reshape and leaves lane
holes that the fc1 packing simply never reads.

Reference parity: the reference has no kernel code at all (pure
torch); this file exists to beat its headline round rate, not to
mirror any of its source.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Kernel geometry for the 28x28x8 / 10-class SimpleCNN.
B = 32          # local batch size
HB = WB = 15    # s2d block grid of the (1,1)-padded 28x28 image
JQ, JR = 4, 4   # block-column packing: bj = jq*4 + jr  (capacity 16)
R0 = HB * JQ    # 60 activation rows
L0 = JR * 32    # 128 lanes: (jr, 32 block channels)
CH1 = 32        # stem output channels
CH2 = 64        # conv2 output channels
HID = 128       # fc1 width
NCLS = 10       # classes (lane-padded to 128)


# ===================================================================
# Parameter packing: flax SimpleCNN pytree <-> kernel tensors
# ===================================================================
#
# Kernel parameter set (per client):
#   w_stem [4, 512, 128]  g-th pool group's tap-stacked block-diag weight:
#                         [t*128 + jr*32 + ci, jr*32 + co] = w4[g,t][ci,co]
#   b_stem [1, 128]       stem bias tiled over jr: lane jr*32+co = b[co]
#   w_cv2  [9, 128, 256]  tap t block-diag: [jr*32+ci, jr*64+co] = k2[t][ci,co]
#   b_cv2  [1, 256]       conv2 bias tiled over jr (4x64)
#   w_fc1  [28, 128, 128] [r, s*64+ci, f] = fc1[flat(i, j', ci), f] with
#                         r = i*4+jq, j' = jq*2+s (s in {0,1}); the
#                         (jq=3, s=1) slot (j'=7, out of range) is zero
#   b_fc1  [1, 128]
#   w_fc2  [128, 128]     columns >= 10 zero
#   b_fc2  [1, 128]       lanes >= 10 zero


def _stem_taps(kernel: jnp.ndarray) -> jnp.ndarray:
    """flax ConvPoolFused kernel [3,3,cin,32] -> s2d tap weights
    [4 pool groups g, 4 taps t=(r,c), 2,2,cin -> flattened 4*cin, 32].

    The fused stem is a 4x4/stride-2 conv whose (g=(di,dj))-th output
    group embeds the 3x3 kernel at offset (di,dj) (simple_cnn.py
    ConvPoolFused); on the s2d block grid that 4x4 window is a 2x2
    block neighborhood, tap (r,c) covering pixel rows 2r..2r+1 / cols
    2c..2c+1 of the window (ops/s2d.py docstring).
    """
    cin = kernel.shape[2]
    w4 = jnp.zeros((4, 4, cin, 4 * CH1), kernel.dtype)
    for g, (di, dj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        w4 = w4.at[di:di + 3, dj:dj + 3, :, g * CH1:(g + 1) * CH1].set(kernel)
    # 4x4 spatial -> 2x2 blocks of 2x2 pixels: tap (r, c) takes pixel
    # rows 2r:2r+2, cols 2c:2c+2. s2d feature index = (pr*2 + pc)*cin + k.
    taps = []
    for r in range(2):
        for c in range(2):
            blk = w4[2 * r:2 * r + 2, 2 * c:2 * c + 2]     # [2,2,cin,128]
            blk = blk.reshape(4 * cin, 4 * CH1)            # (pr,pc,k) flat
            taps.append(blk)
    t = jnp.stack(taps)                                    # [4, 4cin, 128]
    # split the 4 pool groups g out of the output dim -> [4g, 4t, 4cin, 32]
    return jnp.transpose(
        t.reshape(4, 4 * cin, 4, CH1), (2, 0, 1, 3)
    )


def pack_params(params: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """flax SimpleCNN params (fused_stem variant) -> kernel tensors."""
    k_stem = params["ConvPoolFused_0"]["kernel"].astype(jnp.float32)
    b_stem = params["ConvPoolFused_0"]["bias"].astype(jnp.float32)
    k_cv2 = params["Conv_0"]["kernel"].astype(jnp.float32)   # [3,3,32,64]
    b_cv2 = params["Conv_0"]["bias"].astype(jnp.float32)
    w_fc1 = params["Dense_0"]["kernel"].astype(jnp.float32)  # [3136,128]
    b_fc1 = params["Dense_0"]["bias"].astype(jnp.float32)
    w_fc2 = params["Dense_1"]["kernel"].astype(jnp.float32)  # [128,10]
    b_fc2 = params["Dense_1"]["bias"].astype(jnp.float32)

    taps = _stem_taps(k_stem)                    # [4g, 4t, cin, 32]
    w_stem = jnp.zeros((4, 4 * L0, L0), jnp.float32)
    for t in range(4):
        for jr in range(JR):
            w_stem = w_stem.at[
                :, t * L0 + jr * 32:t * L0 + jr * 32 + 32,
                jr * 32:jr * 32 + 32].set(taps[:, t, :, :])
    bs = jnp.tile(b_stem, JR)[None]              # [1, 128]

    w_cv2 = jnp.zeros((9, L0, 256), jnp.float32)
    k2 = k_cv2.reshape(9, CH1, CH2)              # taps in (di, dj) order
    for t in range(9):
        for jr in range(JR):
            w_cv2 = w_cv2.at[
                t, jr * 32:jr * 32 + 32, jr * 64:jr * 64 + 64].set(k2[t])
    bc = jnp.tile(b_cv2, JR)[None]               # [1, 256]

    # fc1: logical flatten index of the flax model is (i, j, ch) row-major
    # over the [7, 7, 64] pooled map; kernel row r = i*4 + jq holds
    # j' = jq*2 + s for lane slice s in {0, 1}.
    w1 = jnp.zeros((28, 128, HID), jnp.float32)
    wl = w_fc1.reshape(7, 7, CH2, HID)
    for i in range(7):
        for jq in range(4):
            for s in range(2):
                jp = jq * 2 + s
                if jp >= 7:
                    continue
                w1 = w1.at[i * 4 + jq, s * 64:s * 64 + 64].set(wl[i, jp])

    w2 = jnp.zeros((128, 128), jnp.float32)
    w2 = w2.at[:, :NCLS].set(w_fc2)
    b2 = jnp.zeros((128,), jnp.float32).at[:NCLS].set(b_fc2)
    return {
        "w_stem": w_stem, "b_stem": bs,
        "w_cv2": w_cv2, "b_cv2": bc,
        "w_fc1": w1, "b_fc1": jnp.asarray(b_fc1)[None],
        "w_fc2": w2, "b_fc2": b2[None],
    }


def unpack_params(packed: Dict[str, jnp.ndarray],
                  like: Dict[str, Any]) -> Dict[str, Any]:
    """Kernel tensors -> flax pytree (inverse of pack_params).

    Reads each logical weight from its FIRST embedded copy (all copies
    stay equal: gradients are consolidated across copies before the
    update, see the kernel's wgrad section).
    """
    cin = like["ConvPoolFused_0"]["kernel"].shape[2]

    # stem: every jr-diagonal block is a full copy of the logical
    # [4cin, 32] tap (all copies stay equal — gradients are consolidated
    # across copies before the update); read the jr=0 copy.
    taps = jnp.stack([
        packed["w_stem"][:, t * L0:t * L0 + 4 * cin, 0:CH1]
        for t in range(4)
    ], axis=1)                                   # [4g, 4t, 4cin, 32]
    # invert _stem_taps: rebuild w4 then extract the 3x3 kernel at g=0
    w4 = jnp.zeros((4, 4, cin, 4 * CH1), jnp.float32)
    for t, (r, c) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        blk = taps[:, t].reshape(4, 2, 2, cin, CH1)
        for g in range(4):
            w4 = w4.at[2 * r:2 * r + 2, 2 * c:2 * c + 2, :,
                       g * CH1:(g + 1) * CH1].set(blk[g])
    kernel = w4[0:3, 0:3, :, 0:CH1]  # g=0 embeds k at offset (0,0)
    bias = packed["b_stem"][0, 0:CH1]

    k2 = jnp.stack([packed["w_cv2"][t, 0:CH1, 0:CH2] for t in range(9)])
    k_cv2 = k2.reshape(3, 3, CH1, CH2)
    b_cv2 = packed["b_cv2"][0, 0:CH2]

    wl = jnp.zeros((7, 7, CH2, HID), jnp.float32)
    for i in range(7):
        for jq in range(4):
            for s in range(2):
                jp = jq * 2 + s
                if jp >= 7:
                    continue
                wl = wl.at[i, jp].set(
                    packed["w_fc1"][i * 4 + jq, s * 64:s * 64 + 64])
    out = {
        "ConvPoolFused_0": {"kernel": kernel, "bias": bias},
        "Conv_0": {"kernel": k_cv2, "bias": b_cv2},
        "Dense_0": {"kernel": wl.reshape(7 * 7 * CH2, HID),
                    "bias": packed["b_fc1"][0]},
        "Dense_1": {"kernel": packed["w_fc2"][:, :NCLS],
                    "bias": packed["b_fc2"][0, :NCLS]},
    }
    return jax.tree_util.tree_map(
        lambda a, b: a.astype(b.dtype).reshape(b.shape), out, like)


def pack_blocks(x_s2d: jnp.ndarray) -> jnp.ndarray:
    """s2d blocks [..., 15, 15, 32] -> kernel layout [..., 60, 128].

    rows = bi*4 + jq, lanes = jr*32 + ch, bj = jq*4 + jr (bj=15 pad 0).
    """
    lead = x_s2d.shape[:-3]
    pad = jnp.zeros(lead + (HB, 1, 32), x_s2d.dtype)
    x = jnp.concatenate([x_s2d, pad], axis=-2)          # [..., 15, 16, 32]
    x = x.reshape(lead + (HB, JQ, JR, 32))
    # (bi, jq) -> rows, (jr, ch) -> lanes
    return x.reshape(lead + (R0, L0))


def unpack_blocks(x: jnp.ndarray) -> jnp.ndarray:
    lead = x.shape[:-2]
    v = x.reshape(lead + (HB, JQ, JR, 32)).reshape(lead + (HB, 16, 32))
    return v[..., :WB, :]


def pack_pooled(x: jnp.ndarray) -> jnp.ndarray:
    """Logical pooled map [..., 7, 7, 64] -> the packed layout of h3
    [..., 28, 128]: row r = i*4 + jq, lanes s*64 + ci for j' = jq*2 + s
    (the (jq=3, s=1) slot is a hole — same packing as w_fc1's rows).
    Used to carry logical-space dropout masks into mirror_forward."""
    lead = x.shape[:-3]
    out = jnp.zeros(lead + (28, 128), x.dtype)
    for i in range(7):
        for jq in range(4):
            for s in range(2):
                jp = jq * 2 + s
                if jp >= 7:
                    continue
                out = out.at[..., i * 4 + jq, s * 64:s * 64 + 64].set(
                    x[..., i, jp, :])
    return out


# ===================================================================
# Pure-JAX mirror of the kernel algorithm (the CPU-testable oracle)
# ===================================================================
#
# Every op below has a 1:1 Pallas/Mosaic counterpart that passed
# benchmarks/mosaic_probe.py; the mirror exists so the layout algebra
# (shifts, masks, pool compaction, packed GEMMs) is verified against
# the flax model on CPU before any TPU compile, and so the kernel has
# an exact reference for its own equivalence test.

def _roll(x, shift, axis):
    """np.roll semantics (positive = toward higher indices)."""
    return jnp.roll(x, shift, axis)


def _shift_bj_plus(x, lanes_per_jr, roll=_roll):
    """Value at (row, bj+1) in (rows=(i,jq), lanes=(jr,ch)) packing.

    jr+1 within the 128*k lane block for jr<3; the jr=3 group carries
    into jq+1 = row+1. ``lanes_per_jr`` = 32 (stem) or 64 (conv2)."""
    nl = x.shape[-1]
    base = roll(x, -lanes_per_jr, -1)
    fix = roll(base, -1, -2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < nl - lanes_per_jr, base, fix)


def _shift_bj_minus(x, lanes_per_jr, roll=_roll):
    """Value at (row, bj-1); jr=0 carries into jq-1 = row-1."""
    base = roll(x, lanes_per_jr, -1)
    fix = roll(base, 1, -2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane >= lanes_per_jr, base, fix)


def _shift_bi(x, d, roll=_roll):
    """Value at (bi+d, same jq/lanes): rows move by 4*d."""
    return roll(x, -4 * d, -2)


def _valid_mask(shape, lanes_per_jr, limit=14):
    """1.0 where the packed position maps to a spatial (i, j) with
    i < limit and j = (row%4)*4 + lane//lanes_per_jr < limit."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    i = rows // 4
    j = (rows % 4) * 4 + lane // lanes_per_jr
    return ((i < limit) & (j < limit)).astype(jnp.float32)


def _fmax(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise max computed in f32 when operands are sub-32-bit:
    Mosaic on v5e has no bf16 vector compare ("Target does not support
    this comparison", measured on-chip 2026-08-20; the compare comes
    from both max itself and its VJP's eq-routing). Upcast-max-downcast
    is bit-exact for bf16 operands (bf16 is a subset of f32)."""
    if a.dtype.itemsize != 4:
        return jnp.maximum(a.astype(jnp.float32),
                           b.astype(jnp.float32)).astype(a.dtype)
    return jnp.maximum(a, b)


def _frelu(x: jnp.ndarray) -> jnp.ndarray:
    """relu via f32 compare (see _fmax); bit-exact for bf16."""
    if x.dtype.itemsize != 4:
        return jax.nn.relu(x.astype(jnp.float32)).astype(x.dtype)
    return jax.nn.relu(x)


def _dot3d(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[B, R, K] x [K, F] -> [B, R, F] (kernel overrides with a
    custom_vjp that steers AD to Mosaic-probed contraction forms)."""
    return jnp.einsum("brk,kf->brf", a, w)


def _bdot(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[R, B, K] x [R, K, F] -> [R, B, F] batched over the major axis."""
    return jnp.einsum("rbk,rkf->rbf", a, w)


def forward_impl(pk: Dict[str, jnp.ndarray], xblk: jnp.ndarray,
                 dropout_masks=None, compute_dtype: Any = jnp.float32,
                 roll=_roll, dot3d=_dot3d, bdot=_bdot) -> jnp.ndarray:
    """Packed-layout SimpleCNN forward: xblk [B, 60, 128] -> logits
    [B, 128] (lanes >= 10 are junk; mask downstream).

    Parametrized over the three op families whose Pallas/Mosaic
    spellings differ from the jnp ones (roll, 3D-by-2D dot, batched
    dot) so the SAME code is both the CPU-testable mirror and the
    kernel body's forward."""
    cd = compute_dtype
    x = xblk.astype(cd)

    # ---- stem: 4 taps x 4 pool groups, block-diag GEMMs, max, relu
    # Per-tap K=128 dots against static 128-row slices of w_stem[g],
    # summed — algebraically the lane-concat [B,60,512] x [512,128] form,
    # but without the concat: Mosaic cannot concatenate a sublane-rolled
    # operand (a10 carries a {4,0} vpad offset; measured on-chip
    # 2026-08-19 "result/input offset mismatch on non-concat dimension").
    a00 = x
    a01 = _shift_bj_plus(x, 32, roll)
    a10 = _shift_bi(x, 1, roll)
    a11 = _shift_bj_plus(a10, 32, roll)
    taps = (a00, a01, a10, a11)
    zs = []
    for g in range(4):
        wg = pk["w_stem"][g].astype(cd)
        acc = dot3d(taps[0], wg[0:128])
        for t in range(1, 4):
            acc = acc + dot3d(taps[t], wg[t * 128:(t + 1) * 128])
        zs.append(acc)
    z = _fmax(_fmax(zs[0], zs[1]), _fmax(zs[2], zs[3]))
    h1 = _frelu(z + pk["b_stem"].astype(cd))
    h1 = h1 * _valid_mask(h1.shape, 32).astype(cd)          # [B,60,128]

    # ---- conv2: 9 taps, accumulate block-diag GEMMs, relu
    z2 = jnp.zeros(h1.shape[:-1] + (256,), cd)
    for t in range(9):
        di, dj = t // 3 - 1, t % 3 - 1
        a = h1
        if di:
            a = _shift_bi(a, di, roll)
        if dj == 1:
            a = _shift_bj_plus(a, 32, roll)
        elif dj == -1:
            a = _shift_bj_minus(a, 32, roll)
        z2 = z2 + dot3d(a, pk["w_cv2"][t].astype(cd))
    h2 = _frelu(z2 + pk["b_cv2"].astype(cd))
    h2 = h2 * _valid_mask(h2.shape, 64).astype(cd)          # [B,60,256]

    # ---- 2x2 max pool: rows by sublane reshape, lanes by roll+max
    r2 = h2[..., :56, :].reshape(h2.shape[:-2] + (7, 2, 4, 256))
    pr = _fmax(r2[..., 0, :, :], r2[..., 1, :, :])
    pr = pr.reshape(h2.shape[:-2] + (28, 256))
    jm = _fmax(pr, roll(pr, -64, -1))
    h3 = jnp.concatenate([jm[..., 0:64], jm[..., 128:192]], axis=-1)
    if dropout_masks is not None:
        h3 = h3 * dropout_masks[0].astype(cd)               # [B,28,128]

    # ---- fc1 as a batched dot over row positions, then reduce
    t3 = jnp.swapaxes(h3, -3, -2)                           # [28,B,128]
    part = bdot(t3, pk["w_fc1"].astype(cd))
    h4 = _frelu(part.sum(-3) + pk["b_fc1"].astype(cd))       # [B,128]
    if dropout_masks is not None:
        h4 = h4 * dropout_masks[1].astype(cd)

    # ---- head (f32 like the flax model's Dense_1)
    return (h4.astype(jnp.float32) @ pk["w_fc2"]
            + pk["b_fc2"]).astype(jnp.float32)


def mirror_forward(pk: Dict[str, jnp.ndarray], xblk: jnp.ndarray,
                   dropout_masks: Tuple[jnp.ndarray, jnp.ndarray] | None
                   = None,
                   compute_dtype: Any = jnp.float32) -> jnp.ndarray:
    """The pure-jnp spelling of forward_impl (the CPU-testable oracle).

    ``dropout_masks`` = (m1 [B,28,128] on the pooled activations,
    m2 [B,128] on the hidden layer), already scaled by 1/keep — None
    for eval. Numerically identical to SimpleCNN(...).apply on the s2d
    path (tested in tests/test_fused_train.py)."""
    return forward_impl(pk, xblk, dropout_masks=dropout_masks,
                        compute_dtype=compute_dtype)


# ===================================================================
# Packed-space SGD: gradient consolidation + the mirror training loop
# ===================================================================
#
# ``pack_params`` is a LINEAR map P from the flax pytree to the kernel
# tensors; embedded weight copies and structurally-zero slots mean P is
# injective but not surjective. AD of the packed loss gives per-copy
# cotangents g_packed; the true gradient of the logical weights is
# P^T g_packed ("fold"), and the only packed-space update that keeps
# every copy equal to its logical value is
#
#     packed' = packed + P(delta_logical)
#
# i.e. the optimizer (clip -> momentum -> lr) runs in LOGICAL space —
# also what makes the global-norm clip count each logical weight
# exactly once. ``consolidate_grads`` = P P^T is the projection of raw
# packed cotangents onto consistently-tied gradients (every copy slot
# holds the consolidated value, structural zeros stay zero). The Pallas
# kernel implements P / P^T with constant selector matmuls; here they
# are jax.vjp of pack_params, so the mirror defines the semantics the
# kernel must match.


def fold_grads(g_packed: Dict[str, jnp.ndarray],
               like: Dict[str, Any]) -> Dict[str, Any]:
    """P^T: packed cotangents -> logical flax-pytree gradients.

    Sums every embedded copy's contribution into its logical slot and
    drops structurally-zero slots. ``like`` supplies the pytree
    structure/shapes (values unused: pack_params is linear)."""
    _, vjp = jax.vjp(pack_params, like)
    (g,) = vjp(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), g_packed))
    return jax.tree_util.tree_map(
        lambda a, b: a.astype(jnp.float32).reshape(b.shape), g, like)


def consolidate_grads(g_packed: Dict[str, jnp.ndarray],
                      like: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """P P^T: raw packed cotangents -> consolidated packed gradients.

    After this, every embedded copy slot holds the full (summed)
    logical gradient and every structurally-zero slot is exactly zero —
    the invariant ``unpack_params`` relies on. (Not idempotent: P^T P
    is the copy-multiplicity diagonal, so consolidate twice and each
    logical gradient is multiplied by its copy count — fold once, pack
    once.)"""
    return pack_params(fold_grads(g_packed, like))


def _logical_global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(tree)))


def packed_sgd_step(pk: Dict[str, jnp.ndarray], g_packed, momentum_tree,
                    like, lr: float, momentum: float = 0.9,
                    clip_norm: float = 1.0):
    """ONE SGD step applied in packed space; returns (pk', momentum').

    Exactly rounds/engine.py::make_optimizer's chain (clip_by_global_norm
    -> trace(momentum) -> scale(-lr)) run on the folded logical
    gradients, with the delta re-packed. ``momentum_tree`` is a logical
    pytree (the kernel keeps it as packed scratch; same values)."""
    g = fold_grads(g_packed, like)
    if clip_norm and clip_norm > 0:
        norm = _logical_global_norm(g)
        scale = clip_norm / jnp.maximum(norm, clip_norm)
        g = jax.tree_util.tree_map(lambda x: x * scale, g)
    new_mom = jax.tree_util.tree_map(
        lambda gi, mi: gi + momentum * mi, g, momentum_tree)
    delta = jax.tree_util.tree_map(lambda m: -lr * m, new_mom)
    new_pk = jax.tree_util.tree_map(
        lambda a, b: a + b, pk, pack_params(delta))
    return new_pk, new_mom


def packed_ce(logits: jnp.ndarray, onehot: jnp.ndarray,
              bmask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean CE on packed logits [B, 128] (lanes >= NCLS junk).

    Same value as engine.cross_entropy on the first NCLS lanes."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    zm = jnp.where(lanes < NCLS, logits.astype(jnp.float32), -1e30)
    logp = zm - jax.scipy.special.logsumexp(zm, axis=1, keepdims=True)
    # keepdims end-to-end: 1-D [B] intermediates hit a Mosaic relayout
    # wall ("Non-singleton logical dimension is replicated ...",
    # measured on-chip 2026-08-19) — 2-D [B,1] shapes lower cleanly.
    nll = -jnp.sum(onehot * logp, axis=1, keepdims=True)    # [B,1]
    bm = bmask.reshape(bmask.shape[0], -1)[:, :1]
    return jnp.sum(nll * bm) / jnp.maximum(jnp.sum(bm), 1.0)


def mirror_local_train(params: Dict[str, Any], xblk: jnp.ndarray,
                       onehot: jnp.ndarray, bmask: jnp.ndarray,
                       lr: float, momentum: float = 0.9,
                       clip_norm: float = 1.0, local_epochs: int = 1,
                       dropout_masks=None,
                       compute_dtype: Any = jnp.float32) -> Dict[str, Any]:
    """The kernel's FULL local-training loop in pure JAX (the oracle).

    Streams batches in resident order (epoch-repeated, no shuffle),
    which is the kernel's batch schedule. ``xblk`` [N, 60, 128] packed
    blocks, ``onehot`` [N, 128] (lanes >= NCLS zero), ``bmask`` [N].
    ``dropout_masks`` = (m1 [S, B, 28, 128], m2 [S, B, 128]) pre-scaled
    by 1/keep, indexed by global step — None disables dropout (the
    kernel regenerates masks from the TPU PRNG instead; see module
    docstring). Returns the updated flax pytree."""
    n = xblk.shape[0]
    steps = n // B
    pk = pack_params(params)
    mom = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x, jnp.float32), params)

    def step_fn(carry, s):
        pk, mom = carry
        i = (s % steps) * B
        xb = jax.lax.dynamic_slice_in_dim(xblk, i, B, 0)
        oh = jax.lax.dynamic_slice_in_dim(onehot, i, B, 0)
        bm = jax.lax.dynamic_slice_in_dim(bmask, i, B, 0)
        dm = (None if dropout_masks is None
              else (dropout_masks[0][s], dropout_masks[1][s]))

        def loss(pk):
            logits = mirror_forward(pk, xb, dropout_masks=dm,
                                    compute_dtype=compute_dtype)
            return packed_ce(logits, oh, bm)

        g_packed = jax.grad(loss)(pk)
        pk, mom = packed_sgd_step(pk, g_packed, mom, params, lr,
                                  momentum, clip_norm)
        return (pk, mom), None

    (pk, _), _ = jax.lax.scan(
        step_fn, (pk, mom), jnp.arange(local_epochs * steps))
    return unpack_params(pk, params)
