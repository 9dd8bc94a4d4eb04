"""Mosaic feasibility probes for the fused local-training megakernel.

The fused kernel (ops/fused_train.py) keeps one client's full local
training — all epochs x steps of SGD on SimpleCNN — inside a single
Pallas kernel so weights never leave VMEM between steps. Its design
avoids every Mosaic wall recorded in docs/performance.md (no lane-dim
regrouping: activations keep a fixed rows=(i, jq), lanes=(jr, ch)
layout through every layer), but it leans on ops whose Mosaic support
is undocumented. This script compiles each one in isolation on the
real toolchain and checks numerics vs XLA, so the kernel is built on
measured ground, not guesses.

Run: python benchmarks/mosaic_probe.py   (needs a TPU; each probe
prints PASS/FAIL-with-error so a wall is attributable to one op.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = []


def probe(name):
    def deco(fn):
        @functools.wraps(fn)
        def run():
            try:
                fn()
                RESULTS.append((name, "PASS", ""))
                print(f"PASS {name}")
            except Exception as e:  # noqa: BLE001 - record and continue
                msg = "".join(traceback.format_exception_only(type(e), e))
                RESULTS.append((name, "FAIL", msg.strip()))
                print(f"FAIL {name}: {msg.splitlines()[0][:200]}")
        run._probe = True
        return run
    return deco


def _call(kernel, out_shape, *args, **kw):
    return pl.pallas_call(kernel, out_shape=out_shape, **kw)(*args)


# ---------------------------------------------------------------- reshapes
@probe("split_lanes_128: [B,7680]->[B,60,128]")
def p_split():
    x = jnp.arange(32 * 7680, dtype=jnp.float32).reshape(32, 7680)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(32, 60, 128)

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct((32, 60, 128), x.dtype), x))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).reshape(32, 60, 128))


@probe("merge_major_sublane: [32,60,128]->[1920,128]")
def p_merge():
    x = jnp.arange(32 * 60 * 128, dtype=jnp.float32).reshape(32, 60, 128)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1920, 128)

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct((1920, 128), x.dtype), x))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).reshape(1920, 128))


# ------------------------------------------------------------------- rolls
@probe("row_roll: roll axis=1 of [32,60,128]")
def p_rowroll():
    x = jnp.arange(32 * 60 * 128, dtype=jnp.float32).reshape(32, 60, 128)

    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 59, 1)

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct(x.shape, x.dtype), x))(x)
    np.testing.assert_allclose(np.asarray(out), np.roll(np.asarray(x), -1, 1))


@probe("lane_roll_32: roll axis=2 by -32 of [32,60,128]")
def p_laneroll():
    x = jnp.arange(32 * 60 * 128, dtype=jnp.float32).reshape(32, 60, 128)

    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 96, 2)

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct(x.shape, x.dtype), x))(x)
    np.testing.assert_allclose(np.asarray(out), np.roll(np.asarray(x), -32, 2))


@probe("lane_roll_64_2d: roll axis=1 by 64 of [128,256]")
def p_laneroll2d():
    x = jnp.arange(128 * 256, dtype=jnp.float32).reshape(128, 256)

    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 64, 1)

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct(x.shape, x.dtype), x))(x)
    np.testing.assert_allclose(np.asarray(out), np.roll(np.asarray(x), 64, 1))


# -------------------------------------------------------------- iota masks
@probe("iota_mask_3d: lane/row select on [32,60,128]")
def p_iota():
    x = jnp.ones((32, 60, 128), jnp.float32)

    def k(x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (32, 60, 128), 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (32, 60, 128), 2)
        o_ref[:] = jnp.where((rows % 4 < 2) & (lanes >= 32), x_ref[:], 0.0)

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct(x.shape, x.dtype), x))(x)
    rows = np.arange(60)[None, :, None] % 4 < 2
    lanes = np.arange(128)[None, None, :] >= 32
    ref = np.broadcast_to(np.where(rows & lanes, 1.0, 0.0), (32, 60, 128))
    np.testing.assert_allclose(np.asarray(out), ref)


# ------------------------------------------------------------- dot_general
@probe("dot_3d_2d: [32,56,128]@[128,256] contract last")
def p_dot3d():
    a = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 128), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.float32)

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda a, b: _call(
        k, jax.ShapeDtypeStruct((32, 56, 256), jnp.float32), a, b))(a, b)
    ref = np.einsum("brk,kn->brn", np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


@probe("einsum_brl_rlf: [32,56,256]x[56,256,128]->[32,128]")
def p_einsum_fc1():
    a = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (56, 256, 128), jnp.float32)

    def k(a_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], w_ref[:], (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda a, w: _call(
        k, jax.ShapeDtypeStruct((32, 128), jnp.float32), a, w))(a, w)
    ref = np.einsum("brl,rlf->bf", np.asarray(a), np.asarray(w))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


@probe("batched_dot: [56,32,256]x[56,256,128] batch0")
def p_batched_dot():
    a = jax.random.normal(jax.random.PRNGKey(0), (56, 32, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (56, 256, 128), jnp.float32)

    def k(a_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda a, w: _call(
        k, jax.ShapeDtypeStruct((56, 32, 128), jnp.float32), a, w))(a, w)
    ref = np.einsum("sbl,slf->sbf", np.asarray(a), np.asarray(w))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


@probe("outer_wgrad: [32,56,256]x[32,128] contract batch -> [56,256,128]")
def p_outer():
    a = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 256), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (32, 128), jnp.float32)

    def k(a_ref, g_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], g_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda a, g: _call(
        k, jax.ShapeDtypeStruct((56, 256, 128), jnp.float32), a, g))(a, g)
    ref = np.einsum("brl,bf->rlf", np.asarray(a), np.asarray(g))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


@probe("wgrad_2d: [1792,128]x[1792,256] contract rows")
def p_wgrad2d():
    a = jax.random.normal(jax.random.PRNGKey(0), (1792, 128), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (1792, 256), jnp.float32)

    def k(a_ref, g_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], g_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda a, g: _call(
        k, jax.ShapeDtypeStruct((128, 256), jnp.float32), a, g))(a, g)
    ref = np.asarray(a).T @ np.asarray(g)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-1)


# ----------------------------------------------------- sub-tile lane slices
@probe("lane_slice_read: [128,256][0:32,0:64]")
def p_lane_slice():
    x = jnp.arange(128 * 256, dtype=jnp.float32).reshape(128, 256)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[0:32, 0:64]

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct((32, 64), x.dtype), x))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:32, :64])


@probe("lane_slice_write: zeros[128,256][0:32,0:64] = w")
def p_lane_slice_write():
    w = jnp.arange(32 * 64, dtype=jnp.float32).reshape(32, 64)

    def k(w_ref, o_ref):
        o_ref[:] = jnp.zeros((128, 256), jnp.float32)
        o_ref[0:32, 0:64] = w_ref[:]

    out = jax.jit(lambda w: _call(k, jax.ShapeDtypeStruct((128, 256), jnp.float32), w))(w)
    ref = np.zeros((128, 256), np.float32)
    ref[:32, :64] = np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("selector_matmul_fold: diag blocks via constant selectors")
def p_selector():
    d = jax.random.normal(jax.random.PRNGKey(0), (128, 256), jnp.float32)

    def k(d_ref, o_ref):
        acc = jnp.zeros((32, 64), jnp.float32)
        rolled = d_ref[:]
        for b in range(4):
            rb = pltpu.roll(pltpu.roll(d_ref[:], (128 - 32 * b) % 128, 0), (256 - 64 * b) % 256, 1)
            acc = acc + rb[0:32, 0:64]
        o_ref[:] = acc

    out = jax.jit(lambda d: _call(k, jax.ShapeDtypeStruct((32, 64), jnp.float32), d))(d)
    dn = np.asarray(d)
    ref = sum(dn[32 * b:32 * b + 32, 64 * b:64 * b + 64] for b in range(4))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


# ----------------------------------------------------------- transpose 3d
@probe("major_transpose: [32,56,256]->[56,32,256]")
def p_transpose():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 256), jnp.float32)

    def k(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0, 2))

    out = jax.jit(lambda x: _call(k, jax.ShapeDtypeStruct((56, 32, 256), x.dtype), x))(x)
    np.testing.assert_allclose(np.asarray(out), np.transpose(np.asarray(x), (1, 0, 2)))


# ------------------------------------------------------------------- PRNG
@probe("prng_replay: reseed reproduces bits")
def p_prng():
    def k(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        a = pltpu.prng_random_bits((32, 256)).astype(jnp.uint32)
        pltpu.prng_seed(seed_ref[0])
        b = pltpu.prng_random_bits((32, 256)).astype(jnp.uint32)
        o_ref[:] = (a == b).astype(jnp.float32)

    out = jax.jit(lambda s: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((32, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s))(jnp.array([1234], jnp.int32))
    assert float(jnp.min(out)) == 1.0, "reseed did not reproduce bits"


# ------------------------------------------- grid + scratch persistence
@probe("grid_scratch_persist: (C,S) grid, scratch carries across S")
def p_grid_scratch():
    C, S = 4, 5
    data = jnp.arange(C * S * 8 * 128, dtype=jnp.float32).reshape(C, S, 8, 128)

    def k(x_ref, o_ref, acc_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] = acc_ref[:] + x_ref[0, 0]

        @pl.when(s == S - 1)
        def _():
            o_ref[0] = acc_ref[:]

    out = jax.jit(lambda d: pl.pallas_call(
        k,
        grid=(C, S),
        in_specs=[pl.BlockSpec((1, 1, 8, 128), lambda c, s: (c, s, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c, s: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(d))(data)
    ref = np.asarray(data).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("softmax_masked: CE pieces on [32,128]")
def p_softmax():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128), jnp.float32)
    lab = jax.random.randint(jax.random.PRNGKey(1), (32, 1), 0, 10)

    def k(x_ref, lab_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
        logits = jnp.where(lanes < 10, x_ref[:], -1e30)
        m = jnp.max(logits, axis=1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
        onehot = (lanes == lab_ref[:]).astype(jnp.float32)
        nll = lse[:, 0] - jnp.sum(logits * onehot, axis=1)
        o_ref[:] = jnp.broadcast_to(nll[:, None], (32, 128))

    out = jax.jit(lambda x, l: _call(
        k, jax.ShapeDtypeStruct((32, 128), jnp.float32), x, l))(x, lab)
    xn = np.asarray(x)[:, :10]
    lse = np.log(np.exp(xn - xn.max(1, keepdims=True)).sum(1)) + xn.max(1)
    ref = lse - xn[np.arange(32), np.asarray(lab)[:, 0]]
    np.testing.assert_allclose(np.asarray(out)[:, 0], ref, rtol=3e-4, atol=3e-4)


@probe("bf16_mixed: bf16 operands f32 accum dot")
def p_bf16():
    a = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 128), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.bfloat16)

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda a, b: _call(
        k, jax.ShapeDtypeStruct((32, 56, 256), jnp.float32), a, b))(a, b)
    ref = np.einsum("brk,kn->brn", np.asarray(a, np.float32), np.asarray(b, np.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-1)


@probe("bf16_default_prec: bf16 operands f32 accum, DEFAULT precision")
def p_bf16_default():
    # bf16_mixed with precision=HIGHEST fails ("Bad lhs type"): HIGHEST on
    # bf16 operands requests a multi-pass f32 emulation Mosaic rejects.
    # DEFAULT precision is the native single-pass MXU bf16 path.
    a = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 128), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.bfloat16)

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = jax.jit(lambda a, b: _call(
        k, jax.ShapeDtypeStruct((32, 56, 256), jnp.float32), a, b))(a, b)
    ref = np.einsum("brk,kn->brn", np.asarray(a, np.float32), np.asarray(b, np.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-1)


@probe("outer_wgrad_chunked: wgrad via grid over r-chunks of 8")
def p_outer_chunked():
    # outer_wgrad in one shot stack-allocates 33 MB of scoped VMEM (>16 MB
    # limit). Chunking the kept r dimension over the grid bounds the
    # per-invocation footprint to [8,256,128] = 1 MB.
    a = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 256), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (32, 128), jnp.float32)

    def k(a_ref, g_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], g_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda a, g: pl.pallas_call(
        k,
        grid=(7,),
        in_specs=[pl.BlockSpec((32, 8, 256), lambda r: (0, r, 0)),
                  pl.BlockSpec((32, 128), lambda r: (0, 0))],
        out_specs=pl.BlockSpec((8, 256, 128), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((56, 256, 128), jnp.float32),
    )(a, g))(a, g)
    ref = np.einsum("brl,bf->rlf", np.asarray(a), np.asarray(g))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


# ------------------------------------------- wave 2: backward-pass forms
@probe("dgrad_rhs_T_2d: [32,128]x[128,128] contract rhs dim1")
def p_dgrad_2d():
    # fc2 dgrad: dact = dlogits @ W2^T, expressed as a transposed-rhs
    # contraction (no explicit transpose op).
    g = jax.random.normal(jax.random.PRNGKey(0), (32, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 128), jnp.float32)

    def k(g_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            g_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda g, w: _call(
        k, jax.ShapeDtypeStruct((32, 128), jnp.float32), g, w))(g, w)
    ref = np.asarray(g) @ np.asarray(w).T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


@probe("dgrad_rhs_T_big: [1792,256]x[1152,256] contract rhs dim1")
def p_dgrad_big():
    # conv2 dgrad vs the tap-stacked embedded weight.
    g = jax.random.normal(jax.random.PRNGKey(0), (1792, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (1152, 256), jnp.float32)

    def k(g_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            g_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = jax.jit(lambda g, w: _call(
        k, jax.ShapeDtypeStruct((1792, 1152), jnp.float32), g, w))(g, w)
    ref = np.asarray(g) @ np.asarray(w).T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-1)


@probe("dgrad_rhs_T_batched: [28,32,128]x[28,64,128] batch0 contract last")
def p_dgrad_batched():
    # fc1 dgrad: per row-position r, dact_r = g @ (W_r)^T.
    g = jax.random.normal(jax.random.PRNGKey(0), (28, 32, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (28, 64, 128), jnp.float32)

    def k(g_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            g_ref[:], w_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = jax.jit(lambda g, w: _call(
        k, jax.ShapeDtypeStruct((28, 32, 64), jnp.float32), g, w))(g, w)
    ref = np.einsum("rbf,rlf->rbl", np.asarray(g), np.asarray(w))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


@probe("broadcast_major: [32,128] -> [28,32,128]")
def p_broadcast():
    x = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)

    def k(x_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(x_ref[:][None], (28, 32, 128))

    out = jax.jit(lambda x: _call(
        k, jax.ShapeDtypeStruct((28, 32, 128), jnp.float32), x))(x)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(x)[None], (28, 32, 128)))


@probe("sublane_pool_reshape: [32,56,256]->[32,14,4,256] max i-pairs")
def p_sublane_pool():
    # Max-pool over the i dimension via a sublane-dim reshape + reduce
    # (rows=(i, jq): pair i's, lanes untouched) — compacts rows 56 -> 28.
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 56, 256), jnp.float32)

    def k(x_ref, o_ref):
        v = x_ref[:].reshape(32, 7, 2, 4, 256)
        o_ref[:] = jnp.max(v, axis=2).reshape(32, 28, 256)

    out = jax.jit(lambda x: _call(
        k, jax.ShapeDtypeStruct((32, 28, 256), jnp.float32), x))(x)
    ref = np.asarray(x).reshape(32, 7, 2, 4, 256).max(axis=2).reshape(32, 28, 256)
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("lane_slice_64: [32,28,256][:, :, 0:64] and [128:192]")
def p_lane_slice64():
    # fc1 splits the pooled activation's valid jr groups (0 and 2) out of
    # the (jr=4, ch=64) lane packing via static lane slices.
    x = jnp.arange(32 * 28 * 256, dtype=jnp.float32).reshape(32, 28, 256)

    def k(x_ref, o_ref):
        a = x_ref[:, :, 0:64]
        b = x_ref[:, :, 128:192]
        o_ref[:] = jnp.concatenate([a, b], axis=2)

    out = jax.jit(lambda x: _call(
        k, jax.ShapeDtypeStruct((32, 28, 128), jnp.float32), x))(x)
    xn = np.asarray(x)
    ref = np.concatenate([xn[:, :, 0:64], xn[:, :, 128:192]], axis=2)
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("scalar_accum_smem: per-step loss accumulated in SMEM scratch")
def p_scalar_smem():
    S = 5
    data = jnp.arange(S * 8 * 128, dtype=jnp.float32).reshape(S, 8, 128)

    def k(x_ref, o_ref, acc_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            acc_ref[0] = 0.0

        acc_ref[0] = acc_ref[0] + jnp.sum(x_ref[0])

        @pl.when(s == S - 1)
        def _():
            o_ref[0] = acc_ref[0]

    out = jax.jit(lambda d: pl.pallas_call(
        k,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda s: (s, 0, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(d))(data)
    np.testing.assert_allclose(float(out[0]), float(np.asarray(data).sum()), rtol=1e-6)


def main():
    fns = [v for v in globals().values() if getattr(v, "_probe", False)]
    for fn in fns:
        fn()
    n_fail = sum(1 for _, s, _ in RESULTS if s == "FAIL")
    print(f"\n{len(RESULTS) - n_fail}/{len(RESULTS)} probes passed")
    for name, s, msg in RESULTS:
        if s == "FAIL":
            print(f"--- {name}\n{msg}\n")


if __name__ == "__main__":
    main()
