"""The fused local-training Pallas megakernel (SimpleCNN, TPU/Mosaic).

One client's ENTIRE local training — every SGD step of every epoch —
runs inside a single ``pallas_call`` over grid ``(C, S)``. The working
weights live in the per-client OUTPUT block (VMEM-resident while the
client axis index is fixed, flushed to HBM once per client); momentum
lives in VMEM scratch in compact logical form. Per-client parameters
therefore cross HBM once per ROUND instead of twice per STEP — the
cost the round-3 block-grouping bench isolated as the true price of
per-client-weight training (docs/performance.md).

Layout, forward algebra, and SGD semantics are defined by
ops/fused_train.py: the forward is literally ``forward_impl`` with the
Pallas spellings of its three pluggable op families (pltpu.roll, a
custom-vjp 3D-by-2D dot, a custom-vjp batched dot — the custom VJPs
steer AD to contraction forms that benchmarks/mosaic_probe.py proved
Mosaic can lower, instead of the double-contraction forms it cannot).
Gradients come from ``jax.grad`` traced INSIDE the kernel body
(feasibility probed by benchmarks/ad_in_kernel_probe.py) with
``jax.checkpoint`` so the backward recomputes the forward instead of
keeping per-tap activation residuals in VMEM.

Gradient consolidation (the P^T fold of fused_train.py) is done with
constant selector matmuls + diagonal roll/mask sweeps:

  - stem: extract the jr-diagonal lane groups (4 rolls + row masks),
    then fold (t, pr, pc, ci) -> (a, b, ci) with E_g^T matmuls
    ([4,512,128] 0/1 selector built by ``build_stem_selectors``);
    embedding back is E_g matmuls + the reverse lane distribution;
  - conv2: jr-diagonal extract + row-group butterfly sum (pure rolls
    and iota masks — no selectors needed);
  - biases: lane-group butterfly sums;
  - fc1/fc2: structural-zero masks only (no embedded copies).

The optimizer chain is exactly rounds/engine.py::make_optimizer
(global-norm clip on the LOGICAL gradient -> momentum -> lr), applied
in logical space and re-embedded, so embedded weight copies stay tied
(tests/test_fused_train.py::test_packed_sgd_matches_flax_sgd proves
this arithmetic equals a flax-space optax step).

Known, documented divergences from the engine's local training (both
also stated on fused_train.py): batch order is resident order (the
engine shuffles per epoch) and dropout uses the TPU PRNG (the engine
uses threefry). With shuffle disabled and dropout off the kernel is
numerically equivalent to the engine path; with them on it is a
statistically equivalent trainer.

Reference parity note: the reference has no kernel code (pure torch,
reference: experiments/run_experiments.py:193-240 trains clients
sequentially); this file exists to beat its round rate, not to mirror
its source.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_fl_security_tpu.ops.fused_train import (
    B,
    NCLS,
    forward_impl,
    pack_params,
    packed_ce,
    unpack_params,
)

__all__ = [
    "build_stem_selectors",
    "fused_local_train",
]


# ===================================================================
# Roll plumbing: pltpu.roll has no VJP; both spellings get one.
# ===================================================================

def _normalize(x, shift, axis):
    axis = axis % x.ndim
    return shift % x.shape[axis], axis


def _pallas_roll(x, shift, axis):
    shift, axis = _normalize(x, shift, axis)
    # Mosaic's tpu.dynamic_rotate only lowers for 32-bit element types
    # ("Rotate with non-32-bit data", measured on-chip 2026-08-20 on the
    # bf16 compute path). A roll is a pure permutation, so upcast ->
    # roll -> downcast is bit-exact for bf16 (a subset of f32).
    if x.dtype.itemsize != 4:
        return pltpu.roll(x.astype(jnp.float32), shift, axis).astype(x.dtype)
    return pltpu.roll(x, shift, axis)


def _jnp_roll(x, shift, axis):
    shift, axis = _normalize(x, shift, axis)
    return jnp.roll(x, shift, axis)


def _make_droll(impl):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
    def droll(x, shift, axis):
        return impl(x, shift, axis)

    def fwd(x, shift, axis):
        return droll(x, shift, axis), None

    def bwd(shift, axis, _, g):
        return (droll(g, -shift, axis),)

    droll.defvjp(fwd, bwd)
    return droll


# ===================================================================
# Custom-VJP contractions (AD would otherwise emit the probed-FAIL
# double-contraction / one-shot-outer forms; see mosaic_probes.json)
# ===================================================================

def _dot_f32acc(a, b, dims):
    """dot_general with an explicit f32 accumulator, output cast back to
    the operand dtype. Mosaic's 'tpu.matmul' REQUIRES a 32-bit acc —
    bf16 in/bf16 acc trips 'Expected matmul acc to be 32-bit' (measured
    on-chip 2026-08-19). f32-acc-then-round is also exactly what XLA
    does for bf16 dots, so the jnp mirror semantics are unchanged."""
    out = jax.lax.dot_general(a, b, dims,
                              preferred_element_type=jnp.float32)
    return out.astype(a.dtype)


@jax.custom_vjp
def kdot3d(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[B, R, K] x [K, F] -> [B, R, F] (probe: dot_3d_2d)."""
    return _dot_f32acc(a, w, (((2,), (0,)), ((), ())))


def _kdot3d_fwd(a, w):
    return kdot3d(a, w), (a, w)


def _kdot3d_bwd(res, dz):
    a, w = res
    # da: contract the F dims — no transposes materialized.
    da = _dot_f32acc(dz, w, (((2,), (1,)), ((), ())))
    # dw: merge (B, R) into rows, contract rows (probe: wgrad_2d).
    bb, rr, kk = a.shape
    ff = w.shape[1]
    dw = _dot_f32acc(
        a.reshape(bb * rr, kk), dz.reshape(bb * rr, ff),
        (((0,), (0,)), ((), ())))
    return da, dw


kdot3d.defvjp(_kdot3d_fwd, _kdot3d_bwd)


@jax.custom_vjp
def kbdot(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[R, B, K] x [R, K, F] -> [R, B, F] batched over the major axis
    (probe: batched_dot)."""
    return _dot_f32acc(a, w, (((2,), (1,)), ((0,), (0,))))


def _kbdot_fwd(a, w):
    return kbdot(a, w), (a, w)


def _kbdot_bwd(res, dz):
    a, w = res
    da = _dot_f32acc(dz, w, (((2,), (2,)), ((0,), (0,))))
    # dw: the one-shot [R,B,K]x[R,B,F]->[R,K,F] outer form FAILED its
    # probe (scoped-VMEM stack alloc); R unrolled 2D wgrads are the
    # probed-safe spelling (probe: outer_wgrad_chunked).
    dw = jnp.stack([
        _dot_f32acc(a[r], dz[r], (((0,), (0,)), ((), ())))
        for r in range(a.shape[0])
    ])
    return da, dw


kbdot.defvjp(_kbdot_fwd, _kbdot_bwd)


# ===================================================================
# Stem selector constants and consolidation ops
# ===================================================================

def build_stem_selectors(cin: int = 8) -> np.ndarray:
    """0/1 fold/embed selector E [4, 512, 128]:
    E[g][t*128 + jr*32 + (pr*2+pc)*8 + ci, (a*3+b)*8 + ci] = 1
    where g=(di,dj), t=(tr,tc), p=tr*2+pr, q=tc*2+pc, a=p-di, b=q-dj
    valid in [0,3). Rows are replicated over jr; lanes (co) are NOT
    encoded — the lane side of the packing is handled by the
    jr-diagonal roll sweeps."""
    e = np.zeros((4, 512, 128), np.float32)
    for g, (di, dj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        for tr in range(2):
            for tc in range(2):
                t = tr * 2 + tc
                for pr in range(2):
                    for pc in range(2):
                        a = tr * 2 + pr - di
                        b = tc * 2 + pc - dj
                        if not (0 <= a < 3 and 0 <= b < 3):
                            continue
                        for jr in range(4):
                            for ci in range(cin):
                                row = t * 128 + jr * 32 + (pr * 2 + pc) * cin + ci
                                e[g, row, (a * 3 + b) * cin + ci] = 1.0
    return e


def _row_jr_iota(shape, rows_axis, block=32, mod=128):
    """jr index of each row: (row % mod) // block, broadcast to shape."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, rows_axis)
    return (rows % mod) // block


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def stem_diag_extract(g: jnp.ndarray, roll) -> jnp.ndarray:
    """[4,512,128] raw stem cotangent -> jr-diagonal values moved to
    lanes 0:32 (one value per (g, t, jr, u) row), off-diagonal dropped."""
    jr = _row_jr_iota(g.shape, 1)
    z = jnp.zeros_like(g)
    for k in range(4):
        z = z + jnp.where(jr == k, roll(g, -32 * k, -1), 0.0)
    return jnp.where(_lane_iota(g.shape) < 32, z, 0.0)


def fold_stem(g: jnp.ndarray, e: jnp.ndarray, roll) -> jnp.ndarray:
    """P^T for the stem: [4,512,128] raw cotangent -> logical tile
    [128,128] (rows (a*3+b)*8+ci < 72, lanes co < 32; rest zero)."""
    z = stem_diag_extract(g, roll)
    kl = jnp.zeros((128, 128), jnp.float32)
    for gi in range(4):
        kl = kl + jax.lax.dot_general(
            e[gi], z[gi].astype(jnp.float32), (((0,), (0,)), ((), ())))
    return kl


def embed_stem(kl: jnp.ndarray, e: jnp.ndarray, roll) -> jnp.ndarray:
    """P for the stem: logical tile [128,128] -> packed [4,512,128]."""
    outs = []
    jr = _row_jr_iota((512, 128), 0)
    for gi in range(4):
        y = jax.lax.dot_general(e[gi], kl, (((1,), (0,)), ((), ())))
        w = jnp.zeros_like(y)
        for k in range(4):
            w = w + jnp.where(jr == k, roll(y, 32 * k, -1), 0.0)
        outs.append(w)
    return jnp.stack(outs)


def consolidate_cv2(g: jnp.ndarray, roll) -> jnp.ndarray:
    """[9,128,256] raw conv2 cotangent -> jr-summed logical form:
    every 32-row group holds k2grad[t][ci, co] in lanes 0:64."""
    jr = _row_jr_iota(g.shape, 1)
    z = jnp.zeros_like(g)
    for k in range(4):
        z = z + jnp.where(jr == k, roll(g, -64 * k, -1), 0.0)
    z = jnp.where(_lane_iota(g.shape) < 64, z, 0.0)
    y = z + roll(z, 64, -2)   # row-group butterfly: sum the jr copies
    return y + roll(y, 32, -2)


def embed_cv2(y: jnp.ndarray, roll) -> jnp.ndarray:
    """Replicated logical form [9,128,256] -> packed block-diagonal."""
    jr = _row_jr_iota(y.shape, 1)
    y0 = jnp.where(_lane_iota(y.shape) < 64, y, 0.0)
    w = jnp.zeros_like(y0)
    for k in range(4):
        w = w + jnp.where(jr == k, roll(y0, 64 * k, -1), 0.0)
    return w


def lane_group_sum(g: jnp.ndarray, width: int, roll) -> jnp.ndarray:
    """Butterfly-sum lane groups of ``width`` over the last axis: every
    group ends up holding the total (= P(logical) for tiled biases)."""
    n = g.shape[-1]
    y = g + roll(g, n // 2, -1)
    return y + roll(y, width, -1)


def _fc1_keep_mask() -> np.ndarray:
    """1.0 except the structural (jq=3, s=1) hole of w_fc1."""
    m = np.ones((28, 128, 128), np.float32)
    m[3::4, 64:, :] = 0.0
    return m


# ===================================================================
# The kernel
# ===================================================================

_W_KEYS = ("w_stem", "b_stem", "w_cv2", "b_cv2",
           "w_fc1", "b_fc1", "w_fc2", "b_fc2")


def fused_local_train(
    params: Dict[str, Any],
    blocks: jnp.ndarray,
    labels: jnp.ndarray,
    bmask: jnp.ndarray,
    *,
    learning_rate: float,
    momentum: float = 0.9,
    clip_norm: float = 1.0,
    local_epochs: int = 1,
    use_dropout: bool = False,
    dropout_rates=(0.25, 0.5),
    seed: int = 0,
    compute_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    remat: bool | None = None,
) -> Dict[str, Any]:
    """Run EVERY client's full local training in one pallas_call.

    ``params``: the round-start global flax pytree (shared across
    clients — read once from HBM, not per client). ``blocks``
    [C, N, 60, 128] packed s2d activations (fused_train.pack_blocks),
    ``labels`` [C, N] int, ``bmask`` [C, N] (0 = padded row). N must be
    a batch-size multiple. Returns the stacked per-client flax pytree
    [C, ...] after ``local_epochs`` passes in resident batch order.

    ``interpret=True`` runs the same kernel through the Pallas
    interpreter with jnp rolls (CPU-testable; no dropout).

    ``remat`` selects the AD spelling inside the kernel body: True wraps
    the loss in ``jax.checkpoint`` (cheap-memory; no Mosaic lowering —
    "Unimplemented primitive ... remat2", measured on-chip 2026-08-19),
    False keeps the residuals (the SHIPPED compiled spelling). Default
    None = remat iff interpret, preserving both historical behaviors;
    tests/test_fused_kernel.py exercises BOTH spellings in interpret
    mode so a graph-level regression in the shipped one is caught on
    CPU, and ``benchmarks/fused_kernel_bench.py --check`` remains the
    required on-chip gate for any kernel change (Mosaic lowering is not
    exercised by the interpreter)."""
    num_clients, n = blocks.shape[0], blocks.shape[1]
    assert n % B == 0, "pad N to a batch-size multiple"
    steps = n // B
    total = local_epochs * steps
    if use_dropout and interpret:
        raise ValueError("dropout uses the TPU PRNG; not interpretable")

    cd = compute_dtype
    lr = float(learning_rate)
    mu = float(momentum)
    clip = float(clip_norm)
    keep1 = 1.0 - float(dropout_rates[0])
    keep2 = 1.0 - float(dropout_rates[1])

    roll = _jnp_roll if interpret else _pallas_roll
    droll = _make_droll(roll)

    pk = pack_params(params)
    e_sel = jnp.asarray(build_stem_selectors(
        params["ConvPoolFused_0"]["kernel"].shape[2]))
    onehot = (jax.nn.one_hot(labels, 128, dtype=jnp.float32)
              * bmask[..., None].astype(jnp.float32))
    fc1_keep = jnp.asarray(_fc1_keep_mask())

    w_shapes = {k: pk[k].shape for k in _W_KEYS}

    def kern(x_ref, oh_ref, e_ref, k1_ref,
             ws_ref, bs_ref, wc_ref, bc_ref, w1_ref, b1_ref, w2_ref, b2_ref,
             os_ref, obs_ref, oc_ref, obc_ref, o1_ref, ob1_ref, o2_ref,
             ob2_ref,
             m_kl, m_bs, m_cv, m_bc, m_f1, m_b1, m_f2, m_b2):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _init():
            os_ref[0] = ws_ref[:]
            obs_ref[0] = bs_ref[:]
            oc_ref[0] = wc_ref[:]
            obc_ref[0] = bc_ref[:]
            o1_ref[0] = w1_ref[:]
            ob1_ref[0] = b1_ref[:]
            o2_ref[0] = w2_ref[:]
            ob2_ref[0] = b2_ref[:]
            m_kl[:] = jnp.zeros_like(m_kl)
            m_bs[:] = jnp.zeros_like(m_bs)
            m_cv[:] = jnp.zeros_like(m_cv)
            m_bc[:] = jnp.zeros_like(m_bc)
            m_f1[:] = jnp.zeros_like(m_f1)
            m_b1[:] = jnp.zeros_like(m_b1)
            m_f2[:] = jnp.zeros_like(m_f2)
            m_b2[:] = jnp.zeros_like(m_b2)

        x = x_ref[0]
        oh = oh_ref[0]
        e = e_ref[:]
        keep = k1_ref[:]

        masks = None
        if use_dropout:
            c = pl.program_id(0)
            pltpu.prng_seed(seed, c, s)
            bits1 = pltpu.prng_random_bits((B, 28, 128)).astype(jnp.uint32)
            m1m = ((bits1 < jnp.uint32(keep1 * 2**32)).astype(cd)
                   / jnp.asarray(keep1, cd))
            bits2 = pltpu.prng_random_bits((B, 128)).astype(jnp.uint32)
            m2m = ((bits2 < jnp.uint32(keep2 * 2**32)).astype(cd)
                   / jnp.asarray(keep2, cd))
            masks = (m1m, m2m)

        w = {"w_stem": os_ref[0], "b_stem": obs_ref[0],
             "w_cv2": oc_ref[0], "b_cv2": obc_ref[0],
             "w_fc1": o1_ref[0], "b_fc1": ob1_ref[0],
             "w_fc2": o2_ref[0], "b_fc2": ob2_ref[0]}

        def loss(wd):
            logits = forward_impl(wd, x, dropout_masks=masks,
                                  compute_dtype=cd, roll=droll,
                                  dot3d=kdot3d, bdot=kbdot)
            bm = jnp.sum(oh, axis=1, keepdims=True)   # [B,1]; 1-D hits
            return packed_ce(logits, oh, bm)          # a Mosaic relayout

        # NOTE: jax.checkpoint (remat2) has no Mosaic lowering — measured
        # on-chip 2026-08-19 ("Unimplemented primitive ... remat2"). AD
        # residuals stay in VMEM on the compiled path; interpret mode
        # defaults to remat so the CPU test also exercises the
        # cheaper-memory spelling (override via ``remat=``).
        use_remat = interpret if remat is None else bool(remat)
        g = jax.grad(jax.checkpoint(loss) if use_remat else loss)(w)

        # ---- fold to logical / consolidated forms
        kl = fold_stem(g["w_stem"], e, roll)
        gbs = lane_group_sum(g["b_stem"], 32, roll)
        ycv = consolidate_cv2(g["w_cv2"], roll)
        gbc = lane_group_sum(g["b_cv2"], 64, roll)
        g1 = g["w_fc1"] * keep
        gb1 = g["b_fc1"]
        lanes2 = _lane_iota(g["w_fc2"].shape)
        g2 = jnp.where(lanes2 < NCLS, g["w_fc2"], 0.0)
        gb2 = jnp.where(_lane_iota(g["b_fc2"].shape) < NCLS,
                        g["b_fc2"], 0.0)

        # ---- global-norm clip counting each LOGICAL weight once
        lanec = _lane_iota(ycv.shape)
        rowc = jax.lax.broadcasted_iota(jnp.int32, ycv.shape, 1)
        ycv_one = jnp.where((rowc < 32) & (lanec < 64), ycv, 0.0)
        gbs_one = jnp.where(_lane_iota(gbs.shape) < 32, gbs, 0.0)
        gbc_one = jnp.where(_lane_iota(gbc.shape) < 64, gbc, 0.0)
        n2 = (jnp.sum(kl * kl) + jnp.sum(gbs_one * gbs_one)
              + jnp.sum(ycv_one * ycv_one) + jnp.sum(gbc_one * gbc_one)
              + jnp.sum(g1 * g1) + jnp.sum(gb1 * gb1)
              + jnp.sum(g2 * g2) + jnp.sum(gb2 * gb2))
        if clip > 0:
            scale = clip / jnp.maximum(jnp.sqrt(n2), clip)
        else:
            scale = jnp.float32(1.0)

        # ---- momentum (logical/consolidated space) + weight update
        m_kl[:] = kl * scale + mu * m_kl[:]
        m_bs[:] = gbs * scale + mu * m_bs[:]
        m_cv[:] = ycv * scale + mu * m_cv[:]
        m_bc[:] = gbc * scale + mu * m_bc[:]
        m_f1[:] = g1 * scale + mu * m_f1[:]
        m_b1[:] = gb1 * scale + mu * m_b1[:]
        m_f2[:] = g2 * scale + mu * m_f2[:]
        m_b2[:] = gb2 * scale + mu * m_b2[:]

        os_ref[0] = os_ref[0] - lr * embed_stem(m_kl[:], e, roll)
        obs_ref[0] = obs_ref[0] - lr * m_bs[:]
        oc_ref[0] = oc_ref[0] - lr * embed_cv2(m_cv[:], roll)
        obc_ref[0] = obc_ref[0] - lr * m_bc[:]
        o1_ref[0] = o1_ref[0] - lr * m_f1[:]
        ob1_ref[0] = ob1_ref[0] - lr * m_b1[:]
        o2_ref[0] = o2_ref[0] - lr * m_f2[:]
        ob2_ref[0] = ob2_ref[0] - lr * m_b2[:]

    def _const_spec(shape):
        return pl.BlockSpec(shape, lambda c, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, B, 60, 128), lambda c, s: (c, s % steps, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, 128), lambda c, s: (c, s % steps, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((4, 512, 128)),
        _const_spec((28, 128, 128)),
    ] + [_const_spec(w_shapes[k]) for k in _W_KEYS]

    out_specs = [
        pl.BlockSpec((1,) + w_shapes[k],
                     lambda c, s, _r=len(w_shapes[k]): (c,) + (0,) * _r,
                     memory_space=pltpu.VMEM)
        for k in _W_KEYS
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_clients,) + w_shapes[k], jnp.float32)
        for k in _W_KEYS
    ]

    scratch_shapes = [
        pltpu.VMEM((128, 128), jnp.float32),      # m_kl (stem logical)
        pltpu.VMEM((1, 128), jnp.float32),        # m_bs (consolidated)
        pltpu.VMEM((9, 128, 256), jnp.float32),   # m_cv (replicated)
        pltpu.VMEM((1, 256), jnp.float32),        # m_bc
        pltpu.VMEM((28, 128, 128), jnp.float32),  # m_f1
        pltpu.VMEM((1, 128), jnp.float32),        # m_b1
        pltpu.VMEM((128, 128), jnp.float32),      # m_f2
        pltpu.VMEM((1, 128), jnp.float32),        # m_b2
    ]

    outs = pl.pallas_call(
        kern,
        grid=(num_clients, total),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # Without remat (no Mosaic lowering) the AD residuals put the
            # f32 working set at ~58 MB — over the 16 MB default scoped-
            # vmem limit but comfortably inside v5e's 128 MB VMEM.
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(blocks, onehot, e_sel, fc1_keep, *[pk[k] for k in _W_KEYS])

    packed = dict(zip(_W_KEYS, outs))
    return jax.vmap(lambda p: unpack_params(p, params))(packed)
