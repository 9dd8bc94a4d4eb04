"""Per-client-weight conv formulations: grouped conv (vmap of conv) vs
im2col + batched matmul.

Hypothesis (docs/performance.md "Where the time goes"): the round
program's conv cost has a large batch-independent component because
``vmap`` over per-client kernels lowers ``conv_general_dilated`` to a
feature-grouped convolution (C groups), which XLA tiles poorly at these
small spatial sizes. Reformulating the SAME math as im2col patches
followed by a batch-dimension ``dot_general`` ([C, B*P, K] x [C, K, F])
lets the MXU run one large batched GEMM instead.

Run on TPU:  python benchmarks/conv_formulation_bench.py
Prints a JSON dict of ms/step for each formulation, fwd and fwd+bwd.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

C, B = 100, 32  # clients, per-client batch
DTYPE = jnp.bfloat16


def timeit(fn, *args, n=20):
    fn(*args)  # compile
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / n * 1e3


def conv_vmap(x, w):
    """x [C,B,H,W,I], w [C,kh,kw,I,F] -> vmap of conv (stride 2, SAME-ish)."""

    def one(xc, wc):
        return jax.lax.conv_general_dilated(
            xc, wc, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return jax.vmap(one)(x, w)


def conv_im2col(x, w):
    """Same contraction as one batched GEMM via conv_general_dilated_patches."""
    c, b, h, ww, i = x.shape
    kh, kw = w.shape[1], w.shape[2]
    f = w.shape[-1]

    def patches(xc):
        # [B, P_h, P_w, kh*kw*I] with the same stride/padding
        p = jax.lax.conv_general_dilated_patches(
            xc, (kh, kw), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return p

    p = jax.vmap(patches)(x)                       # [C,B,Ph,Pw,kh*kw*I]
    ph, pw = p.shape[2], p.shape[3]
    p2 = p.reshape(c, b * ph * pw, kh * kw * i)
    # conv_general_dilated_patches emits features as I*kh*kw (input-major);
    # build the matching weight layout.
    w2 = jnp.transpose(w, (0, 3, 1, 2, 4)).reshape(c, i * kh * kw, f)
    y = jax.lax.dot_general(
        p2, w2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(c, b, ph, pw, f).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    results = {}

    # Stage 1 (fused stem shape): 28x28x8 in, 4x4 stride-2 kernel, 128 out
    x1 = jnp.asarray(rng.randn(C, B, 28, 28, 8), DTYPE)
    w1 = jnp.asarray(rng.randn(C, 4, 4, 8, 128) * 0.1, DTYPE)
    # Stage 2: 14x14x32 in, 3x3 (stride 1 in the model; bench stride 2 and
    # stride 1 separately), 64 out
    x2 = jnp.asarray(rng.randn(C, B, 14, 14, 32), DTYPE)
    w2 = jnp.asarray(rng.randn(C, 3, 3, 32, 64) * 0.1, DTYPE)

    for tag, (x, w) in {"stem_28x28x8_to128_s2": (x1, w1),
                        "conv2_14x14x32_to64_s2": (x2, w2)}.items():
        a = jax.jit(conv_vmap)
        b_ = jax.jit(conv_im2col)
        ya, yb = a(x, w), b_(x, w)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                    - yb.astype(jnp.float32))))
        results[f"{tag}/fwd_grouped_ms"] = round(timeit(a, x, w), 3)
        results[f"{tag}/fwd_im2col_ms"] = round(timeit(b_, x, w), 3)
        results[f"{tag}/max_abs_err"] = err

        def loss_a(w_, x_):
            return jnp.sum(conv_vmap(x_, w_).astype(jnp.float32))

        def loss_b(w_, x_):
            return jnp.sum(conv_im2col(x_, w_).astype(jnp.float32))

        ga = jax.jit(jax.grad(loss_a))
        gb = jax.jit(jax.grad(loss_b))
        results[f"{tag}/bwd_grouped_ms"] = round(timeit(ga, w, x), 3)
        results[f"{tag}/bwd_im2col_ms"] = round(timeit(gb, w, x), 3)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
