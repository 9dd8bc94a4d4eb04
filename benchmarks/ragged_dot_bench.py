"""Per-client-weight dense formulations: batched GEMM (what ``vmap``
emits) vs ``jax.lax.ragged_dot`` (MoE-style grouped matmul).

Hypothesis (docs/performance.md "Step-tail attribution"): the round's
residual ~13 ms/step is per-client GEMMs whose per-group operands are
1-2 MXU tiles — [C=100, B=32, 3136] x [C, 3136, 128] runs each client's
M=32 slab against its own weight tile, wasting 3/4 of every 128-row MXU
pass. ``ragged_dot`` expresses the same block-diagonal contraction as
one [C*B, K] x grouped [C, K, F] product, giving the compiler license to
tile the flattened M axis across group boundaries the way MoE expert
GEMMs do. If its TPU lowering does that, the fc stages get denser MXU
occupancy with identical math; if it lowers to a serial per-group loop,
this is another committed falsification.

Run on TPU:  python benchmarks/ragged_dot_bench.py
Prints a JSON dict of ms for each formulation, fwd and fwd+bwd.
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

C, B = 100, 32  # clients, per-client batch (bench workload)
DTYPE = jnp.bfloat16


def timeit(fn, *args, n=50):
    fn(*args)  # compile
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / n * 1e3


def batched(x, w):
    """x [C,B,K], w [C,K,F] — the batched dot vmap produces."""
    return jax.lax.dot_general(
        x, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def ragged(xf, w, gs):
    """xf [C*B,K], w [C,K,F], gs [C] int32 — same math, grouped."""
    return jax.lax.ragged_dot(
        xf, w, gs, preferred_element_type=jnp.float32
    )


def bench_stage(name, k, f, results):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (C, B, k), DTYPE)
    w = jax.random.normal(jax.random.PRNGKey(1), (C, k, f), DTYPE)
    xf = x.reshape(C * B, k)
    gs = jnp.full((C,), B, jnp.int32)

    fwd_b = jax.jit(batched)
    fwd_r = jax.jit(ragged)
    results[f"{name}_fwd_batched_ms"] = timeit(fwd_b, x, w)
    try:
        results[f"{name}_fwd_ragged_ms"] = timeit(fwd_r, xf, w, gs)
    except Exception as e:  # lowering unsupported on this backend
        results[f"{name}_fwd_ragged_ms"] = f"unsupported: {type(e).__name__}"
        return

    def loss_b(x_, w_):
        return jnp.sum(batched(x_, w_) ** 2)

    def loss_r(x_, w_):
        return jnp.sum(ragged(x_, w_, gs) ** 2)

    g_b = jax.jit(jax.grad(loss_b, argnums=(0, 1)))
    results[f"{name}_bwd_batched_ms"] = timeit(g_b, x, w)
    try:
        g_r = jax.jit(jax.grad(loss_r, argnums=(0, 1)))
        results[f"{name}_bwd_ragged_ms"] = timeit(g_r, xf, w)
    except Exception as e:
        results[f"{name}_bwd_ragged_ms"] = f"undifferentiable: {type(e).__name__}"


def main():
    results = {"C": C, "B": B, "dtype": "bf16",
               "device": str(jax.devices()[0])}
    # The two per-client dense stages of the bench model
    # (SimpleCNN fc1 3136->128, fc2 128->10 padded to 128 lanes),
    # plus a fatter MoE-like shape as a control for the lowering itself.
    bench_stage("fc1_3136x128", 3136, 128, results)
    bench_stage("fc2_128x128", 128, 128, results)
    bench_stage("ctrl_1024x1024", 1024, 1024, results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
