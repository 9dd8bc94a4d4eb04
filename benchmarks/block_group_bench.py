"""Block-grouped per-client dense: trade G x FLOPs for full MXU tiles.

Hypothesis (docs/performance.md "Step-tail attribution"): the per-client
dense stages run 15-25x off MXU peak because each client's GEMM has
M = B = 32 rows — 3/4 of every 128-row MXU pass is padding, plus
per-group bookkeeping. Packing G clients into ONE dense product

    x_g [C/G, G*B, K]  @  w_g [C/G, K, G*F]  ->  y_full [C/G, G*B, G*F]

computes every client's rows against every client's columns (G x the
FLOPs) but with M = G*B = 128 full tiles; each client's true output is
the diagonal block. If the current inefficiency exceeds the G x FLOP
inflation, grouping wins. The shared-weight dense ([C*B, K] @ [K, F])
is timed as the unreachable speed-of-light control (1x FLOPs, full
tiles, but wrong semantics — clients share weights).

Timing methodology: each variant runs n=50 serialized iterations INSIDE
one jitted lax.scan (the output feeds the next input), so the ~0.7 ms
per-dispatch floor that polluted isolated micro-timings
(benchmarks/ragged_dot_bench.py) amortizes away.

Run on TPU:  python benchmarks/block_group_bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp

C, B, K, F = 100, 32, 3136, 128  # bench-model fc1 under the client vmap
N_ITER = 50
DTYPE = jnp.bfloat16


def timed(jitted, *args):
    out = jitted(*args)  # compile
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))  # value fetch (axon tunnel sync)
    t0 = time.perf_counter()
    out = jitted(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / N_ITER * 1e3


def fwd_batched(x, w):
    def body(carry, _):
        y = jax.lax.dot_general(
            carry, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # Serialize iterations: next x depends on this y (scalar coupling
        # keeps the added work negligible and identical across variants).
        nxt = carry + jnp.mean(y).astype(carry.dtype)
        return nxt, jnp.mean(y)

    _, ys = jax.lax.scan(body, x, None, length=N_ITER)
    return ys


def make_fwd_grouped(g):
    cg = C // g

    def fwd(xg, wg):
        def body(carry, _):
            y_full = jax.lax.dot_general(
                carry, wg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [C/G, G*B, G*F]
            yr = y_full.reshape(cg, g, B, g, F)
            y = jnp.moveaxis(jnp.diagonal(yr, axis1=1, axis2=3), -1, 1)
            nxt = carry + jnp.mean(y).astype(carry.dtype)
            return nxt, jnp.mean(y)

        _, ys = jax.lax.scan(body, xg, None, length=N_ITER)
        return ys

    return fwd


def fwd_shared(xf, wf):
    def body(carry, _):
        y = carry @ wf
        nxt = carry + jnp.mean(y).astype(carry.dtype)
        return nxt, jnp.mean(y)

    _, ys = jax.lax.scan(body, xf, None, length=N_ITER)
    return ys


def make_bwd(fwd_one):
    """Scan n serialized grad evaluations of sum(y^2)."""

    def bwd(x, w):
        def loss(x_, w_):
            return jnp.sum(fwd_one(x_, w_) ** 2)

        g = jax.grad(loss, argnums=(0, 1))

        def body(carry, _):
            x_, w_ = carry
            gx, gw = g(x_, w_)
            return (x_ - (1e-9 * gx).astype(x_.dtype),
                    w_ - (1e-9 * gw).astype(w_.dtype)), jnp.mean(gw)

        _, ys = jax.lax.scan(body, (x, w), None, length=N_ITER)
        return ys

    return bwd


def one_batched(x, w):
    return jax.lax.dot_general(
        x, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def make_one_grouped(g):
    cg = C // g

    def one(xg, wg):
        y_full = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        yr = y_full.reshape(cg, g, B, g, F)
        return jnp.moveaxis(jnp.diagonal(yr, axis1=1, axis2=3), -1, 1)

    return one


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (C, B, K), DTYPE)
    w = jax.random.normal(jax.random.PRNGKey(1), (C, K, F), DTYPE)
    results = {"C": C, "B": B, "K": K, "F": F, "n_iter": N_ITER,
               "dtype": "bf16", "device": str(jax.devices()[0])}

    results["fwd_batched_ms"] = timed(jax.jit(fwd_batched), x, w)
    results["bwd_batched_ms"] = timed(jax.jit(make_bwd(one_batched)), x, w)

    for g in (2, 4, 10):
        cg = C // g
        xg = x.reshape(cg, g * B, K)
        # wg[c, :, i*F:(i+1)F] = w[c*g + i]
        wg = jnp.moveaxis(w.reshape(cg, g, K, F), 1, 2).reshape(cg, K, g * F)
        results[f"fwd_grouped{g}_ms"] = timed(
            jax.jit(make_fwd_grouped(g)), xg, wg)
        results[f"bwd_grouped{g}_ms"] = timed(
            jax.jit(make_bwd(make_one_grouped(g))), xg, wg)

    xf = x.reshape(C * B, K)
    wf = w[0]
    results["fwd_shared_control_ms"] = timed(jax.jit(fwd_shared), xf, wf)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
