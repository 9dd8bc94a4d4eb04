"""Apportion the bench step's time and race the Pallas stem conv.

Two questions, measured at the north-star workload (C=100 clients,
B=32, bf16, per-client weights):

1. Where do the 13.2 ms of an isolated train step go? Times each stage
   in isolation: stem conv fwd / fwd+bwd (XLA grouped lowering), conv2,
   dense block, optimizer update, full step.
2. Does the Pallas per-client stem kernel (ops/client_conv.py) beat the
   XLA grouped lowering it replaces? (The XLA-level im2col reformulation
   was falsified in round 2 — conv_formulation_bench.py — because its
   patches round-trip HBM; the Pallas kernel keeps them in VMEM.)

Writes artifacts/bench/fused_conv.json. Run on the TPU.

NOTE (measurement caveat, docs/performance.md): isolated micro-op
timings vary up to ~2x between runs on the tunneled chip; apportionment
here guides WHERE to optimize, the round-level bench decides WHETHER it
helped.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

C, B = 100, 32
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "bench")


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.asarray(a).reshape(-1)[0]), out
    )  # value-fetch sync (block_until_ready returns early via axon)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).reshape(-1)[0]), out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from multimodal_fl_security_tpu.ops.client_conv import (
        client_stem_conv, client_stem_conv_reference)

    key = jax.random.PRNGKey(0)
    kx, kw, kw2, kd1, kd2 = jax.random.split(key, 5)
    x = jax.random.normal(kx, (C, B, 28 * 28 * 8), jnp.bfloat16)
    w4 = (jax.random.normal(kw, (C, 4, 4, 8, 128), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)
    results = {}

    # --- stage 1: stem conv, XLA grouped vs Pallas --------------------
    gfwd = jax.jit(client_stem_conv_reference)
    yg = gfwd(x, w4)
    results["stem_fwd_xla_grouped_ms"] = timeit(gfwd, x, w4)
    print(f"stem fwd (grouped): {results['stem_fwd_xla_grouped_ms']:.3f} ms")
    try:
        pfwd = jax.jit(client_stem_conv)
        yp = pfwd(x, w4)
        err = float(jnp.max(jnp.abs(yg.astype(jnp.float32) -
                                    yp.astype(jnp.float32))))
        results["stem_fwd_pallas_ms"] = timeit(pfwd, x, w4)
        results["stem_fwd_max_abs_err"] = err
        print(f"stem fwd (pallas): {results['stem_fwd_pallas_ms']:.3f} ms | "
              f"err {err:.2e}")
    except Exception as e:  # Mosaic lowering gaps — record, keep measuring
        results["stem_fwd_pallas_error"] = f"{type(e).__name__}: {e}"[:300]
        print(f"stem fwd (pallas) FAILED to lower: {type(e).__name__}")

    # fwd+bwd through each formulation (bwd of the Pallas fwd falls back
    # to XLA unless a custom_vjp exists — this measures the fwd swap only)
    def loss_g(x, w):
        return jnp.sum(client_stem_conv_reference(x, w).astype(jnp.float32))

    g_grad = jax.jit(jax.grad(loss_g, argnums=1))
    results["stem_dw_xla_grouped_ms"] = timeit(g_grad, x, w4)
    print(f"stem dw (grouped): {results['stem_dw_xla_grouped_ms']:.3f} ms")

    # --- stage 2: conv2 (3x3 SAME, 32->64, 14x14) ---------------------
    h = jax.random.normal(kd1, (C, B, 14, 14, 32), jnp.bfloat16)
    w2 = (jax.random.normal(kw2, (C, 3, 3, 32, 64), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)

    def conv2(h, w):
        def one(hc, wc):
            return jax.lax.conv_general_dilated(
                hc, wc, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.vmap(one)(h, w)

    c2 = jax.jit(conv2)
    results["conv2_fwd_ms"] = timeit(c2, h, w2)
    c2g = jax.jit(jax.grad(lambda h, w: jnp.sum(conv2(h, w).astype(jnp.float32)),
                           argnums=(0, 1)))
    results["conv2_fwd_bwd_ms"] = timeit(c2g, h, w2)
    print(f"conv2 fwd {results['conv2_fwd_ms']:.3f} ms, "
          f"fwd+dw+dx {results['conv2_fwd_bwd_ms']:.3f} ms")

    # --- stage 3: dense block ----------------------------------------
    f = jax.random.normal(kd2, (C, B, 3136), jnp.bfloat16)
    wd1 = (jax.random.normal(kd1, (C, 3136, 128), jnp.float32) * 0.02
           ).astype(jnp.bfloat16)
    wd2 = (jax.random.normal(kd2, (C, 128, 10), jnp.float32) * 0.1
           ).astype(jnp.bfloat16)

    def dense(f, a, b):
        hidden = jax.nn.relu(jnp.einsum("cbd,cdk->cbk", f, a))
        return jnp.einsum("cbk,cko->cbo", hidden, b).astype(jnp.float32)

    dn = jax.jit(jax.grad(lambda f, a, b: jnp.sum(dense(f, a, b)),
                          argnums=(1, 2)))
    results["dense_fwd_bwd_ms"] = timeit(dn, f, wd1, wd2)
    print(f"dense fwd+bwd {results['dense_fwd_bwd_ms']:.3f} ms")

    # --- stage 4: full engine step, for scale -------------------------
    from multimodal_fl_security_tpu.data.stacking import ClientData
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import (
        RoundEngine, TrainSpec)

    n_pad = 64  # 2 steps/epoch — isolates per-step cost from epoch scan
    labels = np.asarray(
        jax.random.randint(kx, (C, n_pad), 0, 10, jnp.int32))
    imgs = np.asarray(
        jax.random.normal(kw, (C, n_pad, 6272), jnp.bfloat16).astype(jnp.float32)
    ).astype(np.float32)
    cd = ClientData(
        arrays={"image": jnp.asarray(imgs, jnp.bfloat16),
                "label": jnp.asarray(labels)},
        mask=np.ones((C, n_pad), np.float32),
        counts=np.full((C,), n_pad, np.int32),
        num_classes=10,
        feature_shapes={"image": (28, 28, 8)},
    )
    model = create_model("simple_cnn", num_classes=10, dtype=jnp.bfloat16)
    from multimodal_fl_security_tpu.data.stacking import make_batch_adapter
    sample = make_batch_adapter(cd.feature_shapes)(
        {k: np.asarray(v[0, :B]) for k, v in cd.arrays.items()})
    params = init_model(model, sample, seed=0)["params"]
    eng = RoundEngine(model, cd, TrainSpec(learning_rate=0.01, batch_size=B,
                                           local_epochs=1))
    def round_fn(p, k):
        return eng.run_round(p, k)
    r_ms = timeit(lambda: round_fn(params, jax.random.PRNGKey(1)), reps=10)
    results["engine_round_2step_ms"] = r_ms
    results["per_step_ms_est"] = r_ms / 2
    print(f"2-step engine round {r_ms:.3f} ms (~{r_ms/2:.2f} ms/step)")

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "fused_conv.json"), "w") as fjson:
        json.dump(results, fjson, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
