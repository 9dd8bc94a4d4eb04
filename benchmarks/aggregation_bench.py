"""Large-D robust-aggregation benchmark: the Pallas kernels on real TPU.

The north-star bench (bench.py) runs Krum at SimpleCNN scale (D = 421,642),
below the Pallas dispatch threshold — this suite runs the aggregation path
at ResNet-50 scale (D = 25M, C = 100; reference hot spot:
reference src/defenses/krum.py:73-99, an O(n^2) torch loop) so the
`gram_pallas` and `sorted_reduce_pallas` kernels are the code actually
measured, and cross-checks every kernel against its pure-jnp fallback at
the same scale.

Writes artifacts/bench/aggregation.json and prints one markdown table
(pasted into docs/performance.md).

Run ON TPU:  python benchmarks/aggregation_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT_PATH = os.path.join(ROOT, "artifacts", "bench", "aggregation.json")


def _sync(x):
    """Force device completion via a host value fetch (block_until_ready can
    return early on remote-attached platforms)."""
    import jax.numpy as jnp

    return float(jnp.sum(x[..., :1]))


def _time(fn, *args, reps=5):
    import jax

    out = fn(*args)  # compile + warm
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1000.0, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (smoke-test the harness itself)")
    args = ap.parse_args()

    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.ops import pairwise
    from multimodal_fl_security_tpu.ops.pallas_kernels import (
        pairwise_sq_dists_pallas,
        sorted_reduce_pallas,
    )

    platform = jax.devices()[0].platform
    C = 100
    D_BIG = 1_000_000 if args.quick else 25_000_000   # ResNet-50 scale
    D_MID = 500_000 if args.quick else 8_000_000      # jnp sort still fits

    rows = []
    results = {"platform": platform, "C": C, "D_big": D_BIG, "D_mid": D_MID}

    # Fused generation: one output buffer, no RNG temporaries (10 GB each
    # at full scale).
    from functools import partial

    @partial(jax.jit, static_argnames=("d",))
    def gen(key, d):
        return 1.0 + 0.01 * jax.random.normal(key, (C, d), jnp.float32)

    # --- sorted reduce at D_MID first: Pallas vs jnp sort (the jnp sort's
    # --- sorted copy + the big matrix would not coexist in 16 GB HBM) ----
    mid = gen(jax.random.PRNGKey(1), D_MID)
    _sync(mid)
    t = 10
    for mode, jnp_fn in (
        ("median", lambda u: jnp.sort(u, axis=0)[(C - 1) // 2]),
        ("trimmed", lambda u: jnp.mean(jnp.sort(u, axis=0)[t: C - t], 0)),
    ):
        pal_ms, pal_out = _time(
            jax.jit(lambda u, m=mode: sorted_reduce_pallas(
                u, mode=m, trim=t, interpret=platform != "tpu")), mid)
        jnp_ms, jnp_out = _time(jax.jit(jnp_fn), mid)
        err = float(jnp.max(jnp.abs(pal_out - jnp_out)))
        assert err < 1e-4, f"{mode} kernel mismatch: {err}"
        rows.append((f"{mode} sorted-reduce [100, {D_MID // 1_000_000}M]",
                     pal_ms, jnp_ms, err))
        results[f"{mode}_pallas_ms_mid"] = pal_ms
        results[f"{mode}_jnp_ms_mid"] = jnp_ms
        del pal_out, jnp_out
    del mid

    # --- build the big update matrix (10 GB at full scale) ----------------
    big = gen(jax.random.PRNGKey(0), D_BIG)
    _sync(big)

    # --- Krum distances: Pallas gram vs XLA blockwise gram ---------------
    pal_ms, pal_d2 = _time(
        jax.jit(lambda u: pairwise_sq_dists_pallas(u, interpret=False)
                if platform == "tpu" else pairwise.pairwise_sq_dists(u)),
        big,
    )
    xla_ms, xla_d2 = _time(jax.jit(pairwise.pairwise_sq_dists), big)
    rel = float(jnp.max(jnp.abs(pal_d2 - xla_d2))
                / jnp.maximum(jnp.max(jnp.abs(xla_d2)), 1e-12))
    assert rel < 1e-4, f"gram kernel mismatch: rel err {rel}"
    rows.append(("krum pairwise dists [100, %dM]" % (D_BIG // 1_000_000),
                 pal_ms, xla_ms, rel))
    results["gram_pallas_ms"] = pal_ms
    results["gram_xla_ms"] = xla_ms
    results["gram_rel_err"] = rel

    # --- full Krum defense aggregate (the dispatched production path) ----
    krum = get_defense("krum", {"num_malicious": 20, "multi_k": 1})
    w = jnp.ones((C,), jnp.float32)
    krum_ms, agg = _time(
        jax.jit(lambda u, w: krum.aggregate_with_aux(u, w, {})[0]), big, w)
    assert bool(jnp.isfinite(agg[0])), "non-finite krum aggregate"
    dispatched = pairwise._use_pallas(D_BIG)
    rows.append(("full krum aggregate (defense path)", krum_ms, None, None))
    results["krum_defense_ms"] = krum_ms
    results["krum_dispatches_pallas"] = dispatched

    # --- sorted reduce at D_BIG: Pallas only (jnp sort would OOM: the ----
    # --- sorted copy doubles the 10 GB footprint), column-slice checked --
    pal_ms, pal_out = _time(
        jax.jit(lambda u: sorted_reduce_pallas(
            u, mode="trimmed", trim=t, interpret=platform != "tpu")), big)
    cols = np.arange(0, 4096)
    sub = np.sort(np.asarray(big[:, :4096]), axis=0)[t: C - t].mean(0)
    err = float(np.max(np.abs(np.asarray(pal_out[cols]) - sub)))
    assert err < 1e-4, f"large-D trimmed mismatch: {err}"
    rows.append((f"trimmed sorted-reduce [100, {D_BIG // 1_000_000}M]",
                 pal_ms, None, err))
    results["trimmed_pallas_ms_big"] = pal_ms

    # --- emit ------------------------------------------------------------
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=2)

    print(f"\nplatform={platform}  C={C}")
    print("| Op | Pallas (ms) | XLA/jnp (ms) | max/rel err |")
    print("|---|---|---|---|")
    for name, p, x, e in rows:
        print(f"| {name} | {p:.1f} | "
              f"{'—' if x is None else f'{x:.1f}'} | "
              f"{'—' if e is None else f'{e:.2e}'} |")
    print(f"\nwrote {OUT_PATH}")


if __name__ == "__main__":
    main()
