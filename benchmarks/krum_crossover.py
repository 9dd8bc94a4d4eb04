"""Locate the Pallas-vs-XLA crossover for the Krum Gram kernel.

VERDICT r2 noted the north-star bench (D = 421,642) never dispatches the
Pallas gram kernel because `ops.pairwise.PALLAS_MIN_D` gates at 2M. This
bench measures BOTH implementations at C=100 across D from bench scale to
ResNet scale so the gate is a measured crossover, not a guess. Each point
cross-checks the two results (max |Δ| of the distance matrices).

Run ON TPU:  python benchmarks/krum_crossover.py
Writes artifacts/bench/krum_crossover.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT_PATH = os.path.join(ROOT, "artifacts", "bench", "krum_crossover.json")


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[..., :1]))


def _time(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1000.0, out


def main() -> None:
    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.ops.pairwise import pairwise_sq_dists
    from multimodal_fl_security_tpu.ops.pallas_kernels import (
        pairwise_sq_dists_pallas,
    )

    C = 100
    # Bench scale (SimpleCNN param count), then a sweep up to ResNet-ish.
    DS = [421_642, 1_000_000, 2_000_000, 4_000_000, 8_000_000]

    jnp_fn = jax.jit(pairwise_sq_dists)
    pl_fn = jax.jit(lambda u: pairwise_sq_dists_pallas(u, interpret=False))

    rows = []
    for d in DS:
        u = jax.random.normal(jax.random.PRNGKey(0), (C, d), jnp.float32)
        u = u + 5.0  # non-centered, like real parameter updates
        _sync(u)
        t_jnp, out_jnp = _time(jnp_fn, u)
        t_pl, out_pl = _time(pl_fn, u)
        err = float(jnp.max(jnp.abs(out_jnp - out_pl)))
        rel = err / max(1e-30, float(jnp.max(jnp.abs(out_jnp))))
        rows.append({"d": d, "jnp_ms": round(t_jnp, 3),
                     "pallas_ms": round(t_pl, 3), "rel_err": rel})
        print(f"D={d:>10,}  jnp {t_jnp:8.3f} ms   pallas {t_pl:8.3f} ms   "
              f"rel_err {rel:.2e}", flush=True)
        del u, out_jnp, out_pl

    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump({"c": C, "rows": rows,
                   "device": str(jax.devices()[0])}, f, indent=2)
    print("\n| D | XLA/jnp (ms) | Pallas (ms) | rel err |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['d']:,} | {r['jnp_ms']} | {r['pallas_ms']} "
              f"| {r['rel_err']:.1e} |")
    print("wrote", OUT_PATH)


if __name__ == "__main__":
    main()
