"""Measure the scan-over-rounds horizon path vs per-round dispatch.

The north-star bench (bench.py) times ``engine.run_round`` in a Python
loop: one device-program dispatch per FL round, params fetched back only
at the end. ``RoundEngine.run_rounds`` (rounds/engine.py) instead scans
the SAME round program over ``n`` rounds inside ONE jitted call, so the
per-round host dispatch (and, on this remote-attached chip, the tunnel
round trip) disappears entirely. This bench is the first on-chip
measurement of that path at the north-star shape (C=100, B=32, Krum) —
rounds/engine.py shipped it in round 2 but every committed number so far
used the per-round loop.

Reference yardstick: the sequential per-round loop it compresses is the
reference's whole architecture (run_experiments.py:193-240, one process,
one round at a time).

Run:  python -m benchmarks.horizon_bench   (or as a script; shim below)
Writes artifacts/bench/horizon.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "bench")


def main() -> None:
    import jax

    from bench import build_engine

    engine, params = build_engine()

    # --- per-round dispatch loop (the committed bench path) ---
    _, m = engine.run_round(params, jax.random.PRNGKey(0))
    float(m["client_loss_mean"])  # compile + sync (value fetch, not block_until_ready)

    n = 6
    t0 = time.perf_counter()
    p = params
    for r in range(n):
        p, m = engine.run_round(p, jax.random.PRNGKey(r + 1))
    loop_loss = float(m["client_loss_mean"])
    loop_dt = time.perf_counter() - t0

    # --- scan-over-rounds: ONE device program for the whole horizon ---
    t0 = time.perf_counter()
    p2, m2 = engine.run_rounds(params, jax.random.PRNGKey(100), n)
    compile_and_run = time.perf_counter() - t0
    float(m2["client_loss_mean"][-1])

    t0 = time.perf_counter()
    p2, m2 = engine.run_rounds(params, jax.random.PRNGKey(101), n)
    scan_loss = float(m2["client_loss_mean"][-1])
    scan_dt = time.perf_counter() - t0

    out = {
        "shape": "C=100 B=32 E=2 krum (north-star)",
        "n_rounds": n,
        "loop_ms_per_round": round(loop_dt / n * 1e3, 1),
        "scan_ms_per_round": round(scan_dt / n * 1e3, 1),
        "loop_rounds_per_min": round(n / loop_dt * 60.0, 1),
        "scan_rounds_per_min": round(n / scan_dt * 60.0, 1),
        "scan_first_call_s": round(compile_and_run, 1),
        "loop_final_loss": round(loop_loss, 4),
        "scan_final_loss": round(scan_loss, 4),
    }
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "horizon.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
