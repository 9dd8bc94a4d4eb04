"""Product-path throughput: ExperimentRunner on the north-star workload.

bench.py measures RoundEngine on on-device data; this benchmark runs the
SAME workload (C clients x 600 samples x 2 local epochs, 28x28x8 images,
SimpleCNN, Krum f=C/5) through the full product path — dataset registry ->
partitioner -> stack_clients(flat layout) -> ExperimentRunner.run_simulation
— and reports steady-state rounds/min INCLUDING the per-round host eval
the runner always does (bench.py does not eval per round).

Per-round times come from the runner's own per-round log records (first
two rounds dropped as compile/warmup).

Usage:  python benchmarks/runner_bench.py --clients 100 [--rounds 8]
        python benchmarks/runner_bench.py --clients 400 --chunk 100
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _RoundTimes(logging.Handler):
    def __init__(self):
        super().__init__()
        self.times = []

    def emit(self, record):
        if " round " in record.getMessage():
            self.times.append(record.created)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=100)
    ap.add_argument("--samples-per-client", type=int, default=600)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=None,
                    help="client_chunk (compile-bounding for large C)")
    ap.add_argument("--num-test", type=int, default=1000)
    args = ap.parse_args()
    if args.rounds < 3:
        ap.error("--rounds must be >= 3 (first two rounds are dropped as "
                 "compile/warmup; fewer leaves no steady-state deltas)")

    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import multimodal_fl_security_tpu as mft

    c = args.clients
    cfg = mft.ExperimentConfig(
        name=f"runner_bench_c{c}",
        dataset="synthetic",
        num_clients=c,
        num_rounds=args.rounds,
        local_epochs=2,
        batch_size=32,
        learning_rate=0.01,
        defense_enabled=True,
        defense_type="krum",
        num_malicious_assumed=max(1, c // 5),
        defense_params={"multi_k": 1},
        compute_dtype="bfloat16",
        resident_layout="flat",
        resident_dtype="bfloat16",
        client_chunk=args.chunk,
        eval_batch_size=500,
        dataset_params={
            "num_train": c * args.samples_per_client,
            "num_test": args.num_test,
            # Same 8-channel zero-padded input as bench.py: the first MXU
            # contraction gets 3x3x8=72 lanes (zero channels get exactly
            # zero gradient; measured faster than 1-channel).
            "image_shape": (28, 28, 8),
        },
    )

    handler = _RoundTimes()
    logging.getLogger(
        "multimodal_fl_security_tpu.experiments.runner"
    ).addHandler(handler)
    logging.getLogger(
        "multimodal_fl_security_tpu.experiments.runner"
    ).setLevel(logging.INFO)

    t0 = time.perf_counter()
    res = mft.run_simulation(cfg)
    total = time.perf_counter() - t0

    times = handler.times
    assert len(times) == args.rounds, (len(times), args.rounds)
    deltas = [b - a for a, b in zip(times, times[1:])][1:]  # drop warmup
    per_round = sum(deltas) / len(deltas)
    print(json.dumps({
        "metric": f"runner_rounds_per_min_{c}c_krum",
        "value": round(60.0 / per_round, 2),
        "unit": "rounds/min (incl per-round eval)",
        "clients": c,
        "steady_state_s_per_round": round(per_round, 4),
        "total_wall_s": round(total, 1),
        "final_accuracy": res.final_accuracy,
        "client_chunk": args.chunk,
    }))


if __name__ == "__main__":
    main()
