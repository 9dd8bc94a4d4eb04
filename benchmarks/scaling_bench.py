"""Client-count scaling of the jitted round program.

The reference's simulation degrades LINEARLY in the client count because
clients train sequentially (reference: experiments/run_experiments.py:193,
~30 s/round at FIVE clients); here the client axis is a vmapped array
axis, so the round cost should grow sublinearly until the chip saturates.

Fixed per-client work (600 samples x 2 local epochs, batch 32, bf16
SimpleCNN + Krum), sweeping the client count. Prints one JSON line per C.

Run on TPU:  python benchmarks/scaling_bench.py [C ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(num_clients: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    samples_per_client, batch_size = 600, 32
    train = load_dataset(
        "synthetic", "train",
        num_train=num_clients * samples_per_client, num_test=1,
    )
    train.arrays["image"] = np.pad(
        train.arrays["image"], ((0, 0), (0, 0), (0, 0), (0, 7))
    )
    idx = partition_data(train.labels, num_clients, "iid")
    cd = stack_clients(train, idx, pad_multiple=batch_size)
    model = create_model("simple_cnn", num_classes=10, dtype=jnp.bfloat16)
    sample = {k: v[0, :batch_size] for k, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    engine = RoundEngine(
        model, cd, TrainSpec(learning_rate=0.01, local_epochs=2,
                             batch_size=batch_size),
        defense=get_defense("krum", {"num_malicious": max(num_clients // 5, 1),
                                     "multi_k": 1}),
    )
    p, m = engine.run_round(params, jax.random.PRNGKey(0))
    float(m["client_loss_mean"])  # sync (block_until_ready unreliable here)
    n = 3
    t0 = time.perf_counter()
    for r in range(n):
        p, m = engine.run_round(p, jax.random.PRNGKey(r + 1))
    float(m["client_loss_mean"])
    dt = (time.perf_counter() - t0) / n
    return {
        "num_clients": num_clients,
        "ms_per_round": round(dt * 1e3, 1),
        "rounds_per_min": round(60.0 / dt, 1),
        "client_rounds_per_min": round(60.0 / dt * num_clients, 0),
        "samples_per_client": samples_per_client,
    }


def main():
    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cs = [int(a) for a in sys.argv[1:]] or [25, 100, 400]
    for c in cs:
        print(json.dumps(run_one(c)), flush=True)


if __name__ == "__main__":
    main()
