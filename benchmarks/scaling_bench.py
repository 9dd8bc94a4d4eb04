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

    from multimodal_fl_security_tpu.data.stacking import ClientData
    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    samples_per_client, batch_size = 600, 32
    n_pad = ((samples_per_client + batch_size - 1) // batch_size) * batch_size

    # Build the client-stacked data ON DEVICE: this host's memory runs at
    # ~50 MB/s (measured, docs/performance.md), so a [C, N, 28, 28, 8]
    # host array would take minutes to materialize and minutes more to
    # ship over the tunnel; jax.random on the chip makes it instant.
    kimg, klab = jax.random.split(jax.random.PRNGKey(0))
    protos = jax.random.uniform(
        jax.random.PRNGKey(1000), (10, 28, 28, 8), jnp.float32
    )
    labels = jax.random.randint(
        klab, (num_clients, n_pad), 0, 10, jnp.int32
    )
    images = protos[labels] + 0.35 * jax.random.normal(
        kimg, (num_clients, n_pad, 28, 28, 8), jnp.float32
    )
    mask = np.zeros((num_clients, n_pad), np.float32)
    mask[:, :samples_per_client] = 1.0
    cd = ClientData(
        arrays={"image": images, "label": labels},
        mask=mask,
        counts=np.full((num_clients,), samples_per_client, np.int32),
        num_classes=10,
    )
    model = create_model("simple_cnn", num_classes=10, dtype=jnp.bfloat16)
    sample = {k: v[0, :batch_size] for k, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    engine = RoundEngine(
        model, cd, TrainSpec(learning_rate=0.01, local_epochs=2,
                             batch_size=batch_size),
        defense=get_defense("krum", {"num_malicious": max(num_clients // 5, 1),
                                     "multi_k": 1}),
        # Above 100 clients the axon service's compile of a C-wide vmap
        # blows past 28 min; a 100-client chunk bounds compile time while
        # the chip stays saturated.
        client_chunk=100 if num_clients > 100 else None,
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
