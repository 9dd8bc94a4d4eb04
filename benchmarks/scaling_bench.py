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
    # ship over the tunnel. Jitted so XLA fuses gather+noise+add into the
    # single output buffer — the eager version holds 3 array-sized
    # temporaries, which OOMs a 16 GB chip at C=200 across a sweep.
    # Built in <=200-client CHUNKS written into a donated resident buffer:
    # even fused, one full-C build holds the f32 matmul output (12.2 GB at
    # C=800) next to the bf16 result — chunking bounds the f32 scratch at
    # ~3 GB so the resident bf16 buffer is the only O(C) allocation.
    bchunk = min(num_clients, 200)
    assert num_clients % bchunk == 0
    dim = 28 * 28 * 8

    @jax.jit
    def build_chunk(key):
        kimg, klab = jax.random.split(key)
        protos = jax.random.uniform(
            jax.random.PRNGKey(1000), (10, dim), jnp.float32
        )
        labels = jax.random.randint(klab, (bchunk, n_pad), 0, 10, jnp.int32)
        # One-hot matmul instead of protos[labels]: XLA's TPU layout for
        # the big gather pads its scratch 4.6x (measured 10.15 GB at
        # C=200 — OOM); the [Cn, 10] x [10, 6272] GEMM has none of that.
        oh = jax.nn.one_hot(labels.reshape(-1), 10, dtype=jnp.float32)
        base = (oh @ protos).reshape(bchunk, n_pad, dim)
        images = base + 0.35 * jax.random.normal(
            kimg, (bchunk, n_pad, dim), jnp.float32
        )
        # Stored FLAT [C, N, 6272] (6272 = 49*128 -> zero tile padding;
        # the natural [.., 28, 8] bf16 layout tile-pads 5.2x = OOM at
        # C=400) and bf16 (the model computes bf16 anyway). Reshaped to
        # NHWC per batch inside the model wrapper below.
        return images.astype(jnp.bfloat16), labels

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def place(images, labels, img_c, lab_c, at):
        return (
            jax.lax.dynamic_update_slice(images, img_c, (at, 0, 0)),
            jax.lax.dynamic_update_slice(labels, lab_c, (at, 0)),
        )

    images = jnp.zeros((num_clients, n_pad, dim), jnp.bfloat16)
    labels = jnp.zeros((num_clients, n_pad), jnp.int32)
    for i in range(num_clients // bchunk):
        img_c, lab_c = build_chunk(jax.random.PRNGKey(i))
        images, labels = place(images, labels, img_c, lab_c, i * bchunk)
    mask = np.zeros((num_clients, n_pad), np.float32)
    mask[:, :samples_per_client] = 1.0
    cd = ClientData(
        arrays={"image": images, "label": labels},
        mask=mask,
        counts=np.full((num_clients,), samples_per_client, np.int32),
        num_classes=10,
    )

    import flax.linen as nn

    class FlatInput(nn.Module):
        """Reshape the flat-stored image back to NHWC per batch."""

        inner: nn.Module

        @nn.compact
        def __call__(self, batch, train=False):
            b = dict(batch)
            b["image"] = b["image"].reshape(-1, 28, 28, 8)
            return self.inner(b, train=train)

    model = FlatInput(
        inner=create_model("simple_cnn", num_classes=10, dtype=jnp.bfloat16)
    )
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
        import gc

        gc.collect()  # free the previous C's device buffers before the next


if __name__ == "__main__":
    main()
