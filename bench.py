"""North-star benchmark: FL rounds/min at 100 clients with Krum defense.

Workload calibration vs the reference (BASELINE.md): the reference's quick
config trains 5 clients x 12,000 MNIST samples x 2 local epochs per round
(~120k sample-passes/round) at ~30 s/round => ~2 rounds/min
(`training_time_seconds` in reference experiments/quick_results/*.json).
This benchmark runs the SAME total work — 100 clients x 600 samples x 2
epochs = 120k sample-passes/round on MNIST-shaped data (28x28x1, SimpleCNN
~1.2M params) — plus full Krum aggregation over the 100-client update
matrix, as one jitted round program on a TPU.

Prints one JSON line:
  {"metric": "fl_rounds_per_min_100c_krum", "value": R, "unit": "rounds/min",
   "vs_baseline": R / 2.0}

``build_engine()`` is the single constructor of this workload, shared with
benchmarks/profile_round.py so the profiled program can never drift from
the measured one.
"""

from __future__ import annotations

import json
import math
import time

# The north-star workload constants, shared by build_engine and the MFU
# computation in main() so the two can never silently drift apart.
NUM_CLIENTS = 100
SAMPLES_PER_CLIENT = 600
BATCH_SIZE = 32
LOCAL_EPOCHS = 2


def build_engine(layout: str = None):
    """Build (engine, params) for the north-star workload.

    ``layout``: "s2d" (default; space-to-depth resident blocks) or "flat"
    — overridable via MFT_BENCH_LAYOUT. See docs/performance.md.
    """
    import os

    import jax

    # Persistent compile cache: the round program's first compile dominates
    # wall time on a fresh process.
    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from multimodal_fl_security_tpu.data.stacking import (
        ClientData,
        make_batch_adapter,
    )
    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    num_clients = NUM_CLIENTS
    samples_per_client = SAMPLES_PER_CLIENT
    batch_size = BATCH_SIZE
    local_epochs = LOCAL_EPOCHS

    # The same synthetic MNIST-shaped task as data/datasets.py's
    # ``synthetic`` family (class-prototype images + 0.35 noise), built ON
    # DEVICE: this host's memory runs at ~50 MB/s (docs/performance.md
    # "measurement caveats"), so materializing + shipping the [100, 608,
    # 28, 28, 8] array from the host costs minutes; jax.random on the chip
    # is instant and the measured metric (steady-state rounds/min) is
    # identical. Layout optimization kept from round 1: the single signal
    # channel is zero-padded to 8 channels (zero channels contribute
    # nothing and their conv weights get exactly zero gradient), so the
    # first MXU contraction has 3x3x8=72 lanes instead of 9.
    n_pad = ((samples_per_client + batch_size - 1) // batch_size) * batch_size

    # Resident layout for the stem (docs/performance.md "Space-to-depth
    # stem"): "s2d" stores 2x2 pixel blocks of the padded image so the
    # per-client stem runs as a 2x2/stride-1 conv over the block grid
    # instead of the 4x4/stride-2 grouped conv (ops/s2d.py). Same math,
    # same model params.
    layout = layout or os.environ.get("MFT_BENCH_LAYOUT", "s2d")

    @jax.jit  # fused: one output buffer instead of eager temporaries
    def build(key):
        kimg, klab = jax.random.split(key)
        protos = jax.random.uniform(
            jax.random.PRNGKey(1000), (10, 28 * 28), jnp.float32
        )
        labels = jax.random.randint(
            klab, (num_clients, n_pad), 0, 10, jnp.int32
        )
        # One-hot matmul, not protos[labels]: XLA pads the big gather's
        # scratch ~4.6x on TPU (OOMs larger sweeps; see scaling_bench).
        oh = jax.nn.one_hot(labels.reshape(-1), 10, dtype=jnp.float32)
        signal = (oh @ protos).reshape(
            num_clients, n_pad, 28, 28, 1
        ) + 0.35 * jax.random.normal(
            kimg, (num_clients, n_pad, 28, 28, 1), jnp.float32
        )
        images = jnp.concatenate(
            [signal,
             jnp.zeros((num_clients, n_pad, 28, 28, 7), jnp.float32)],
            axis=-1,
        )
        if layout == "s2d":
            from multimodal_fl_security_tpu.ops.s2d import space_to_depth

            blocks = space_to_depth(images)  # [C, N, 15, 15, 32]
            flat = blocks.reshape(num_clients, n_pad, 15 * 15 * 32)
            flat = jnp.pad(flat, ((0, 0), (0, 0), (0, 7296 - 7200)))
            return flat.astype(jnp.bfloat16), labels
        # Stored FLAT [C, N, 6272] (49*128 — zero tile padding; the NHWC
        # resident layout tile-pads up to 5.2x) and bf16 (the model
        # computes bf16 anyway); measured ~9% faster per round than
        # NHWC-resident f32 on top of the HBM savings
        # (docs/performance.md "Client-count scaling").
        return (
            images.reshape(num_clients, n_pad, 28 * 28 * 8)
            .astype(jnp.bfloat16),
            labels,
        )

    images, labels = build(jax.random.PRNGKey(0))
    image_key = "image_s2d" if layout == "s2d" else "image"
    image_shape = (15, 15, 32) if layout == "s2d" else (28, 28, 8)
    mask = np.zeros((num_clients, n_pad), np.float32)
    mask[:, :samples_per_client] = 1.0  # 600 real + 8 padded, as before
    # PRODUCT flat-resident layout (data/stacking.py): feature_shapes
    # declares the logical image shape; the engine's batch adapter
    # restores it at the model boundary. This is the same mechanism
    # ExperimentRunner uses (resident_layout="flat" default), so the
    # number below measures the framework path, not a bespoke bench.
    client_data = ClientData(
        arrays={image_key: images, "label": labels},
        mask=mask,
        counts=np.full((num_clients,), samples_per_client, np.int32),
        num_classes=10,
        feature_shapes={image_key: image_shape},
    )

    # bf16 conv/dense compute on the MXU; params, grads, and the Krum
    # aggregation stay f32. Loss curves match f32 to 3 decimals on this
    # model (see commit history) — parity with ~1.6x throughput.
    model = create_model("simple_cnn", num_classes=10, dtype=jnp.bfloat16)
    sample = make_batch_adapter(client_data.feature_shapes)(
        {k: v[0, :batch_size] for k, v in client_data.arrays.items()}
    )
    params = init_model(model, sample, seed=0)["params"]

    spec = TrainSpec(
        learning_rate=0.01, local_epochs=local_epochs, batch_size=batch_size,
        # experiment knob (default 1 = the shipped configuration)
        scan_unroll=int(os.environ.get("MFT_BENCH_UNROLL", "1")),
    )
    engine = RoundEngine(
        model,
        client_data,
        spec,
        defense=get_defense("krum", {"num_malicious": 20, "multi_k": 1}),
    )
    return engine, params


def logical_flops_per_round(num_clients: int = NUM_CLIENTS,
                            samples: int = SAMPLES_PER_CLIENT,
                            local_epochs: int = LOCAL_EPOCHS) -> float:
    """Analytic FLOPs per round of the LOGICAL north-star workload
    (VERDICT r3 #3): per-sample fwd FLOPs of SimpleCNN at 28x28x1
    (convs 2*K*K*Cin*Cout*H*W, dense 2*in*out), bwd ~ 2x fwd, plus the
    Krum Gram matrix (2*C^2*d). Channel/lane padding (1->8 input
    channels, 10->128 logit lanes) is overhead, not useful work, so it
    is deliberately NOT counted — this makes the reported MFU the
    fraction of peak doing the reference's arithmetic."""
    conv1 = 2 * 3 * 3 * 1 * 32 * 28 * 28
    conv2 = 2 * 3 * 3 * 32 * 64 * 14 * 14
    fc1 = 2 * 3136 * 128
    fc2 = 2 * 128 * 10
    fwd = conv1 + conv2 + fc1 + fc2
    train = 3.0 * fwd * num_clients * local_epochs * samples
    d = 421_642  # SimpleCNN logical param count
    krum = 2.0 * num_clients * num_clients * d
    return train + krum


# v5e chip peak: 197 TFLOP/s bf16 (public spec); the MFU denominator.
PEAK_FLOPS = 197e12


def main() -> None:
    import jax

    engine, params = build_engine()

    # Warmup (compile). float() forces a device->host transfer: on some
    # remote-attached platforms block_until_ready returns early, so every
    # timing below syncs through a value fetch.
    _, metrics = engine.run_round(params, jax.random.PRNGKey(0))
    float(metrics["client_loss_mean"])

    n_rounds = 3
    t0 = time.perf_counter()
    p = params
    for r in range(n_rounds):
        p, metrics = engine.run_round(p, jax.random.PRNGKey(r + 1))
    final_loss = float(metrics["client_loss_mean"])
    dt = time.perf_counter() - t0
    assert math.isfinite(final_loss), f"non-finite loss: {final_loss}"

    rounds_per_min = n_rounds / dt * 60.0
    baseline_rounds_per_min = 2.0  # reference: ~30 s/round (BASELINE.md)
    mfu = (logical_flops_per_round(NUM_CLIENTS, SAMPLES_PER_CLIENT,
                                   LOCAL_EPOCHS)
           * (n_rounds / dt) / PEAK_FLOPS)
    print(
        json.dumps(
            {
                "metric": "fl_rounds_per_min_100c_krum",
                "value": round(rounds_per_min, 3),
                "unit": "rounds/min",
                "vs_baseline": round(rounds_per_min / baseline_rounds_per_min, 3),
                "mfu_logical": round(mfu, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
