"""Real-TPU validation + timing of the fused local-training megakernel.

Two modes:

  --check   compile ops/fused_kernel.py::fused_local_train with Mosaic on
            the real chip at a small shape (C=4, f32, 2 epochs) and assert
            numerical equivalence vs ops/fused_train.py::mirror_local_train
            (itself proven equal to the flax/optax engine path on CPU in
            tests/test_fused_train.py). This is the evidence hop the
            interpret-mode test (tests/test_fused_kernel.py) cannot give:
            the interpreter does not exercise Mosaic lowering.

  --bench   time the kernel at the north-star workload shape (C=100
            clients x 608 samples x B=32 x 2 local epochs, bf16 compute)
            against the engine's vmapped local-training path isolated from
            bench.py's round program. Reports ms/round for both, plus an
            analytic MFU for the kernel (FLOPs counted on the LOGICAL
            model, not the packed/padded one — padding work is overhead,
            not useful FLOPs).

The reference has no analog (pure torch, sequential clients:
reference experiments/run_experiments.py:193-240); the yardstick is the
engine's own 13.3 ms/step floor attributed to per-client-weight HBM
traffic (docs/performance.md "Step-tail attribution").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.models.simple_cnn import SimpleCNN
from multimodal_fl_security_tpu.ops import fused_kernel as fk
from multimodal_fl_security_tpu.ops import fused_train as ft
from multimodal_fl_security_tpu.ops.s2d import space_to_depth
from multimodal_fl_security_tpu.utils.cache import enable_compile_cache


def _setup(num_clients: int, n: int, seed: int = 0):
    model = SimpleCNN(num_classes=10, dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)
    kimg, klab = jax.random.split(key)
    img = jax.random.normal(kimg, (num_clients, n, 28, 28, 8), jnp.float32)
    blocks = space_to_depth(img)
    xp = ft.pack_blocks(blocks)
    labels = jax.random.randint(klab, (num_clients, n), 0, 10)
    params = model.init(jax.random.PRNGKey(1),
                        {"image_s2d": blocks[0, :ft.B]})["params"]
    return params, xp, labels


def run_check() -> dict:
    C, n = 4, 64
    params, xp, labels = _setup(C, n)
    bmask = jnp.ones((C, n)).at[:, -8:].set(0.0)

    t0 = time.perf_counter()
    out = fk.fused_local_train(
        params, xp, labels, bmask,
        learning_rate=0.05, momentum=0.9, clip_norm=1.0, local_epochs=2,
        compute_dtype=jnp.float32, interpret=False)
    out = jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    # Tolerance: on TPU at default precision, f32 dots run as bf16-input
    # MXU passes; the kernel and the mirror split the contractions
    # differently (per-tap K=128 slices / unrolled wgrads vs XLA's
    # fusions), so trajectories diverge at the bf16 rounding scale —
    # observed max abs drift 5.0e-4 on fc1 after a 2-epoch/4-step run.
    # Bit-level ALGEBRA equality is proven separately by the f32
    # interpret-mode test (tests/test_fused_kernel.py) where both sides
    # use the same exact ops.
    ATOL = 1e-3
    max_abs = 0.0
    worst = None
    for c in range(C):
        ref = ft.mirror_local_train(
            params, xp[c], jax.nn.one_hot(labels[c], 128), bmask[c],
            lr=0.05, momentum=0.9, clip_norm=1.0, local_epochs=2)
        got = jax.tree_util.tree_map(lambda x, _c=c: x[_c], out)
        for (ka, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(ref),
                jax.tree_util.tree_leaves_with_path(got)):
            a, b = np.asarray(a), np.asarray(b)
            d = float(np.max(np.abs(b - a)))
            if d > max_abs:
                max_abs, worst = d, f"client {c} {jax.tree_util.keystr(ka)}"
    return {"mode": "check", "ok": bool(max_abs <= ATOL), "clients": C,
            "compile_s": round(compile_s, 1), "atol": ATOL,
            "max_abs_err_vs_mirror": float(f"{max_abs:.3e}"),
            "worst_tensor": worst}


# Analytic per-sample fwd FLOPs of the LOGICAL SimpleCNN at 28x28
# (3x3 convs counted as 2*K*K*Cin*Cout*H*W; dense 2*in*out). bwd ~ 2x fwd.
def _logical_flops_per_sample() -> float:
    stem = 2 * 3 * 3 * 1 * 32 * 28 * 28       # conv1 (1 signal channel)
    cv2 = 2 * 3 * 3 * 32 * 64 * 14 * 14       # conv2 on pooled map
    fc1 = 2 * 3136 * 128
    fc2 = 2 * 128 * 10
    fwd = stem + cv2 + fc1 + fc2
    return 3.0 * fwd                           # fwd + ~2x fwd for bwd


def _sync(tree) -> float:
    """Force completion via a VALUE FETCH: on the axon remote-TPU
    attachment block_until_ready can return early (ROADMAP #9), so every
    timing boundary here syncs by pulling one element to the host —
    exactly what bench.py does with float(metrics[...])."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[0])))


def run_bench(num_clients: int = 100, samples: int = 600,
              local_epochs: int = 2, iters: int = 5) -> dict:
    n_pad = ((samples + ft.B - 1) // ft.B) * ft.B
    params, xp, labels = _setup(num_clients, n_pad)
    mask = jnp.ones((num_clients, n_pad)).at[:, samples:].set(0.0)

    fn = jax.jit(lambda p, x, l, m: fk.fused_local_train(
        p, x, l, m, learning_rate=0.01, momentum=0.9, clip_norm=1.0,
        local_epochs=local_epochs, compute_dtype=jnp.bfloat16))

    t0 = time.perf_counter()
    _sync(fn(params, xp, labels, mask))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, xp, labels, mask)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters

    total_steps = num_clients * local_epochs * (n_pad // ft.B)
    # LOGICAL FLOPs count the 600 real samples only (same definition as
    # bench.py::logical_flops_per_round): the 8 padded rows per client are
    # overhead, not useful work.
    flops = _logical_flops_per_sample() * num_clients * local_epochs * samples
    # v5e peak: 197 TFLOP/s bf16 (public spec). MFU on logical FLOPs.
    peak = 197e12
    mfu = flops / dt / peak
    return {"mode": "bench", "clients": num_clients,
            "local_train_ms": round(dt * 1e3, 2),
            "ms_per_step": round(dt * 1e3 / total_steps, 4),
            "compile_s": round(compile_s, 1),
            "logical_tflops": round(flops / 1e12, 3),
            "mfu_logical": round(mfu, 5)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--clients", type=int, default=100)
    ap.add_argument("--probe-clients", type=int, default=0,
                    help="bench a small client count first (per-step "
                         "time scales linearly; cheap early signal)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    enable_compile_cache()
    # bench first: timing always lands even if the check trips
    if args.bench:
        if args.probe_clients:
            print(json.dumps(run_bench(num_clients=args.probe_clients,
                                       iters=args.iters)), flush=True)
        print(json.dumps(run_bench(num_clients=args.clients,
                                   iters=args.iters)), flush=True)
    if args.check:
        print(json.dumps(run_check()), flush=True)


if __name__ == "__main__":
    main()
