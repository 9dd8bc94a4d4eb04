"""Bisect the per-step cost of the north-star round (docs/performance.md).

The round at C=100/B=32 spends ~13 ms per training step while the step's
math is ~0.4 ms of bf16 MXU time — a large fixed tail that layer-level
conv work (fused stem, s2d layout) barely moves. This bench attributes
that tail by ablation: each variant is the SAME vmapped 2-epoch scan as
the engine's local_train (rounds/engine.py:159-195), minus exactly one
ingredient, timed on the real s2d-flat resident layout bench.py uses.

Variants
  full        engine step: gather + fwd + bwd + SGD-momentum apply
  fwd         loss only (no backward, no optimizer)
  grad_noopt  fwd+bwd, grads accumulated into the carry (no optimizer,
              params loop-invariant — an UPPER bound on optimizer cost,
              since dropping the param carry also relaxes the loop's
              serial dependency)
  no_gather   full, but each step trains on the same static first-B rows
              (removes the per-step row gather)
  no_dropout  full, without the two dropout masks (PRNG + mask apply)
  model ablations (full step, smaller model):
    no_conv2    stem -> flatten -> dense(128) -> dense(10)
    dense_only  flatten -> dense(128) -> dense(10)
    conv2_only  [B,14,14,32] input -> conv2(64) -> pool -> dense(10)

Run on the TPU: python benchmarks/step_tail_bench.py
Writes artifacts/bench/step_tail.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import flax.linen as nn  # noqa: E402
import optax  # noqa: E402

from multimodal_fl_security_tpu.models.simple_cnn import (  # noqa: E402
    ConvPoolFused, SimpleCNN)
from multimodal_fl_security_tpu.rounds.engine import (  # noqa: E402
    cross_entropy, make_optimizer)

C = 100
B = 32
N = 608  # 19 steps/epoch x 2 epochs = 38 steps, as bench.py
EPOCHS = 2
STEPS = (N // B) * EPOCHS
D_S2D = 15 * 15 * 32  # 7200, stored padded to 7296 (57*128)


def build_data():
    """Same on-device s2d-flat residents as bench.py (bench.py:66-104)."""

    @jax.jit
    def build(key):
        from multimodal_fl_security_tpu.ops.s2d import space_to_depth

        kimg, klab = jax.random.split(key)
        protos = jax.random.uniform(jax.random.PRNGKey(1000), (10, 784))
        labels = jax.random.randint(klab, (C, N), 0, 10, jnp.int32)
        oh = jax.nn.one_hot(labels.reshape(-1), 10, dtype=jnp.float32)
        signal = (oh @ protos).reshape(C, N, 28, 28, 1) + 0.35 * (
            jax.random.normal(kimg, (C, N, 28, 28, 1)))
        images = jnp.concatenate(
            [signal, jnp.zeros((C, N, 28, 28, 7))], axis=-1)
        flat = space_to_depth(images).reshape(C, N, D_S2D)
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, 7296 - D_S2D)))
        return flat.astype(jnp.bfloat16), labels

    return build(jax.random.PRNGKey(0))


class NoConv2(nn.Module):
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, train=False):
        x = ConvPoolFused(32, dtype=self.dtype)(batch["image_s2d"], s2d=True)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(128, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(10, dtype=jnp.float32)(x)


class DenseOnly(nn.Module):
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, train=False):
        x = batch["image_s2d"].reshape((batch["image_s2d"].shape[0], -1))
        x = nn.Dense(128, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(10, dtype=jnp.float32)(x)


class Conv2Only(nn.Module):
    """Just the second conv block on a stem-shaped [B,14,14,32] input."""

    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, batch, train=False):
        x = batch["image_s2d"][:, :14, :14, :]  # adapted blocks -> [B,14,14,32]
        x = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(10, dtype=jnp.float32)(x)


def adapt(batch):
    x = batch["image_s2d"][..., :D_S2D]
    return {"image_s2d": x.reshape(x.shape[:-1] + (15, 15, 32)),
            "label": batch["label"]}


def make_variant(model, mode="full", gather=True, dropout=True,
                 carry_dtype=None):
    """The engine's local_train (rounds/engine.py:159-195) with one knob.

    ``carry_dtype=jnp.bfloat16`` carries params AND momentum through the
    step scan in bf16 (halving the [C, 421k] param-traffic that the
    grad_noopt variant shows is first-order), casting back to f32 at
    exit — a measurement prototype for a possible engine knob.
    """
    opt = make_optimizer(0.01, 0.9, 0.0, 0.0)
    steps = N // B

    def loss_fn(params, batch, bmask, skey):
        batch = adapt(batch)
        rngs = {"dropout": skey} if dropout else None
        logits = model.apply({"params": params}, batch, train=dropout,
                             rngs=rngs)
        return cross_entropy(logits, batch["label"], bmask)

    def local_train(params, data, mask, key):
        if carry_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(carry_dtype), params)
        opt_state = opt.init(params)
        gsum0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), params)

        def epoch_fn(carry, ekey):
            params, opt_state, gsum = carry
            perm = jax.random.permutation(ekey, N).reshape(steps, B)
            skeys = jax.random.split(jax.random.fold_in(ekey, 7), steps)

            def step_fn(carry, xs):
                params, opt_state, gsum = carry
                idx, skey = xs
                if not gather:
                    idx = jnp.arange(B)
                batch = {k: v[idx] for k, v in data.items()}
                bmask = mask[idx]
                if mode == "fwd":
                    loss = loss_fn(params, batch, bmask, skey)
                    return (params, opt_state, gsum), loss
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, batch, bmask, skey)
                if mode == "grad_noopt":
                    gsum = jax.tree_util.tree_map(
                        lambda a, g: a + g.astype(jnp.float32), gsum, grads)
                    return (params, opt_state, gsum), loss
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, gsum), loss

            carry, losses = jax.lax.scan(
                step_fn, (params, opt_state, gsum), (perm, skeys))
            return carry, jnp.mean(losses)

        ekeys = jax.random.split(key, EPOCHS)
        (params, _, gsum), el = jax.lax.scan(
            epoch_fn, (params, opt_state, gsum0), ekeys)
        # fold every output into the loss so nothing is dead-code-eliminated
        tail = sum(jnp.sum(l.astype(jnp.float32)) * 1e-20
                   for l in jax.tree_util.tree_leaves((params, gsum)))
        return jnp.mean(el) + tail

    return jax.jit(jax.vmap(local_train, in_axes=(None, 0, 0, 0)))


def time_variant(fn, params, data, mask, reps=5):
    keys = jax.random.split(jax.random.PRNGKey(3), C)
    float(fn(params, data, mask, keys)[0])  # compile + warmup
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(params, data, mask, keys)
        float(out[0])  # value fetch = hard sync (axon block_until_ready lies)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    images, labels = build_data()
    data = {"image_s2d": images, "label": labels}
    mask = jnp.ones((C, N), jnp.float32)
    sample = adapt({k: v[0, :B] for k, v in data.items()})

    results = {}

    def init(model):
        return model.init(jax.random.PRNGKey(0), sample, train=False)["params"]

    full_model = SimpleCNN(num_classes=10, dtype=jnp.bfloat16)
    cases = [
        ("full", full_model, dict(mode="full")),
        ("fwd", full_model, dict(mode="fwd")),
        ("grad_noopt", full_model, dict(mode="grad_noopt")),
        ("no_gather", full_model, dict(mode="full", gather=False)),
        ("no_dropout", full_model, dict(mode="full", dropout=False)),
        ("bf16_carry", full_model, dict(mode="full",
                                        carry_dtype=jnp.bfloat16)),
        ("no_conv2", NoConv2(), dict(mode="full")),
        ("dense_only", DenseOnly(), dict(mode="full")),
        ("conv2_only", Conv2Only(), dict(mode="full")),
    ]
    for name, model, kw in cases:
        fn = make_variant(model, **kw)
        sec = time_variant(fn, init(model), data, mask)
        results[name] = {"total_ms": round(sec * 1e3, 2),
                         "ms_per_step": round(sec * 1e3 / STEPS, 3)}
        print(f"{name:12s} {results[name]['total_ms']:8.2f} ms "
              f"({results[name]['ms_per_step']:.3f} ms/step)")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "bench", "step_tail.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"workload": f"C={C} B={B} steps={STEPS} bf16 s2d-flat",
                   "variants": results}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
