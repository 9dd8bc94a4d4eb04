"""Personalized evaluation: per-client fine-tuning of the global model.

Standard FL personalization metric (the local-adaptation baseline of
Ditto/pFedMe-style papers; absent from the reference, whose only metric
is global-model accuracy — reference: src/utils/metrics.py:14-59): every
client fine-tunes the final global model on its OWN shard for a few
epochs, then evaluates on a test shard drawn from its OWN distribution.
The gap between personalized and global accuracy measures how much the
clients' distributions diverge (large under Dirichlet/shard partitions,
~0 under IID).

TPU-native shape: fine-tuning is the SAME vmapped local-training program
the round engine uses (one compiled program fine-tunes all C clients in
parallel across the mesh), and per-client evaluation is a vmap of a
masked scan over each client's padded test shard — the entire
personalization pass is ONE jitted dispatch.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.data.stacking import ClientData
from multimodal_fl_security_tpu.rounds.engine import (
    TrainSpec,
    make_local_train_fn,
)


def make_client_eval_fn(model, n_samples: int, batch_size: int, adapt=None):
    """Build eval(params, data, mask) -> (correct, count) for ONE client's
    padded shard [N, ...]; vmap over the leading client axis for all."""
    assert n_samples % batch_size == 0
    steps = n_samples // batch_size

    def eval_fn(params, data, mask):
        batched = {
            k: v.reshape((steps, batch_size) + v.shape[1:])
            for k, v in data.items()
        }
        bmask = mask.reshape(steps, batch_size)

        def body(carry, xs):
            batch, m = xs
            if adapt is not None:
                batch = adapt(batch)
            logits = model.apply({"params": params}, batch, train=False)
            pred = jnp.argmax(logits, axis=-1)
            hit = (pred == batch["label"].astype(pred.dtype)).astype(
                jnp.float32
            )
            correct, count = carry
            return (correct + jnp.sum(hit * m), count + jnp.sum(m)), None

        (correct, count), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)), (batched, bmask)
        )
        return correct, count

    return eval_fn


def personalized_evaluation(
    model,
    global_params,
    spec: TrainSpec,
    train_data: ClientData,
    test_data: ClientData,
) -> Dict[str, jnp.ndarray]:
    """Fine-tune the global on every client's shard and evaluate both the
    personalized and the global model on that client's test shard.

    Returns per-client arrays [C]: ``personalized_accuracy``,
    ``global_accuracy``, plus the test-shard sizes ``test_counts``.
    """
    from multimodal_fl_security_tpu.data.stacking import make_batch_adapter

    local_train = make_local_train_fn(
        model, spec, train_data.max_samples,
        adapt=make_batch_adapter(train_data.feature_shapes),
    )
    client_eval = make_client_eval_fn(
        model, test_data.max_samples, min(spec.batch_size,
                                          test_data.max_samples),
        adapt=make_batch_adapter(test_data.feature_shapes),
    )

    @jax.jit
    def run(params, key, tr_arrays, tr_mask, te_arrays, te_mask):
        ckeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(tr_mask.shape[0])
        )
        tuned, _ = jax.vmap(local_train, in_axes=(None, 0, 0, 0))(
            params, tr_arrays, tr_mask, ckeys
        )
        p_correct, p_count = jax.vmap(client_eval, in_axes=(0, 0, 0))(
            tuned, te_arrays, te_mask
        )
        g_correct, g_count = jax.vmap(client_eval, in_axes=(None, 0, 0))(
            params, te_arrays, te_mask
        )
        denom = jnp.maximum(p_count, 1.0)
        return {
            "personalized_accuracy": p_correct / denom,
            "global_accuracy": g_correct / jnp.maximum(g_count, 1.0),
            "test_counts": p_count,
        }

    tr = {k: jnp.asarray(v) for k, v in train_data.arrays.items()}
    te = {k: jnp.asarray(v) for k, v in test_data.arrays.items()}
    return run(
        global_params, jax.random.PRNGKey(17), tr,
        jnp.asarray(train_data.mask), te, jnp.asarray(test_data.mask)
    )
