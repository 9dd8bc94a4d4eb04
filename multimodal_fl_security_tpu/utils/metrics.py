"""Evaluation metrics: clean accuracy (MTA), attack success rate (ASR),
divergence/similarity diagnostics.

Parity with the reference metric definitions (reference: src/utils/metrics.py):
  - ``evaluate_model``: accuracy + mean CE loss over a test set (:14-59);
  - ``compute_attack_success_rate``: fraction of *triggered* inputs predicted
    as the attack target (the triggered set already excludes true-target
    samples, see attacks/backdoor.py) (:62-98);
  - ``compute_label_flip_asr``: on the clean test set, the fraction of
    source-class samples predicted as the target class (:101-157);
  - ``compute_param_divergence``: L2 distance between two parameter vectors
    (:225-242); ``compute_update_similarity``: pairwise cosine (:449-475);
  - per-class accuracy and confusion matrix (:350-426).

All evaluation runs as one jitted scan over padded batches — masks drop the
padding from every statistic.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.data.datasets import Dataset
from multimodal_fl_security_tpu.data.stacking import batch_dataset


import functools


@functools.lru_cache(maxsize=16)
def make_eval_fn(model, eval_batch_size: int = 512) -> Callable:
    """Build a jitted evaluator: (params, batched_arrays) -> stats dict.

    ``batched_arrays`` is the output of :func:`reshape_eval_batches`: every
    modality shaped [num_batches, B, ...] plus "mask" [num_batches, B].
    Returns per-sample sums so callers can derive accuracy/loss/ASR.

    Memoized on (model, batch size) — flax modules hash by structure —
    so the per-call helpers below (evaluate_model, ASR, confusion) reuse
    ONE jitted program instead of retracing the identical scan every
    invocation (a full XLA compile per call on a cold cache).
    """

    @jax.jit
    def eval_fn(params, batches):
        def body(carry, batch):
            mask = batch["mask"]
            logits = model.apply({"params": params}, batch, train=False)
            preds = jnp.argmax(logits, axis=-1)
            labels = batch["label"]
            logp = jax.nn.log_softmax(logits)
            ll = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                     axis=1)[:, 0]
            stats = {
                "correct": jnp.sum((preds == labels) * mask),
                "loss_sum": jnp.sum(-ll * mask),
                "count": jnp.sum(mask),
            }
            return jax.tree_util.tree_map(jnp.add, carry, stats), preds

        init = {
            "correct": jnp.float32(0),
            "loss_sum": jnp.float32(0),
            "count": jnp.float32(0),
        }
        totals, preds = jax.lax.scan(body, init, batches)
        return totals, preds

    return eval_fn


def reshape_eval_batches(dataset: Dataset, batch_size: int) -> Dict[str, jnp.ndarray]:
    """Pad + reshape a dataset into [num_batches, B, ...] device arrays."""
    flat = batch_dataset(dataset, batch_size)
    n_batches = flat["mask"].shape[0] // batch_size
    return {
        k: jnp.asarray(v).reshape((n_batches, batch_size) + v.shape[1:])
        for k, v in flat.items()
    }


def evaluate_model(model, params, dataset: Dataset,
                   batch_size: int = 512) -> Dict[str, float]:
    """Accuracy + mean loss (reference: metrics.py:14-59)."""
    batches = reshape_eval_batches(dataset, batch_size)
    totals, _ = make_eval_fn(model, batch_size)(params, batches)
    count = float(totals["count"])
    return {
        "accuracy": float(totals["correct"]) / max(count, 1.0),
        "loss": float(totals["loss_sum"]) / max(count, 1.0),
        "num_samples": int(count),
    }


def compute_attack_success_rate(model, params, triggered_dataset: Dataset,
                                target_class: int,
                                batch_size: int = 512) -> float:
    """ASR = P(pred == target | triggered input) (reference: metrics.py:62-98).

    ``triggered_dataset`` must already exclude true-target samples
    (attacks/backdoor.py create_poisoned_testset enforces this).
    """
    batches = reshape_eval_batches(triggered_dataset, batch_size)
    # Reuse the memoized evaluator (its second output is the predictions)
    # instead of compiling a bespoke ASR scan per call.
    _, preds = make_eval_fn(model, batch_size)(params, batches)
    mask = np.asarray(batches["mask"]).reshape(-1) > 0
    preds = np.asarray(preds).reshape(-1)[mask]
    if preds.size == 0:
        return 0.0
    return float((preds == target_class).mean())


def compute_label_flip_asr(model, params, clean_testset: Dataset,
                           source_class: int, target_class: int,
                           batch_size: int = 512) -> float:
    """Flip rate of source->target on the clean test set
    (reference: metrics.py:101-157)."""
    keep = np.where(clean_testset.labels == source_class)[0]
    if len(keep) == 0:
        return 0.0
    sub = clean_testset.subset(keep)
    return compute_attack_success_rate(model, params, sub, target_class,
                                       batch_size)


def compute_model_poisoning_metrics(model, clean_params, poisoned_params,
                                    dataset: Dataset,
                                    batch_size: int = 512) -> Dict[str, float]:
    """Accuracy drop + prediction disagreement between a clean and a
    poisoned global model (reference: metrics.py:160-222)."""
    batches = reshape_eval_batches(dataset, batch_size)
    eval_fn = make_eval_fn(model, batch_size)
    clean_totals, clean_preds = eval_fn(clean_params, batches)
    pois_totals, pois_preds = eval_fn(poisoned_params, batches)
    count = max(float(clean_totals["count"]), 1.0)
    clean_acc = float(clean_totals["correct"]) / count
    pois_acc = float(pois_totals["correct"]) / count
    mask = np.asarray(batches["mask"]).reshape(-1) > 0
    disagree = float(
        (np.asarray(clean_preds).reshape(-1)[mask]
         != np.asarray(pois_preds).reshape(-1)[mask]).mean()
    )
    return {
        "clean_accuracy": clean_acc,
        "poisoned_accuracy": pois_acc,
        "accuracy_drop": clean_acc - pois_acc,
        "prediction_disagreement": disagree,
    }


def compute_gradient_norm(grads_flat: jnp.ndarray) -> float:
    """L2 norm of a flattened gradient/update (reference: metrics.py:429-446)."""
    return float(jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(grads_flat)), 0.0)))


def compute_param_divergence(flat_a: jnp.ndarray, flat_b: jnp.ndarray) -> float:
    """L2 distance between flattened parameter vectors (metrics.py:225-242)."""
    return float(jnp.sqrt(jnp.sum(jnp.square(flat_a - flat_b))))


def compute_update_similarity(updates: jnp.ndarray) -> jnp.ndarray:
    """Pairwise cosine similarity matrix over [C, D] (metrics.py:449-475)."""
    norms = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(updates), axis=1), 1e-24))
    normed = updates / norms[:, None]
    return normed @ normed.T


def compute_class_accuracy(model, params, dataset: Dataset,
                           batch_size: int = 512) -> Dict[int, float]:
    """Per-class accuracy (reference: metrics.py:350-390)."""
    batches = reshape_eval_batches(dataset, batch_size)
    _, preds = make_eval_fn(model, batch_size)(params, batches)
    preds = np.asarray(preds).reshape(-1)[: len(dataset)]
    labels = dataset.labels
    out = {}
    for c in range(dataset.num_classes):
        m = labels == c
        if m.sum():
            out[c] = float((preds[m] == c).mean())
    return out


def compute_confusion_matrix(model, params, dataset: Dataset,
                             batch_size: int = 512) -> np.ndarray:
    """Confusion matrix [true, pred] (reference: metrics.py:393-426)."""
    batches = reshape_eval_batches(dataset, batch_size)
    _, preds = make_eval_fn(model, batch_size)(params, batches)
    preds = np.asarray(preds).reshape(-1)[: len(dataset)]
    k = dataset.num_classes
    cm = np.zeros((k, k), np.int64)
    np.add.at(cm, (dataset.labels, preds), 1)
    return cm


class AttackMetricsTracker:
    """Per-round attack metric history (reference: metrics.py:245-347)."""

    def __init__(self, attack_type: str = "none"):
        self.attack_type = attack_type
        self.history: List[Dict[str, Any]] = []

    def update(self, round_idx: int, **metrics) -> None:
        self.history.append({"round": round_idx, **metrics})

    def summary(self) -> Dict[str, Any]:
        if not self.history:
            return {"attack_type": self.attack_type, "rounds": 0}
        keys = [k for k in self.history[-1] if k != "round"
                and isinstance(self.history[-1][k], (int, float))]
        out: Dict[str, Any] = {
            "attack_type": self.attack_type,
            "rounds": len(self.history),
        }
        for k in keys:
            vals = [h[k] for h in self.history if k in h]
            out[f"final_{k}"] = vals[-1]
            out[f"max_{k}"] = max(vals)
        return out
