"""Metric tests with constant-logit stub models (reference:
tests/test_asr_crossmodal.py:66-113): ASR ~ 1 when the model always predicts
the target, 0 otherwise; divergence 0 vs positive; tracker history."""

import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.data.datasets import Dataset
from multimodal_fl_security_tpu.utils import metrics as M


class ConstantModel:
    """Stub flax-like model that always predicts ``fixed_class``."""

    def __init__(self, fixed_class: int, num_classes: int = 10):
        self.fixed_class = fixed_class
        self.num_classes = num_classes

    def apply(self, variables, batch, train=False, rngs=None):
        b = batch["image"].shape[0]
        logits = jnp.full((b, self.num_classes), -10.0)
        return logits.at[:, self.fixed_class].set(10.0)


def mock_dataset(n=50, num_classes=10, seed=0):
    rng = np.random.RandomState(seed)
    return Dataset(
        {
            "image": rng.rand(n, 8, 8, 1).astype(np.float32),
            "label": rng.randint(0, num_classes, size=n).astype(np.int32),
        },
        num_classes,
    )


def test_asr_one_when_model_predicts_target():
    ds = mock_dataset()
    nontarget = ds.subset(np.where(ds.labels != 3)[0])
    asr = M.compute_attack_success_rate(ConstantModel(3), {}, nontarget, 3,
                                        batch_size=16)
    assert asr == 1.0


def test_asr_zero_when_model_predicts_other():
    ds = mock_dataset()
    nontarget = ds.subset(np.where(ds.labels != 3)[0])
    asr = M.compute_attack_success_rate(ConstantModel(5), {}, nontarget, 3,
                                        batch_size=16)
    assert asr == 0.0


def test_label_flip_asr_flip_rate():
    ds = mock_dataset(200)
    asr_hit = M.compute_label_flip_asr(ConstantModel(1), {}, ds,
                                       source_class=7, target_class=1,
                                       batch_size=32)
    asr_miss = M.compute_label_flip_asr(ConstantModel(2), {}, ds,
                                        source_class=7, target_class=1,
                                        batch_size=32)
    assert asr_hit == 1.0 and asr_miss == 0.0


def test_evaluate_model_accuracy_against_constant():
    ds = mock_dataset(100)
    frac_3 = float((ds.labels == 3).mean())
    stats = M.evaluate_model(ConstantModel(3), {}, ds, batch_size=32)
    assert abs(stats["accuracy"] - frac_3) < 1e-6
    assert stats["num_samples"] == 100
    assert stats["loss"] > 0


def test_param_divergence():
    a = jnp.zeros((10,))
    b = jnp.ones((10,))
    assert M.compute_param_divergence(a, a) == 0.0
    assert abs(M.compute_param_divergence(a, b) - np.sqrt(10)) < 1e-5


def test_update_similarity_matrix():
    u = jnp.asarray(np.array([[1, 0], [2, 0], [0, 3]], np.float32))
    sim = np.asarray(M.compute_update_similarity(u))
    assert abs(sim[0, 1] - 1.0) < 1e-5
    assert abs(sim[0, 2]) < 1e-5


def test_confusion_matrix_and_class_accuracy():
    ds = mock_dataset(80)
    cm = M.compute_confusion_matrix(ConstantModel(2), {}, ds, batch_size=16)
    assert cm.sum() == 80
    assert cm[:, 2].sum() == 80  # everything predicted as class 2
    accs = M.compute_class_accuracy(ConstantModel(2), {}, ds, batch_size=16)
    assert accs[2] == 1.0
    assert all(v == 0.0 for k, v in accs.items() if k != 2)


def test_attack_metrics_tracker():
    t = M.AttackMetricsTracker("backdoor")
    t.update(1, asr=0.2, accuracy=0.9)
    t.update(2, asr=0.6, accuracy=0.88)
    s = t.summary()
    assert s["rounds"] == 2
    assert s["final_asr"] == 0.6
    assert s["max_asr"] == 0.6
    assert s["final_accuracy"] == 0.88
