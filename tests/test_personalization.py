"""Personalized evaluation (rounds/personalization.py).

Contract: fine-tuning the global on a client's single-class shard must
make that client's personalized accuracy on its own distribution far
exceed the untuned global's, and the runner must surface the metrics
under extra_metrics["personalization"].
"""

import numpy as np

from helpers import tiny_config


def _single_class_client_data(num_clients, n_per, num_classes=10,
                              image_shape=(16, 16, 1), batch=16):
    """Client i holds ONLY class i samples (maximal label skew)."""
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.stacking import stack_clients

    ds = load_dataset("synthetic", "train", num_train=2048, num_test=64,
                      image_shape=image_shape, num_classes=num_classes)
    indices = []
    for i in range(num_clients):
        idx = np.where(ds.labels == i)[0][:n_per]
        assert len(idx) >= batch, "synthetic class too small for the test"
        indices.append(idx)
    return stack_clients(ds, indices, pad_multiple=batch)


def test_personalization_beats_global_on_skewed_shards():
    import jax

    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import TrainSpec
    from multimodal_fl_security_tpu.rounds.personalization import (
        personalized_evaluation,
    )

    train_cd = _single_class_client_data(3, 64)
    test_cd = _single_class_client_data(3, 32)
    model = create_model("simple_cnn", num_classes=10)
    sample = {k: v[0, :16] for k, v in train_cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]

    spec = TrainSpec(learning_rate=0.05, batch_size=16, local_epochs=2)
    out = personalized_evaluation(model, params, spec, train_cd, test_cd)
    p = np.asarray(out["personalized_accuracy"])
    g = np.asarray(out["global_accuracy"])
    assert p.shape == (3,) and g.shape == (3,)
    # Each client's shard is one class; two fine-tuning epochs collapse the
    # model onto it, so personalized accuracy ~1 while the random-init
    # global is ~chance.
    assert p.mean() > 0.9, (p, g)
    assert p.mean() > g.mean() + 0.3, (p, g)
    jax.block_until_ready(out["test_counts"])


def test_partition_matching_matches_class_mixes():
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import (
        partition_data,
        partition_matching,
    )

    tr = load_dataset("synthetic", "train", num_train=1024, num_test=400)
    te = load_dataset("synthetic", "test", num_train=1024, num_test=400)
    tri = partition_data(tr.labels, 4, "dirichlet", alpha=0.1, seed=7)
    tei = partition_matching(tr.labels, tri, te.labels, seed=7)
    # Exact cover of the test set
    allidx = np.concatenate(tei)
    assert len(allidx) == len(te.labels)
    assert len(np.unique(allidx)) == len(allidx)
    # Per-client class proportions track the train shard's (cosine > .9)
    for c in range(4):
        ht = np.bincount(tr.labels[tri[c]], minlength=10).astype(float)
        he = np.bincount(te.labels[tei[c]], minlength=10).astype(float)
        if he.sum() == 0:
            continue
        cos = (ht @ he) / (np.linalg.norm(ht) * np.linalg.norm(he) + 1e-12)
        assert cos > 0.9, (c, ht, he)


def test_runner_surfaces_personalization_metrics():
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    cfg = tiny_config(
        "pers", num_rounds=2, partition="dirichlet", alpha=0.1,
        personalized_eval=True, personalization_epochs=1,
    )
    res = run_simulation(cfg)
    pm = res.extra_metrics["personalization"]
    assert 0.0 <= pm["personalized_accuracy_mean"] <= 1.0
    assert len(pm["personalized_accuracy_per_client"]) == 4
    # Under alpha=0.1 label skew, adapting to the local distribution must
    # not hurt on average (it usually helps by a wide margin).
    assert (pm["personalized_accuracy_mean"]
            >= pm["global_accuracy_on_client_dists_mean"] - 0.05), pm
