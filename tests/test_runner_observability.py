"""Runner observability: per-round ASR, tracker wiring, model-poisoning
metrics, paper-matrix construction."""

import json
import os

import numpy as np

from multimodal_fl_security_tpu.experiments.paper import build_paper_matrix
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def test_per_round_asr_and_tracking(tmp_path):
    from helpers import tiny_config

    cfg = tiny_config(
        "obs_exp", num_rounds=2,
        attack_enabled=True, attack_type="backdoor", malicious_clients=[0],
        poison_ratio=0.5, target_class=0,
        attack_params={"image_size": (16, 16)},
        eval_asr_every_round=True, track=True, track_dir=str(tmp_path),
    )
    res = run_simulation(cfg)
    assert res.attack_success_rate is not None
    path = os.path.join(str(tmp_path), "obs_exp", "results.json")
    assert os.path.exists(path)
    with open(path) as f:
        data = json.load(f)
    assert len(data["history"]) == 2
    assert "asr" in data["history"][0]
    assert data["final_metrics"]["attack_success_rate"] == res.attack_success_rate


def test_privacy_accounting_wired_into_simulation(tmp_path):
    """Epsilon must grow over rounds OF A SIMULATION RUN (the reference's
    accountant is never consulted by its loop, SURVEY.md §2.9-6), and the
    reference-compat naive formula must also be reported."""
    from helpers import tiny_config

    def run(rounds):
        return run_simulation(tiny_config(
            f"dp_obs_{rounds}", num_rounds=rounds,
            defense_enabled=True, defense_type="dp_sgd",
            defense_params={"clip_norm": 10.0, "noise_multiplier": 1.0},
            track=True, track_dir=str(tmp_path),
        ))

    res1, res3 = run(1), run(3)
    p1 = res1.extra_metrics["privacy"]
    p3 = res3.extra_metrics["privacy"]
    assert p1["rounds"] == 1 and p3["rounds"] == 3
    assert 0 < p1["epsilon"] < p3["epsilon"]
    np.testing.assert_allclose(
        p3["reference_epsilon"], 3 * p1["reference_epsilon"], rtol=1e-6)
    # Per-round epsilon reaches the tracker history too.
    path = os.path.join(str(tmp_path), "dp_obs_3", "results.json")
    with open(path) as f:
        hist = json.load(f)["history"]
    eps = [h["defense"]["privacy_epsilon"] for h in hist]
    assert len(eps) == 3 and eps[0] < eps[1] < eps[2]


def test_model_poisoning_metrics():
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.utils.metrics import (
        compute_gradient_norm,
        compute_model_poisoning_metrics,
    )

    ds = load_dataset("synthetic", "test", num_test=200)
    model = create_model("simple_cnn", num_classes=10)
    batch = {k: jnp.asarray(v[:8]) for k, v in ds.arrays.items()}
    clean = init_model(model, batch, seed=0)["params"]
    import jax

    poisoned = jax.tree_util.tree_map(lambda p: p + 0.5, clean)
    m = compute_model_poisoning_metrics(model, clean, poisoned, ds,
                                        batch_size=100)
    assert set(m) == {"clean_accuracy", "poisoned_accuracy", "accuracy_drop",
                      "prediction_disagreement"}
    assert 0.0 <= m["prediction_disagreement"] <= 1.0
    # Identical params -> zero drop, zero disagreement.
    m0 = compute_model_poisoning_metrics(model, clean, clean, ds,
                                         batch_size=100)
    assert m0["accuracy_drop"] == 0.0
    assert m0["prediction_disagreement"] == 0.0

    assert compute_gradient_norm(jnp.ones((4,))) == 2.0


def test_paper_matrix_presets():
    m = build_paper_matrix("mnist", full_distributions=True)
    cells = m.cells()
    # 4 attacks x 5 defenses x (iid + 2 alphas) x 5 seeds = 300
    assert len(cells) == 300
    assert {c.seed for c in cells} == {42, 123, 456, 789, 1024}
    quick = build_paper_matrix("quick").cells()
    assert len(quick) == 20  # 4 x 5 x iid x 1 seed
    mr = [c for c in quick if c.attack_type == "model_replacement"][0]
    assert mr.attack_enabled and mr.malicious_clients
    # The no-download full sweep: the reference's MNIST paper config on
    # the bundled digits dataset, same 300-experiment shape.
    digits = build_paper_matrix("digits_full", full_distributions=True)
    dcells = digits.cells()
    assert len(dcells) == 300
    assert all(c.dataset == "digits" and c.num_clients == 10
               for c in dcells)
