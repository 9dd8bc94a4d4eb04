"""End-to-end smoke tests: the minimum viable slice must learn.

Mirrors the reference's quick_test.py gates (reference: quick_test.py:16-95:
1-round sanity run with an accuracy threshold), on the synthetic learnable
task since this environment has no dataset downloads.
"""

import numpy as np

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def test_clean_fedavg_learns():
    cfg = ExperimentConfig(
        name="smoke_clean",
        dataset="synthetic",
        num_clients=5,
        num_rounds=3,
        local_epochs=1,
        batch_size=32,
        learning_rate=0.05,
        dataset_params={"num_train": 1500, "num_test": 500},
    )
    res = run_simulation(cfg)
    assert len(res.round_accuracies) == 3
    # The synthetic prototype task is easy; FedAvg should be way past chance.
    assert res.final_accuracy > 0.5, res.round_accuracies
    # Accuracy should broadly improve over rounds.
    assert res.round_accuracies[-1] >= res.round_accuracies[0] - 0.05


def test_krum_defense_runs_end_to_end():
    cfg = ExperimentConfig(
        name="smoke_krum",
        dataset="synthetic",
        num_clients=5,
        num_rounds=2,
        local_epochs=1,
        batch_size=32,
        learning_rate=0.05,
        defense_enabled=True,
        defense_type="krum",
        num_malicious_assumed=1,
        dataset_params={"num_train": 1000, "num_test": 300},
    )
    res = run_simulation(cfg)
    # Krum forwards a single client's update, so it learns slower than
    # FedAvg; this gate checks end-to-end execution + above-chance progress.
    assert res.final_accuracy > 0.12


def test_backdoor_attack_reports_asr():
    cfg = ExperimentConfig(
        name="smoke_backdoor",
        dataset="synthetic",
        num_clients=5,
        num_rounds=2,
        local_epochs=1,
        batch_size=32,
        learning_rate=0.05,
        attack_enabled=True,
        attack_type="backdoor",
        malicious_clients=[0],
        poison_ratio=0.5,
        target_class=0,
        dataset_params={"num_train": 1000, "num_test": 300},
    )
    res = run_simulation(cfg)
    assert res.attack_success_rate is not None
    assert 0.0 <= res.attack_success_rate <= 1.0


def test_results_json_schema_matches_reference():
    cfg = ExperimentConfig(
        name="smoke_schema", dataset="synthetic", num_clients=4, num_rounds=1,
        local_epochs=1, dataset_params={"num_train": 400, "num_test": 200},
    )
    res = run_simulation(cfg)
    d = res.to_dict()
    # Keys the reference artifacts carry (quick_results/*.json).
    for key in (
        "config", "round_accuracies", "round_losses", "final_accuracy",
        "final_loss", "attack_success_rate", "training_time_seconds",
        "timestamp",
    ):
        assert key in d
    assert isinstance(d["round_accuracies"], list)
    assert np.isfinite(d["final_loss"])
