"""End-to-end FL runs over the multimodal families, including the
cross-modal attack path (BASELINE.json configs 3-5 in miniature)."""

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def test_avmnist_fusion_fl_round():
    cfg = ExperimentConfig(
        name="e2e_avmnist", dataset="synthetic_avmnist", num_clients=4,
        num_rounds=2, local_epochs=3, learning_rate=0.05, batch_size=16,
        dataset_params={"num_train": 512, "num_test": 200},
        eval_batch_size=100,
    )
    res = run_simulation(cfg)
    assert len(res.round_accuracies) == 2
    assert res.final_accuracy > 0.15  # above 10-class chance


def test_cremad_fusion_fl_round():
    cfg = ExperimentConfig(
        name="e2e_cremad", dataset="synthetic_cremad", num_clients=4,
        num_rounds=2, local_epochs=1, learning_rate=0.05, batch_size=16,
        defense_enabled=True, defense_type="median",
        dataset_params={"num_train": 512, "num_test": 120},
        eval_batch_size=60,
    )
    res = run_simulation(cfg)
    assert res.final_accuracy > 0.15  # above 6-class chance


def test_crossmodal_attack_in_fl_loop():
    """Attribute-poisoning backdoor on the image+attribute fusion model,
    ASR measured on the attribute-triggered testset."""
    cfg = ExperimentConfig(
        name="e2e_crossmodal", dataset="synthetic_multimodal", num_clients=4,
        num_rounds=2, local_epochs=1, learning_rate=0.05, batch_size=16,
        attack_enabled=True, attack_type="attribute_poisoning",
        malicious_clients=[0, 1], poison_ratio=0.5, target_class=0,
        attack_params={"trigger_attributes": [0, 1, 2, 3, 4]},
        dataset_params={"num_train": 512, "num_test": 200,
                        "num_classes": 10},
        eval_batch_size=100,
    )
    res = run_simulation(cfg)
    assert res.attack_success_rate is not None
    assert 0.0 <= res.attack_success_rate <= 1.0


def test_model_poisoning_fires_in_simulation():
    """The reference's simulation silently skipped poison_update
    (SURVEY.md §2.9-2); here a scaling attack must visibly disturb training
    under plain FedAvg."""
    base = dict(
        dataset="synthetic", num_clients=4, num_rounds=2, local_epochs=1,
        learning_rate=0.05, batch_size=16,
        dataset_params={"num_train": 512, "num_test": 200},
        eval_batch_size=100,
    )
    clean = run_simulation(ExperimentConfig(name="mp_clean", **base))
    attacked = run_simulation(ExperimentConfig(
        name="mp_attacked", attack_enabled=True, attack_type="scaling",
        malicious_clients=[0], attack_params={"scale": 50.0}, **base))
    # A 50x scaled update through unweighted-vulnerable FedAvg must change
    # the trajectory (typically wrecking accuracy).
    assert attacked.final_accuracy < clean.final_accuracy + 0.05
    assert attacked.round_losses[-1] != clean.round_losses[-1]
