"""End-to-end FL runs over the multimodal families, including the
cross-modal attack path (BASELINE.json configs 3-5 in miniature)."""

from helpers import TINY_MULTIMODAL, tiny_config
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def test_avmnist_fusion_fl_round():
    cfg = tiny_config(
        "e2e_avmnist", dataset="synthetic_avmnist", num_rounds=2,
        local_epochs=2,
        dataset_params={"num_train": 512, "num_test": 200,
                        "image_shape": (16, 16, 1)},
    )
    res = run_simulation(cfg)
    assert len(res.round_accuracies) == 2
    assert res.final_accuracy > 0.15  # above 10-class chance


def test_cremad_fusion_fl_round():
    cfg = tiny_config(
        "e2e_cremad", dataset="synthetic_cremad", num_rounds=2,
        defense_enabled=True, defense_type="median",
        eval_batch_size=60,
        dataset_params={"num_train": 512, "num_test": 120},
    )
    res = run_simulation(cfg)
    assert res.final_accuracy > 0.15  # above 6-class chance


def test_crossmodal_attack_in_fl_loop():
    """Attribute-poisoning backdoor on the image+attribute fusion model,
    ASR measured on the attribute-triggered testset."""
    cfg = tiny_config(
        "e2e_crossmodal", base=TINY_MULTIMODAL, num_rounds=2,
        attack_enabled=True, attack_type="attribute_poisoning",
        malicious_clients=[0, 1], poison_ratio=0.5, target_class=0,
        attack_params={"trigger_attributes": [0, 1, 2, 3, 4]},
    )
    res = run_simulation(cfg)
    assert res.attack_success_rate is not None
    assert 0.0 <= res.attack_success_rate <= 1.0


def test_model_poisoning_fires_in_simulation():
    """The reference's simulation silently skipped poison_update
    (SURVEY.md §2.9-2); here a scaling attack must visibly disturb training
    under plain FedAvg."""
    clean = run_simulation(tiny_config("mp_clean", num_rounds=2))
    attacked = run_simulation(tiny_config(
        "mp_attacked", num_rounds=2,
        attack_enabled=True, attack_type="scaling",
        malicious_clients=[0], attack_params={"scale": 50.0},
    ))
    # A 50x scaled update through unweighted-vulnerable FedAvg must change
    # the trajectory (typically wrecking accuracy).
    assert attacked.final_accuracy < clean.final_accuracy + 0.05
    assert attacked.round_losses[-1] != clean.round_losses[-1]
