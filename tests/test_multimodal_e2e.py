"""End-to-end FL runs over the multimodal families, including the
cross-modal attack path (BASELINE.json configs 3-5 in miniature)."""

import pytest

from helpers import TINY_MULTIMODAL, tiny_config
from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
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
    """Attribute-poisoning backdoor on the image+attribute fusion model:
    ASR must RISE undefended and FALL under Krum — the inequality that
    catches a silently-disconnected attack path (a tautological
    0 <= asr <= 1 cannot)."""
    atk = dict(
        base=TINY_MULTIMODAL, num_clients=5, num_rounds=3,
        attack_enabled=True, attack_type="attribute_poisoning",
        malicious_clients=[0, 1], poison_ratio=0.8, target_class=0,
        attack_params={"trigger_attributes": [0, 1, 2, 3, 4]},
    )
    undefended = run_simulation(tiny_config("e2e_crossmodal_none", **atk))
    defended = run_simulation(tiny_config(
        "e2e_crossmodal_krum", defense_enabled=True, defense_type="krum",
        num_malicious_assumed=1, **atk))
    assert undefended.attack_success_rate > 0.5
    assert undefended.attack_success_rate > 5 * defended.attack_success_rate


@pytest.mark.slow
def test_backdoor_efficacy_contrast():
    """The reference's documented target regime (attack_taxonomy.md:73-76):
    a strong backdoor implants undefended (ASR >> 0.5) and Krum suppresses
    it with clean accuracy intact. Real data (sklearn digits).

    Mirrors the committed artifact set in artifacts/attack_efficacy/
    (examples/07_attack_efficacy.py, 20-round version)."""
    base = dict(
        dataset="digits", num_clients=5, num_rounds=10, local_epochs=2,
        batch_size=32, learning_rate=0.01, partition="iid", seed=42,
        target_class=0, trigger_size=3,
        attack_enabled=True, attack_type="backdoor",
        poison_ratio=0.8, malicious_clients=[0, 1],
    )
    undefended = run_simulation(
        ExperimentConfig(name="bd_eff_none", **base))
    defended = run_simulation(ExperimentConfig(
        name="bd_eff_krum", defense_enabled=True, defense_type="krum",
        num_malicious_assumed=1, **base))
    assert undefended.attack_success_rate > 0.5
    assert undefended.attack_success_rate > 5 * defended.attack_success_rate
    assert defended.attack_success_rate < 0.05
    # Krum preserves (here: improves) clean accuracy vs the attacked run.
    assert defended.final_accuracy > undefended.final_accuracy - 0.03


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
