"""Golden-curve parity vs the reference's recorded MNIST artifacts.

The reference committed five quick-config runs with full round-accuracy
curves and ASR values (reference: experiments/quick_results/*.json,
summary_table.md). This harness encodes those numbers so that parity is
AUTOMATIC the moment real MNIST files exist: drop the four IDX files into
``$MNIST_DIR`` (train/t10k images+labels, the torchvision raw layout that
data/datasets.py::_mnist reads) and run

    MNIST_DIR=/path/to/mnist python -m pytest tests/test_mnist_golden_parity.py

Skipped (not failed) when the files are absent — this environment has no
network egress (ROADMAP #1); everything else about the harness is real.

Tolerances: RNG regimes differ (torch vs JAX PRNG), so parity is judged
on curves/ASR within float tolerance, not exact draws (SURVEY.md §7
"Bit-for-bit-within-tolerance"): final MTA within 1 point, per-round
curve within 2 points (round 1 is the noisiest), undefended backdoor ASR
in a band around the recorded 9.15%, defended ASR < 1%.
"""

import os

import numpy as np
import pytest

# Reference: experiments/quick_results/*.json (recorded 2025-12-09).
GOLDEN = {
    "clean_curve": [0.9658, 0.9789, 0.9835, 0.9861, 0.9866],
    "krum_curve": [0.9601, 0.9769, 0.9823, 0.9849, 0.9867],
    "backdoor_none_mta": 0.9874,
    "backdoor_none_asr": 0.0915,
    "backdoor_krum_mta": 0.9868,
    "backdoor_krum_asr": 0.0016,
    "backdoor_trimmed_mta": 0.9877,
    "backdoor_trimmed_asr": 0.0022,
}

MTA_TOL = 0.01          # final accuracy within 1 point
CURVE_TOL = 0.02        # every round within 2 points
ASR_UNDEFENDED_BAND = (0.03, 0.30)   # recorded 9.15%; poisoning is noisy
ASR_DEFENDED_MAX = 0.01              # recorded 0.16% / 0.22%


def _mnist_present() -> bool:
    d = os.environ.get("MNIST_DIR")
    if not d:
        return False
    try:
        from multimodal_fl_security_tpu.data.datasets import load_dataset

        load_dataset("mnist", "train", d)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _mnist_present(),
    reason="real MNIST files not present (set MNIST_DIR); golden-parity "
    "harness is the single switch for the open parity claim (ROADMAP #1)",
)


def _run(attack: str, defense: str):
    import multimodal_fl_security_tpu as mft

    # The reference quick config (quick_results/*.json "config" blocks):
    # 5 clients, 5 rounds, 1 local epoch, lr 0.01, bs 32, iid, client 0
    # malicious, poison_ratio 0.1, target_class 0.
    cfg = mft.ExperimentConfig(
        name=f"golden_{attack}_{defense}",
        dataset="mnist",
        data_dir=os.environ["MNIST_DIR"],
        num_clients=5,
        num_rounds=5,
        local_epochs=1,
        batch_size=32,
        learning_rate=0.01,
        partition="iid",
        attack_enabled=(attack != "none"),
        attack_type=attack,
        malicious_clients=[0] if attack != "none" else [],
        poison_ratio=0.1,
        target_class=0,
        defense_enabled=(defense != "none"),
        defense_type=defense,
        num_malicious_assumed=1,
        trim_ratio=0.1,
        seed=42,
    )
    return mft.run_simulation(cfg)


@pytest.mark.slow
def test_clean_curve_matches_reference():
    res = _run("none", "none")
    assert abs(res.final_accuracy - GOLDEN["clean_curve"][-1]) < MTA_TOL
    for r, (ours, ref) in enumerate(
        zip(res.round_accuracies, GOLDEN["clean_curve"])
    ):
        assert abs(ours - ref) < CURVE_TOL, (
            f"round {r + 1}: {ours:.4f} vs reference {ref:.4f}"
        )


@pytest.mark.slow
def test_krum_clean_curve_matches_reference():
    res = _run("none", "krum")
    assert abs(res.final_accuracy - GOLDEN["krum_curve"][-1]) < MTA_TOL


@pytest.mark.slow
def test_backdoor_undefended_asr_in_reference_band():
    res = _run("backdoor", "none")
    assert abs(res.final_accuracy - GOLDEN["backdoor_none_mta"]) < MTA_TOL
    lo, hi = ASR_UNDEFENDED_BAND
    assert lo < res.attack_success_rate < hi, res.attack_success_rate


@pytest.mark.slow
@pytest.mark.parametrize("defense,mta_key", [
    ("krum", "backdoor_krum_mta"),
    ("trimmed_mean", "backdoor_trimmed_mta"),
])
def test_backdoor_defended_asr_suppressed(defense, mta_key):
    res = _run("backdoor", defense)
    assert abs(res.final_accuracy - GOLDEN[mta_key]) < MTA_TOL
    assert res.attack_success_rate < ASR_DEFENDED_MAX
