"""Label-flip in its EFFECTIVE regime (VERDICT r2 #4).

The reference's design target for label flipping is ASR 40-80% with a
5-30% accuracy impact (reference: docs/attack_taxonomy.md:46-49) — a
regime IID partitions never reach because honest shards outvote the
flip. The calibrated regime (examples/10_label_flip_efficacy.py):
malicious = top holders of a source class they majority-own by samples
(undefended weighted mean learns the flip) while every honest client
still holds real source data (a robust aggregator can restore it).

Committed artifact from the same script on real sklearn digits
(artifacts/label_flip_efficacy/regime.json): undefended ASR 0.83 with
-8.3% MTA; krum 0.00, median 0.28, trimmed 0.31.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "artifacts", "label_flip_efficacy",
                        "regime.json")


def test_committed_artifact_is_in_the_reference_band():
    """The committed artifact itself must satisfy the regime contract."""
    with open(ARTIFACT) as f:
        r = json.load(f)
    assert r["asr_undefended"] > 0.3
    best = min(r["asr_krum"], r["asr_median"], r["asr_trimmed_mean"])
    assert best < r["asr_undefended"] / 3
    drop = r["mta_clean"] - r["mta_attacked"]
    assert 0.03 <= drop <= 0.35, drop


@pytest.mark.slow
def test_label_flip_efficacy_regime_reproduces():
    """Re-run the two pivotal cells (undefended + krum) of the committed
    regime and assert the contrast reproduces: asr_undefended > 0.3 and
    asr_defended < asr_undefended / 3."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "label_flip_example",
        os.path.join(REPO, "examples", "10_label_flip_efficacy.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
    from multimodal_fl_security_tpu.experiments.runner import ExperimentRunner

    source, target, malicious, _own = mod.pick_regime()
    base = dict(mod.BASE, source_class=source, target_class=target,
                num_rounds=25)
    attack = dict(attack_enabled=True, attack_type="label_flip",
                  poison_ratio=1.0, malicious_clients=malicious)
    runner = ExperimentRunner(results_dir=None)

    none_ = runner.run_simulation(
        ExperimentConfig(name="lf_none", **{**base, **attack}), save=False)
    krum = runner.run_simulation(
        ExperimentConfig(name="lf_krum", defense_enabled=True,
                         defense_type="krum",
                         num_malicious_assumed=mod.NUM_MALICIOUS,
                         **{**base, **attack}), save=False)
    assert none_.attack_success_rate > 0.3, none_.attack_success_rate
    assert krum.attack_success_rate < none_.attack_success_rate / 3, (
        krum.attack_success_rate, none_.attack_success_rate)
