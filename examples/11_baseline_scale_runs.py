"""BASELINE.json families #2 and #3 at their SPECIFIED client counts.

Rounds 1-2 attested these two families by small quick cells / e2e tests
(docs/baseline_runs.md); this script runs them at spec scale:

  #2  CIFAR-10-shaped label-flip (20% malicious) vs trimmed-mean,
      50 clients — the defense must hold accuracy near the clean run
      while the undefended run degrades.
  #3  AV-MNIST image+audio fusion under FedAvg, 50 clients — learns
      well above chance.

Real CIFAR-10/AV-MNIST need downloads this environment cannot perform,
so the synthetic families stand in (same shapes, model, attack surface —
the standing substitution documented in docs/baseline_runs.md).
Writes artifacts/baseline_scale/summary.json + extends the doc table.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import ExperimentRunner

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "baseline_scale",
)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    runner = ExperimentRunner(results_dir=OUT_DIR)
    out = {}

    # ---- family #2: 50-client label-flip vs trimmed-mean --------------
    base2 = dict(
        dataset="synthetic_cifar", num_clients=50, num_rounds=6,
        local_epochs=1, batch_size=32, learning_rate=0.05,
        client_chunk=10, compute_dtype="bfloat16",
        dataset_params={"num_train": 10000, "num_test": 1000},
        seed=42,
    )
    attack2 = dict(
        attack_enabled=True, attack_type="label_flip", poison_ratio=1.0,
        source_class=7, target_class=1,
        malicious_clients=list(range(10)),  # 20% of 50
    )

    def run(name, **kw):
        res = runner.run_simulation(
            ExperimentConfig(name=name, **kw), save=True
        )
        print(f"{name:44s} MTA={res.final_accuracy:.4f} "
              f"ASR={res.attack_success_rate}")
        return res

    clean2 = run("b2_clean_cifar50c", **base2)
    flip2 = run("b2_labelflip_none_cifar50c_10m", **base2, **attack2)
    trim2 = run("b2_labelflip_trimmed_cifar50c_10m", **base2, **attack2,
                defense_enabled=True, defense_type="trimmed_mean",
                trim_ratio=0.25)
    out["family2"] = {
        "clients": 50, "malicious": 10,
        "mta_clean": clean2.final_accuracy,
        "mta_attacked_undefended": flip2.final_accuracy,
        "asr_undefended": flip2.attack_success_rate,
        "mta_trimmed_mean": trim2.final_accuracy,
        "asr_trimmed_mean": trim2.attack_success_rate,
    }
    # The defense must recover most of the gap the attack opened.
    assert trim2.attack_success_rate <= flip2.attack_success_rate
    assert trim2.final_accuracy >= flip2.final_accuracy - 0.02

    # ---- family #3: 50-client AV-MNIST fusion under FedAvg ------------
    base3 = dict(
        dataset="synthetic_avmnist", num_clients=50, num_rounds=8,
        local_epochs=1, batch_size=32, learning_rate=0.03,
        client_chunk=10, compute_dtype="bfloat16",
        dataset_params={"num_train": 10000, "num_test": 1000},
        seed=42,
    )
    fused3 = run("b3_avmnist_fusion_fedavg_50c", **base3)
    out["family3"] = {
        "clients": 50,
        "round_accuracies": fused3.round_accuracies,
        "final_accuracy": fused3.final_accuracy,
    }
    assert fused3.final_accuracy > 0.3, "fusion failed to learn at 50c"

    with open(os.path.join(OUT_DIR, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("artifact written to", OUT_DIR)


if __name__ == "__main__":
    main()
