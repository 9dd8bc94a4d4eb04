"""Family-#2 label-flip follow-up (VERDICT r3 #5): WHY did trimmed-mean
leave ASR at 0.225 vs 0.235 undefended in examples/11?

Hypothesis: at 6 rounds the 7->1 flip barely IMPLANTS — most of the
measured "ASR" is the clean model's natural 7->1 confusion, which no
robust aggregator can (or should) remove. This script adds the missing
control and the longer-horizon contrast:

  - clean-control "ASR": the same config with attack machinery on but
    ZERO malicious clients — compute_label_flip_asr on a clean model
    measures the natural source->target confusion floor,
  - 12-round undefended / trimmed-mean / median / krum runs where the
    attack has time to implant.

Writes artifacts/baseline_scale/family2_analysis.json and the doc
paragraph data for docs/baseline_runs.md.
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

ROUNDS = 12


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    runner = ExperimentRunner(results_dir=OUT_DIR)

    base = dict(
        dataset="synthetic_cifar", num_clients=50, num_rounds=ROUNDS,
        local_epochs=1, batch_size=32, learning_rate=0.05,
        client_chunk=10, compute_dtype="bfloat16",
        dataset_params={"num_train": 10000, "num_test": 1000},
        seed=42,
    )
    attack = dict(
        attack_enabled=True, attack_type="label_flip", poison_ratio=1.0,
        source_class=7, target_class=1,
    )
    mal = list(range(10))  # 20% of 50

    def run(name, **kw):
        res = runner.run_simulation(ExperimentConfig(name=name, **kw),
                                    save=True)
        print(f"{name:46s} MTA={res.final_accuracy:.4f} "
              f"ASR={res.attack_success_rate}")
        return res

    out = {"rounds": ROUNDS}
    # Control: attack machinery on (so ASR is measured) but nobody flips.
    ctrl = run("f2a_control_noflip", **base, **attack, malicious_clients=[])
    out["asr_clean_floor"] = ctrl.attack_success_rate
    out["mta_clean"] = ctrl.final_accuracy

    none = run("f2a_labelflip_none", **base, **attack,
               malicious_clients=mal)
    out["asr_undefended"] = none.attack_success_rate
    out["mta_undefended"] = none.final_accuracy

    for dname, dkw in [
        ("trimmed_mean", dict(defense_type="trimmed_mean",
                              trim_ratio=0.25)),
        ("median", dict(defense_type="median")),
        ("krum", dict(defense_type="krum", num_malicious_assumed=10)),
    ]:
        r = run(f"f2a_labelflip_{dname}", **base, **attack,
                malicious_clients=mal, defense_enabled=True, **dkw)
        out[f"asr_{dname}"] = r.attack_success_rate
        out[f"mta_{dname}"] = r.final_accuracy

    implanted = out["asr_undefended"] - out["asr_clean_floor"]
    out["asr_implanted_over_floor"] = implanted
    print(f"\nclean 7->1 confusion floor: {out['asr_clean_floor']:.4f}; "
          f"implanted component undefended: {implanted:+.4f}")

    with open(os.path.join(OUT_DIR, "family2_analysis.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("artifact written to", OUT_DIR)


if __name__ == "__main__":
    main()
