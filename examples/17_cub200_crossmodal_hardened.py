"""Hardened cross-modal attack evidence on CUB-200 (VERDICT r3 #4).

The round-2 attrpoison contrast (artifacts/cub200/
cub200_multimodal_attrpoison*.json) ran on the per-CLASS attribute
fallback, where every image of a class carries an identical, perfectly
discriminative 312-dim signature — clean MTA saturates at 1.000, so
ASR 0.9998 undefended measures the fallback's separability more than
the attack. This rerun corrupts attributes PER IMAGE
(data/cub200.py attr_noise/attr_dropout — restoring the headroom the
reference's per-image labels would have had,
reference: src/utils/cub200_loader.py:139-158) so the clean task has
real slack, then re-runs the attack/defense contrast:

  1. clean multimodal            (no attack)
  2. attribute-poisoning, none   (cross-modal backdoor implants?)
  3. attribute-poisoning, median (suppressed?)

Matches the intent of reference tests/test_asr_crossmodal.py:219-340.
Writes artifacts/cub200/crossmodal_hardened.json.
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
    "artifacts", "cub200",
)

BASE = dict(
    dataset="cub200", model="multimodal_cnn", num_clients=3,
    num_rounds=15, local_epochs=2, batch_size=16, learning_rate=0.01,
    augment="crop_flip", partition="iid", seed=42, eval_batch_size=512,
    dataset_params={"image_size": 64, "attr_noise": 0.15,
                    "attr_dropout": 0.2, "attr_seed": 7},
)
ATTACK = dict(
    attack_enabled=True, attack_type="attribute_poisoning",
    malicious_clients=[0], poison_ratio=0.3, target_class=0,
    attack_params={"trigger_attributes": list(range(10))},
)


def main():
    runner = ExperimentRunner(results_dir=OUT_DIR)

    def run(name, **kw):
        res = runner.run_simulation(
            ExperimentConfig(name=name, **{**BASE, **kw}), save=True)
        print(f"{name:40s} MTA={res.final_accuracy:.4f} "
              f"ASR={res.attack_success_rate}")
        return res

    clean = run("cub200_xmodal_hard_clean")
    none = run("cub200_xmodal_hard_none", **ATTACK)
    med = run("cub200_xmodal_hard_median", **ATTACK,
              defense_enabled=True, defense_type="median")

    out = {
        "attr_noise": 0.15, "attr_dropout": 0.2,
        "mta_clean": clean.final_accuracy,
        "mta_attacked_none": none.final_accuracy,
        "asr_none": none.attack_success_rate,
        "mta_attacked_median": med.final_accuracy,
        "asr_median": med.attack_success_rate,
    }
    with open(os.path.join(OUT_DIR, "crossmodal_hardened.json"), "w") as f:
        json.dump(out, f, indent=2)

    assert clean.final_accuracy < 0.99, \
        "headroom missing: task still trivially separable"
    print("clean headroom restored "
          f"(MTA {clean.final_accuracy:.4f} < 0.99); "
          f"ASR none={none.attack_success_rate:.4f} "
          f"median={med.attack_success_rate:.4f}")


if __name__ == "__main__":
    main()
