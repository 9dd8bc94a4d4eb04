"""Quick attack-vs-defense experiment (the reference's notebook 03):
a backdoor attack with and without Krum, side by side."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def main():
    base = dict(
        dataset="synthetic", num_clients=5, num_rounds=4, local_epochs=2,
        learning_rate=0.05, eval_asr_every_round=True,
        attack_enabled=True, attack_type="backdoor",
        malicious_clients=[0, 1], poison_ratio=0.8, target_class=0,
        trigger_size=6,
        attack_params={"image_size": (28, 28)},
        dataset_params={"num_train": 2000, "num_test": 500},
    )
    undefended = run_simulation(ExperimentConfig(name="bd_none", **base))
    defended = run_simulation(ExperimentConfig(
        name="bd_krum", defense_enabled=True, defense_type="krum",
        num_malicious_assumed=1, **base))

    print(f"{'':18s}{'accuracy':>10s}{'ASR':>10s}")
    print(f"{'no defense':18s}{undefended.final_accuracy:>10.4f}"
          f"{undefended.attack_success_rate:>10.4f}")
    print(f"{'krum':18s}{defended.final_accuracy:>10.4f}"
          f"{defended.attack_success_rate:>10.4f}")


if __name__ == "__main__":
    main()
