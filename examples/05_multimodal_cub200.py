"""CUB-200 multimodal FL with a cross-modal attack (the reference's
notebook 05). Needs the CUB_200_2011 directory (CUB200_DIR)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def main():
    cfg = ExperimentConfig(
        name="cub_multimodal", dataset="cub200", model="multimodal_cnn",
        num_clients=3, num_rounds=5, local_epochs=1, batch_size=16,
        learning_rate=0.001, eval_batch_size=64,
        attack_enabled=True, attack_type="attribute_poisoning",
        malicious_clients=[0], poison_ratio=0.3, target_class=0,
        attack_params={"trigger_attributes": list(range(10))},
        dataset_params={"image_size": 64, "max_samples": 600},
    )
    res = run_simulation(cfg)
    print("round accuracies:", [round(a, 4) for a in res.round_accuracies])
    print("attribute-trigger ASR:", res.attack_success_rate)


if __name__ == "__main__":
    main()
