"""CUB-200 IMAGE-modality backdoor contrast on the real mounted tree.

The reference's paper matrix pairs CUB-200 with the same attack x defense
grid as MNIST (reference: experiments/run_paper_experiments.py:55-65,
74-124) but its committed artifacts only cover MNIST
(experiments/quick_results/). artifacts/cub200/ so far covers the
ATTRIBUTE modality (cross-modal poisoning, examples/17); this run
completes the picture on the image modality: a pixel-trigger backdoor
(reference: src/attacks/backdoor.py:173-251 semantics — normalized-space
trigger value 1.0, bottom_right, ASR testset excludes the target class)
at the reference's 28px-equivalent trigger scale (7px at 64px ~ 3px at
28px), 1/5 malicious clients, poison_ratio 0.5, against no defense /
Krum / trimmed-mean.

Recipe note: this uses the round-2 proven from-scratch recipe (64px,
lr 0.05, crop+flip, no schedule) rather than the cosine/RRC record
recipe, because the contrast needs a model that is visibly LEARNING
within the budget: the cosine+RRC recipe's accuracy curve is flat at
chance for its first ~30 rounds (see
artifacts/cub200/cub200_image_only_resnet18_160px_rrc_*.json), which
makes a short-horizon MTA/ASR contrast meaningless. A first cut of this
script at 60 rounds of the cosine recipe measured MTA 0.009 (= chance)
— an object lesson the curve data already contained.

Augmentation note: train-time crop+flip runs ON the poisoned resident
images, so the trigger is cropped/shifted like any other image content —
the honest (harder) setting for the attacker.
"""

import json
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import ExperimentRunner

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "cub200",
)

CELLS = [
    ("none", {}),
    ("krum", {}),
    ("trimmed_mean", {"trim_ratio": 0.2}),
]


def main():
    runner = ExperimentRunner(results_dir=OUT_DIR)
    summary = {}
    for defense, dparams in CELLS:
        cfg = ExperimentConfig(
            name=f"cub200_image_backdoor_{defense}",
            dataset="cub200", model="resnet18",
            dataset_params={"image_size": 64, "with_attributes": False},
            num_clients=5, num_rounds=100, local_epochs=2,
            batch_size=32, learning_rate=0.05, momentum=0.9,
            weight_decay=5e-4, clip_norm=1.0, augment="crop_flip",
            partition="iid", seed=42,
            compute_dtype="bfloat16", resident_dtype="bfloat16",
            eval_batch_size=128,
            attack_enabled=True, attack_type="backdoor",
            malicious_clients=[0], poison_ratio=0.5, target_class=0,
            attack_params={"trigger_size": 7,
                           "trigger_position": "bottom_right",
                           "trigger_type": "square"},
            defense_enabled=defense != "none", defense_type=defense,
            num_malicious_assumed=1,
            defense_params=dparams,
        )
        res = runner.run_simulation(cfg, save=True)
        summary[defense] = {
            "final_mta": res.final_accuracy,
            "best_mta": max(res.round_accuracies),
            "asr": res.attack_success_rate,
        }
        print(f"{defense}: MTA {res.final_accuracy:.4f} "
              f"ASR {res.attack_success_rate:.4f}", flush=True)

    out = {"config": "cub200 64px resnet18, 5 clients (1 malicious), "
                     "100 rounds, backdoor trigger 7px bottom_right, "
                     "poison_ratio 0.5, crop_flip augmentation, lr 0.05",
           "cells": summary,
           "timestamp": datetime.now().isoformat()}
    with open(os.path.join(OUT_DIR, "image_backdoor_contrast.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["cells"], indent=2))


if __name__ == "__main__":
    main()
