"""CUB-200 image-only from-scratch baseline, round 4 third attempt:
the 160px cosine run (examples/14) reached best MTA 0.2972 — the
remaining gap to the >=30% target is augmentation strength: crop_flip
only jitters by +-2px, while every strong from-scratch CUB recipe
leans on RandomResizedCrop. This run switches to the new on-device
``rrc_flip`` augmentation (data/preprocess.py::random_resized_crop —
the device-side equivalent of the reference's torchvision
RandomResizedCrop, src/utils/cub200_loader.py:199), keeps the
cosine/smoothing/weight-decay recipe, and extends to 200 rounds.

The reference fine-tunes ImageNet-pretrained ResNet-50 (reference:
src/models/cub200_cnn.py:23-54); no weights file exists in this
zero-egress environment, so the honest comparison point remains a
from-scratch federated run on the real mounted 11,788-image tree.
Target: image-only MTA >= 30% (VERDICT.md round-3 item #2).
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


def main():
    runner = ExperimentRunner(results_dir=OUT_DIR)
    cfg = ExperimentConfig(
        name="cub200_image_only_resnet18_160px_rrc",
        dataset="cub200", model="resnet18",
        dataset_params={"image_size": 160, "with_attributes": False},
        num_clients=3, num_rounds=200, local_epochs=2,
        batch_size=32, learning_rate=0.1, momentum=0.9,
        weight_decay=5e-4, clip_norm=1.0, augment="rrc_flip",
        lr_schedule="cosine", warmup_rounds=5, label_smoothing=0.1,
        partition="iid", seed=42,
        compute_dtype="bfloat16", resident_dtype="bfloat16",
        eval_batch_size=256,
    )
    res = runner.run_simulation(cfg, save=True)
    print(f"image-only resnet18@160 rrc: final acc "
          f"{res.final_accuracy:.4f} (cosine/crop_flip record: 0.2972)")
    curve = res.round_accuracies
    print("curve (every 10 rounds):",
          [round(a, 4) for a in curve[::10]] + [round(curve[-1], 4)])
    best = max(curve)
    ok = best >= 0.30
    print(f"best {best:.4f}; TARGET >=0.30:", "MET" if ok else "MISSED")
    with open(os.path.join(OUT_DIR, "resnet18_160px_rrc_status.json"),
              "w") as f:
        json.dump({"final_accuracy": res.final_accuracy,
                   "best_accuracy": best, "target": 0.30, "met": ok}, f)


if __name__ == "__main__":
    main()
