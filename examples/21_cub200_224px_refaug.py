"""CUB-200 image-only from-scratch, round 5 final push: the reference's
FULL train transform at its native resolution.

The 224px RandomResizedCrop+flip run (examples/18) set the from-scratch
record at best MTA 0.4427 — but it used only half the reference's train
augmentation, and its curve peaked at round 169/240 then drifted down
2.2 points as the cosine lr decayed to zero (late-stage overfitting is
exactly what the missing augmentations regularize). This run makes two
changes, both built since that run:

1. ``augment="ref_cub"`` — the device-side equivalent of the reference's
   complete CUB train pipeline (reference: src/utils/cub200_loader.py:
   193-199): RandomResizedCrop(scale 0.7-1.0) -> RandomHorizontalFlip ->
   RandomRotation(15) -> ColorJitter(0.2, 0.2, 0.2), applied inside the
   jitted local-training scan (data/preprocess.py).
2. ``min_lr_frac=0.05`` — the cosine schedule decays to a 5% floor
   instead of zero (rounds/engine.py::make_lr_schedule), so late rounds
   keep learning instead of freezing into the overfit.

Everything else is the examples/18 recipe (ResNet-18, 3 iid clients,
2 local epochs, lr 0.1 cosine, label smoothing 0.1, wd 5e-4, bf16).
The reference fine-tunes ImageNet-pretrained ResNet-50
(src/models/cub200_cnn.py:23-54); no weights file exists in this
zero-egress environment, so this remains the honest from-scratch
comparison on the real mounted 11,788-image tree.
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
        name="cub200_image_only_resnet18_224px_refaug",
        dataset="cub200", model="resnet18",
        dataset_params={"image_size": 224, "with_attributes": False},
        num_clients=3, num_rounds=240, local_epochs=2,
        batch_size=32, learning_rate=0.1, momentum=0.9,
        weight_decay=5e-4, clip_norm=1.0, augment="ref_cub",
        lr_schedule="cosine", warmup_rounds=5, min_lr_frac=0.05,
        label_smoothing=0.1,
        partition="iid", seed=42,
        compute_dtype="bfloat16", resident_dtype="bfloat16",
        eval_batch_size=128,
    )
    res = runner.run_simulation(cfg, save=True)
    curve = res.round_accuracies
    best = max(curve)
    best_at = curve.index(best)
    prior = 0.4427
    ok = best >= prior
    print(f"image-only resnet18@224 ref_cub: final {res.final_accuracy:.4f}, "
          f"best {best:.4f} @ round {best_at} (prior record {prior})")
    print("curve (every 10 rounds):",
          [round(a, 4) for a in curve[::10]] + [round(curve[-1], 4)])
    with open(os.path.join(OUT_DIR, "resnet18_224px_refaug_status.json"),
              "w") as f:
        json.dump({"final_accuracy": res.final_accuracy,
                   "best_accuracy": best, "best_round": best_at,
                   "prior_record": prior, "met": ok}, f)


if __name__ == "__main__":
    main()
