"""CUB-200-2011 utility demonstration on real data (no pretrained weights —
this environment has no network egress; the reference fine-tunes ImageNet
weights instead, reference: src/models/cub200_cnn.py:23-54).

Two from-scratch FL runs over the full 5,994-image train split at 64px:
  1. multimodal (image + 312-dim attributes)  -> well above 10-15% target
  2. image-only (attributes disabled)         -> above-chance, slower curve

demonstrating (a) meaningful CUB accuracy end-to-end and (b) the attribute
modality beating image-only, as in the reference's multimodal design.

NOTE on the attribute modality's strength: the mounted CUB snapshot lacks
the per-image attributes/image_attribute_labels.txt, so the loader falls
back to per-CLASS attribute vectors (data/cub200.py module doc) — every
image of a class carries its class's 312-bit signature, making the
attribute branch near-perfectly discriminative by construction. The
image-only run is therefore the honest from-scratch vision baseline.

Round 1's committed artifact reached 2% because `max_samples=1500` takes
the FIRST 1500 ids, which are class-sorted — training saw ~50 of 200
classes. Full-split training fixes that.
"""

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
    local_epochs=2, batch_size=16, learning_rate=0.01,
    augment="crop_flip", partition="iid", seed=42, eval_batch_size=512,
)


def main():
    runner = ExperimentRunner(results_dir=OUT_DIR)

    mm = runner.run_simulation(ExperimentConfig(
        name="cub200_multimodal_utility", num_rounds=15,
        dataset_params={"image_size": 64}, **BASE), save=True)
    print(f"multimodal : final acc {mm.final_accuracy:.4f} "
          f"(200 classes, chance 0.005)")

    img = runner.run_simulation(ExperimentConfig(
        name="cub200_image_only_utility", num_rounds=40,
        dataset_params={"image_size": 64, "with_attributes": False},
        **BASE), save=True)
    print(f"image-only : final acc {img.final_accuracy:.4f}")

    assert mm.final_accuracy >= 0.15, "multimodal below the utility target"
    assert img.final_accuracy >= 0.05, "image-only not above-chance enough"
    assert mm.final_accuracy > img.final_accuracy, \
        "attribute modality must beat image-only"
    print("utility targets met")


if __name__ == "__main__":
    main()
