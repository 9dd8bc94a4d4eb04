"""Cross-modal (multimodal) poisoning attacks.

The reference removed its cross-modal module from the snapshot
(src/attacks/__init__.py:12 mentions a future_paper2_crossmodal dir that is
absent); the only behavioral spec is its test file
(reference: tests/test_asr_crossmodal.py:219-340) and
docs/attack_taxonomy.md:98-111. Implemented to that spec:

  - ``AttributePoisoningAttack``: on a poison_ratio fraction of samples
    (exact count, seeded), set the ``trigger_attributes`` indices of the
    attribute vector to 1.0 and flip the label to ``target_class``;
    ``dual_trigger`` additionally patches a white ``image_trigger_size``
    square into the bottom-right corner of the image;
  - ``DualModalTriggerAttack``: same poisoning with both triggers, plus
    ``create_triggered_test_set(dataset, mode)`` with mode in
    {"both", "image", "attribute"} for per-modality ASR measurement.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from multimodal_fl_security_tpu.attacks.base import (
    ATTACKS,
    BaseAttack,
    choose_poison_indices,
)
from multimodal_fl_security_tpu.data.datasets import Dataset


def _apply_corner_square(images: np.ndarray, size: int,
                         value: float = 1.0) -> np.ndarray:
    """White square flush with the bottom-right corner (test spec checks
    img[..., -size:, -size:] — reference: test_asr_crossmodal.py:283-287)."""
    out = np.array(images, copy=True)
    out[:, -size:, -size:, :] = value
    return out


def _apply_attr_trigger(attrs: np.ndarray, trigger_attributes) -> np.ndarray:
    out = np.array(attrs, copy=True)
    out[:, np.asarray(trigger_attributes, np.int64)] = 1.0
    return out


@ATTACKS.register("attribute_poisoning")
class AttributePoisoningAttack(BaseAttack):
    name = "attribute_poisoning"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.target_class = int(self.config.get("target_class", 0))
        self.poison_ratio = float(self.config.get("poison_ratio", 0.1))
        self.trigger_attributes: List[int] = list(
            self.config.get("trigger_attributes", list(range(10)))
        )
        self.dual_trigger = bool(self.config.get("dual_trigger", False))
        self.image_trigger_size = int(self.config.get("image_trigger_size", 4))

    def poison_dataset(self, dataset: Dataset) -> Dataset:
        chosen = choose_poison_indices(len(dataset), self.poison_ratio, self.seed)
        self.num_poisoned = int(len(chosen))
        self.poisoned_indices = chosen.tolist()
        arrays = dict(dataset.arrays)
        attrs = arrays["attributes"].copy()
        labels = arrays["label"].copy()
        if len(chosen):
            attrs[chosen] = _apply_attr_trigger(
                attrs[chosen], self.trigger_attributes
            )
            labels[chosen] = self.target_class
            if self.dual_trigger:
                images = arrays["image"].copy()
                images[chosen] = _apply_corner_square(
                    images[chosen], self.image_trigger_size
                )
                arrays["image"] = images
        arrays["attributes"], arrays["label"] = attrs, labels
        return Dataset(arrays, dataset.num_classes, dataset.name, dict(dataset.meta))

    def create_poisoned_testset(self, testset: Dataset) -> Dataset:
        keep = np.where(testset.labels != self.target_class)[0]
        sub = testset.subset(keep)
        arrays = dict(sub.arrays)
        arrays["attributes"] = _apply_attr_trigger(
            arrays["attributes"], self.trigger_attributes
        )
        if self.dual_trigger:
            arrays["image"] = _apply_corner_square(
                arrays["image"], self.image_trigger_size
            )
        return Dataset(arrays, testset.num_classes, testset.name + "_triggered",
                       {**sub.meta, "asr_target": self.target_class})

    def is_data_poisoning(self) -> bool:
        return True

    def get_metrics(self) -> Dict[str, Any]:
        return {
            "attack_type": self.name,
            "target_class": self.target_class,
            "poison_ratio": self.poison_ratio,
            "trigger_attributes": list(self.trigger_attributes),
            "num_poisoned": self.num_poisoned,
        }


@ATTACKS.register("dual_modal_trigger")
class DualModalTriggerAttack(BaseAttack):
    name = "dual_modal_trigger"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.target_class = int(self.config.get("target_class", 0))
        self.poison_ratio = float(self.config.get("poison_ratio", 0.1))
        self.trigger_attributes: List[int] = list(
            self.config.get("trigger_attributes", [0, 1, 2])
        )
        self.image_trigger_size = int(self.config.get("image_trigger_size", 4))

    def poison_dataset(self, dataset: Dataset) -> Dataset:
        chosen = choose_poison_indices(len(dataset), self.poison_ratio, self.seed)
        self.num_poisoned = int(len(chosen))
        self.poisoned_indices = chosen.tolist()
        arrays = dict(dataset.arrays)
        images = arrays["image"].copy()
        attrs = arrays["attributes"].copy()
        labels = arrays["label"].copy()
        if len(chosen):
            images[chosen] = _apply_corner_square(
                images[chosen], self.image_trigger_size
            )
            attrs[chosen] = _apply_attr_trigger(attrs[chosen], self.trigger_attributes)
            labels[chosen] = self.target_class
        arrays.update(image=images, attributes=attrs, label=labels)
        return Dataset(arrays, dataset.num_classes, dataset.name, dict(dataset.meta))

    def create_triggered_test_set(self, testset: Dataset,
                                  mode: str = "both") -> Dataset:
        """Per-modality triggered test sets (spec: test_asr_crossmodal.py:303-318)."""
        if mode not in ("both", "image", "attribute"):
            raise ValueError(f"unknown trigger mode: {mode}")
        keep = np.where(testset.labels != self.target_class)[0]
        sub = testset.subset(keep)
        arrays = dict(sub.arrays)
        if mode in ("both", "image"):
            arrays["image"] = _apply_corner_square(
                arrays["image"], self.image_trigger_size
            )
        if mode in ("both", "attribute"):
            arrays["attributes"] = _apply_attr_trigger(
                arrays["attributes"], self.trigger_attributes
            )
        return Dataset(arrays, testset.num_classes,
                       f"{testset.name}_triggered_{mode}",
                       {**sub.meta, "asr_target": self.target_class})

    def create_poisoned_testset(self, testset: Dataset) -> Dataset:
        return self.create_triggered_test_set(testset, "both")

    def is_data_poisoning(self) -> bool:
        return True

    def get_metrics(self) -> Dict[str, Any]:
        return {
            "attack_type": self.name,
            "target_class": self.target_class,
            "poison_ratio": self.poison_ratio,
            "num_poisoned": self.num_poisoned,
        }
