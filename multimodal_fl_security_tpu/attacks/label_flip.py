"""Label-flipping attacks.

Parity with the reference (reference: src/attacks/label_flip.py):
  - ``LabelFlipAttack``: flip ``poison_ratio`` of the samples whose label is
    ``source_class`` to ``target_class``, exact count
    int(num_source * ratio), seeded selection (:83-126);
  - ``AllToOneAttack``: flip ``poison_ratio`` of ALL samples to
    ``target_class`` (:161-198).

The reference wraps datasets lazily (PoisonedDataset.__getitem__,
label_flip.py:16-41); here shards are materialized arrays, so flipping is a
one-time scatter on the label array — identical resulting distribution.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from multimodal_fl_security_tpu.attacks.base import ATTACKS, BaseAttack
from multimodal_fl_security_tpu.data.datasets import Dataset


@ATTACKS.register("label_flip")
class LabelFlipAttack(BaseAttack):
    name = "label_flip"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.source_class = int(self.config.get("source_class", 7))
        self.target_class = int(self.config.get("target_class", 1))
        self.poison_ratio = float(self.config.get("poison_ratio", 0.5))

    def poison_dataset(self, dataset: Dataset) -> Dataset:
        labels = dataset.labels.copy()
        source_idx = np.where(labels == self.source_class)[0]
        num = int(len(source_idx) * self.poison_ratio)
        rng = np.random.RandomState(self.seed)
        chosen = (
            rng.choice(source_idx, size=num, replace=False)
            if num > 0
            else np.zeros((0,), np.int64)
        )
        labels[chosen] = self.target_class
        self.num_poisoned = int(num)
        self.poisoned_indices = chosen.tolist()
        arrays = dict(dataset.arrays)
        arrays["label"] = labels
        return Dataset(arrays, dataset.num_classes, dataset.name, dict(dataset.meta))

    def is_data_poisoning(self) -> bool:
        return True

    def get_metrics(self) -> Dict[str, Any]:
        return {
            "attack_type": self.name,
            "source_class": self.source_class,
            "target_class": self.target_class,
            "poison_ratio": self.poison_ratio,
            "num_poisoned": self.num_poisoned,
        }


@ATTACKS.register("all_to_one")
class AllToOneAttack(BaseAttack):
    name = "all_to_one"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.target_class = int(self.config.get("target_class", 0))
        self.poison_ratio = float(self.config.get("poison_ratio", 0.3))

    def poison_dataset(self, dataset: Dataset) -> Dataset:
        labels = dataset.labels.copy()
        num = int(len(labels) * self.poison_ratio)
        rng = np.random.RandomState(self.seed)
        chosen = (
            rng.choice(len(labels), size=num, replace=False)
            if num > 0
            else np.zeros((0,), np.int64)
        )
        labels[chosen] = self.target_class
        self.num_poisoned = int(num)
        self.poisoned_indices = chosen.tolist()
        arrays = dict(dataset.arrays)
        arrays["label"] = labels
        return Dataset(arrays, dataset.num_classes, dataset.name, dict(dataset.meta))

    def is_data_poisoning(self) -> bool:
        return True

    def get_metrics(self) -> Dict[str, Any]:
        return {
            "attack_type": self.name,
            "target_class": self.target_class,
            "poison_ratio": self.poison_ratio,
            "num_poisoned": self.num_poisoned,
        }
