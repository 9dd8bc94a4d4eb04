"""Backdoor (trigger-patch) attacks + triggered ASR evaluation sets.

Parity with the reference (reference: src/attacks/backdoor.py):
  - trigger patterns square / cross / corner / checkerboard built at
    ``trigger_value`` (default 1.0, *in normalized pixel space* — the
    reference patches post-normalization tensors, backdoor.py:159) (:173-210);
  - 5 named positions with bottom_right = (h-size-1, w-size-1) (:212-230);
  - application *replaces* the whole trigger_size^2 patch with the pattern,
    zeros included (:232-251, :104-112);
  - ``poison_dataset`` triggers int(N * poison_ratio) seeded-random samples
    and sets their label to ``target_class`` (:253-290);
  - ``create_poisoned_testset`` triggers ALL test samples and *excludes*
    samples whose true label is the target class (:62-112, :301-319) — ASR is
    then the fraction predicted as target;
  - ``DistributedBackdoorAttack`` gives each colluding part a horizontal band
    of the trigger (:343-377).

The patch itself is a pure array assignment, applied identically on host
(one-time shard poisoning) and on device (ASR eval batches).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from multimodal_fl_security_tpu.attacks.base import (
    ATTACKS,
    BaseAttack,
    choose_poison_indices,
)
from multimodal_fl_security_tpu.data.datasets import Dataset


def make_trigger(trigger_type: str, size: int, value: float = 1.0) -> np.ndarray:
    """Build a (size, size) trigger pattern (reference: backdoor.py:173-210)."""
    if trigger_type == "cross":
        trig = np.zeros((size, size), np.float32)
        mid = size // 2
        trig[mid, :] = value
        trig[:, mid] = value
    elif trigger_type == "corner":
        trig = np.zeros((size, size), np.float32)
        trig[0, :] = value
        trig[:, 0] = value
    elif trigger_type == "checkerboard":
        ii, jj = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        trig = np.where((ii + jj) % 2 == 0, value, 0.0).astype(np.float32)
    else:  # "square" and unknown types default to the solid square
        trig = np.full((size, size), value, np.float32)
    return trig


def trigger_position(name: str, image_hw: Tuple[int, int], size: int) -> Tuple[int, int]:
    """Top-left corner for a named position (reference: backdoor.py:212-230)."""
    h, w = image_hw
    positions = {
        "bottom_right": (h - size - 1, w - size - 1),
        "top_left": (1, 1),
        "top_right": (1, w - size - 1),
        "bottom_left": (h - size - 1, 1),
        "center": ((h - size) // 2, (w - size) // 2),
    }
    return positions.get(name, positions["bottom_right"])


def apply_trigger(images: np.ndarray, trigger: np.ndarray,
                  position: Tuple[int, int]):
    """Patch-replace the trigger into a batch of NHWC images (pure array op).

    Works on numpy and jax arrays; returns the patched batch.
    """
    row, col = position
    th, tw = trigger.shape
    patch = trigger[None, :, :, None]  # broadcast over batch and channels
    if hasattr(images, "at"):  # jax array
        return images.at[:, row : row + th, col : col + tw, :].set(
            patch.astype(images.dtype)
        )
    out = np.array(images, copy=True)
    out[:, row : row + th, col : col + tw, :] = patch
    return out


@ATTACKS.register("backdoor")
class BackdoorAttack(BaseAttack):
    name = "backdoor"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.trigger_size = int(self.config.get("trigger_size", 3))
        self.trigger_position_name = str(
            self.config.get("trigger_position", "bottom_right")
        )
        self.target_class = int(self.config.get("target_class", 0))
        self.poison_ratio = float(self.config.get("poison_ratio", 0.1))
        self.trigger_type = str(self.config.get("trigger_type", "square"))
        self.trigger_value = float(self.config.get("trigger_value", 1.0))
        self.image_size = tuple(self.config.get("image_size", (28, 28)))
        self.trigger = self._create_trigger()
        self.position = trigger_position(
            self.trigger_position_name, self.image_size, self.trigger_size
        )

    def _create_trigger(self) -> np.ndarray:
        return make_trigger(self.trigger_type, self.trigger_size, self.trigger_value)

    def poison_dataset(self, dataset: Dataset) -> Dataset:
        chosen = choose_poison_indices(len(dataset), self.poison_ratio, self.seed)
        self.num_poisoned = int(len(chosen))
        self.poisoned_indices = chosen.tolist()
        arrays = dict(dataset.arrays)
        images = arrays["image"].copy()
        labels = arrays["label"].copy()
        if len(chosen):
            images[chosen] = apply_trigger(images[chosen], self.trigger, self.position)
            labels[chosen] = self.target_class
        arrays["image"], arrays["label"] = images, labels
        return Dataset(arrays, dataset.num_classes, dataset.name, dict(dataset.meta))

    def create_poisoned_testset(self, testset: Dataset) -> Dataset:
        keep = np.where(testset.labels != self.target_class)[0]
        sub = testset.subset(keep)
        arrays = dict(sub.arrays)
        arrays["image"] = apply_trigger(arrays["image"], self.trigger, self.position)
        # Labels stay original; ASR counts predictions == target_class.
        return Dataset(arrays, testset.num_classes, testset.name + "_triggered",
                       {**sub.meta, "asr_target": self.target_class})

    def is_data_poisoning(self) -> bool:
        return True

    def get_metrics(self) -> Dict[str, Any]:
        return {
            "attack_type": self.name,
            "trigger_size": self.trigger_size,
            "trigger_position": self.trigger_position_name,
            "trigger_type": self.trigger_type,
            "target_class": self.target_class,
            "poison_ratio": self.poison_ratio,
            "num_poisoned": self.num_poisoned,
        }


@ATTACKS.register("distributed_backdoor")
class DistributedBackdoorAttack(BackdoorAttack):
    """Each colluding part patches one horizontal band of the trigger
    (reference: backdoor.py:343-377); the full trigger is used for ASR."""

    name = "distributed_backdoor"

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.num_parts = int(self.config.get("num_parts", 2))
        self.part_id = int(self.config.get("part_id", 0))
        self.full_trigger = self.trigger
        self.full_position = self.position
        # Even row-band split: part p owns rows [p*S//P, (p+1)*S//P) —
        # the old S//P floor gave every part but the last an EMPTY band
        # whenever num_parts > trigger_size. The partial trigger is ONLY
        # the band's rows, applied at a band-shifted position: patching
        # the full patch region with a zero-padded trigger would stamp a
        # black square even for a part whose band carries nothing.
        size = self.trigger_size
        start = (self.part_id * size) // self.num_parts
        end = ((self.part_id + 1) * size) // self.num_parts
        self._band = (start, end)
        self.trigger = self.full_trigger[start:end, :]
        self.position = (self.position[0] + start, self.position[1])

    def for_part(self, part_id: int) -> "DistributedBackdoorAttack":
        cfg = dict(self.config)
        cfg["part_id"] = part_id
        cfg["num_parts"] = self.num_parts
        return DistributedBackdoorAttack(cfg)

    def create_poisoned_testset(self, testset: Dataset) -> Dataset:
        # ASR is measured against the assembled full trigger.
        keep = np.where(testset.labels != self.target_class)[0]
        sub = testset.subset(keep)
        arrays = dict(sub.arrays)
        arrays["image"] = apply_trigger(
            arrays["image"], self.full_trigger, self.full_position
        )
        return Dataset(arrays, testset.num_classes, testset.name + "_triggered",
                       {**sub.meta, "asr_target": self.target_class})
