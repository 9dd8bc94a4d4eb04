"""CUB-200-2011 dataset loader (image + 312-dim attribute modality).

Parity with the reference loader (reference: src/utils/cub200_loader.py:
94-216): parses images.txt / image_class_labels.txt (1-indexed -> 0) /
train_test_split.txt, loads the 312-dim binary attribute matrix, applies
Resize(256)+CenterCrop(224) eval-style preprocessing with ImageNet
normalization. Training augmentation (random crop/flip) runs on device via
data/preprocess.py rather than in the host loader.

Divergences (documented):
  - the reference reads per-image attribute labels from
    attributes/image_attribute_labels.txt (cub200_loader.py:139-158); that
    file is absent from the mounted snapshot, so attributes fall back to the
    per-CLASS matrix attributes/class_attribute_labels_continuous.txt
    binarized at 50% — every image of a class shares its class attribute
    vector. Per-image labels are used automatically when the file exists.
  - ``image_size`` is configurable (default 224); loading all 11,788 images
    at 224^2x3 float32 costs ~7 GB of host RAM, so ``max_samples`` and
    smaller sizes are supported for bounded runs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from multimodal_fl_security_tpu.data.datasets import (
    DATASETS,
    Dataset,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


def _default_dirs():
    return [
        os.environ.get("CUB200_DIR", ""),
        "data/CUB_200_2011/CUB_200_2011",
        "/root/reference/data/CUB_200_2011/CUB_200_2011",
    ]


def _find_root(data_dir: Optional[str]) -> str:
    candidates = [data_dir] if data_dir else []
    candidates += _default_dirs()
    for cand in candidates:
        if cand and os.path.exists(os.path.join(cand, "images.txt")):
            return cand
        if cand and os.path.exists(
            os.path.join(cand, "CUB_200_2011", "images.txt")
        ):
            return os.path.join(cand, "CUB_200_2011")
    raise FileNotFoundError(
        "CUB_200_2011 not found; set CUB200_DIR or pass data_dir "
        f"(searched {candidates})"
    )


def _parse_index_file(path: str) -> Dict[int, str]:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ", 1)
            if len(parts) == 2:
                out[int(parts[0])] = parts[1]
    return out


def _load_attributes(root: str, image_ids, labels) -> Optional[np.ndarray]:
    """Per-image binary attributes; class-matrix fallback (see module doc)."""
    per_image = os.path.join(root, "attributes", "image_attribute_labels.txt")
    if os.path.exists(per_image):
        attrs = np.zeros((max(image_ids) + 1, 312), np.float32)
        with open(per_image) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    img, attr, present = int(parts[0]), int(parts[1]), parts[2]
                    attrs[img, attr - 1] = float(present)
        return attrs[np.asarray(image_ids)]
    class_file = os.path.join(root, "attributes",
                              "class_attribute_labels_continuous.txt")
    if os.path.exists(class_file):
        cls = np.loadtxt(class_file, dtype=np.float32)  # [200, 312] in 0..100
        binary = (cls >= 50.0).astype(np.float32)
        return binary[np.asarray(labels)]
    return None


def _corrupt_attributes(attrs: np.ndarray, image_ids, attr_noise: float,
                        attr_dropout: float, attr_seed: int) -> np.ndarray:
    """Per-image attribute corruption, keyed by (attr_seed, image_id) so
    a given image's corruption is stable across splits/subsets. Flip
    each binarized attribute with prob ``attr_noise`` (x -> 1-x), then
    zero each with prob ``attr_dropout``."""
    out = attrs.copy()
    for i, img_id in enumerate(image_ids):
        rng = np.random.default_rng([attr_seed, int(img_id)])
        if attr_noise > 0.0:
            flip = rng.random(out.shape[1]) < attr_noise
            out[i] = np.where(flip, 1.0 - out[i], out[i])
        if attr_dropout > 0.0:
            drop = rng.random(out.shape[1]) < attr_dropout
            out[i] = np.where(drop, 0.0, out[i])
    return out.astype(attrs.dtype)


@DATASETS.register("cub200", "cub200_multimodal")
def load_cub200(split: str = "train", data_dir: Optional[str] = None,
                image_size: int = 224, max_samples: Optional[int] = None,
                with_attributes: bool = True, attr_noise: float = 0.0,
                attr_dropout: float = 0.0, attr_seed: int = 0,
                **_) -> Dataset:
    """...

    ``attr_noise`` / ``attr_dropout``: per-IMAGE attribute corruption —
    flip each attribute bit with prob ``attr_noise`` and zero each with
    prob ``attr_dropout``, drawn deterministically per image
    (``attr_seed``). With the per-class fallback matrix (see module doc)
    every image of a class otherwise carries an identical, perfectly
    discriminative 312-dim signature, which makes the multimodal task
    trivially separable (MTA 1.000) — these knobs restore the headroom
    the reference's per-image labels would have had
    (reference: src/utils/cub200_loader.py:139-158), so cross-modal
    attack/defense contrasts measure the attack, not the fallback."""
    from PIL import Image

    root = _find_root(data_dir)
    images = _parse_index_file(os.path.join(root, "images.txt"))
    labels_map = {
        k: int(v) - 1
        for k, v in _parse_index_file(
            os.path.join(root, "image_class_labels.txt")
        ).items()
    }
    split_map = {
        k: int(v)
        for k, v in _parse_index_file(
            os.path.join(root, "train_test_split.txt")
        ).items()
    }
    want_train = 1 if split == "train" else 0
    ids = sorted(k for k, s in split_map.items() if s == want_train)
    if max_samples:
        ids = ids[:max_samples]

    resize = int(image_size * 256 / 224)  # Resize(256)/CenterCrop(224) ratio
    out = np.empty((len(ids), image_size, image_size, 3), np.float32)
    labels = np.empty((len(ids),), np.int32)
    for i, img_id in enumerate(ids):
        path = os.path.join(root, "images", images[img_id])
        with Image.open(path) as im:
            im = im.convert("RGB")
            w, h = im.size
            scale = resize / min(w, h)
            im = im.resize((round(w * scale), round(h * scale)),
                           Image.BILINEAR)
            w, h = im.size
            left = (w - image_size) // 2
            top = (h - image_size) // 2
            im = im.crop((left, top, left + image_size, top + image_size))
            out[i] = np.asarray(im, np.float32) / 255.0
        labels[i] = labels_map[img_id]
    out = (out - IMAGENET_MEAN) / IMAGENET_STD

    arrays = {"image": out, "label": labels}
    if with_attributes:
        attrs = _load_attributes(root, ids, labels)
        if attrs is not None:
            if attr_noise > 0.0 or attr_dropout > 0.0:
                attrs = _corrupt_attributes(attrs, ids, attr_noise,
                                            attr_dropout, attr_seed)
            arrays["attributes"] = attrs
    return Dataset(arrays, 200, name="cub200",
                   meta={"normalized": True, "root": root})
