"""Dataset registry.

A dataset is a plain dict of host numpy arrays plus metadata::

    {"image": [N,H,W,C] float32, "label": [N] int32, ...optional modalities}

Datasets (like the reference's MNIST/CUB-200 pair,
reference: src/utils/data_loader.py:24-50, src/utils/cub200_loader.py:94-216)
are loaded once on the host; all per-round work (partition gather, poisoning,
normalization, training) then happens on device. This environment has no
network egress, so every real dataset reads from local files; ``synthetic``
families generate learnable classification tasks with identical shapes so the
full pipeline (including accuracy-threshold tests) runs anywhere.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from multimodal_fl_security_tpu.core.registry import Registry

DATASETS: Registry = Registry("dataset")

# Normalization constants (match the reference transforms,
# reference: src/utils/data_loader.py:16-21 and cub200_loader.py:192-216).
MNIST_MEAN, MNIST_STD = 0.1307, 0.3081
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)


@dataclass
class Dataset:
    """Host-side dataset: dict of aligned numpy arrays + metadata."""

    arrays: Dict[str, np.ndarray]
    num_classes: int
    name: str = "dataset"
    meta: Dict[str, Any] = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.arrays["label"])

    @property
    def labels(self) -> np.ndarray:
        return self.arrays["label"]

    def subset(self, indices: np.ndarray) -> "Dataset":
        return Dataset(
            arrays={k: v[indices] for k, v in self.arrays.items()},
            num_classes=self.num_classes,
            name=self.name,
            meta=dict(self.meta),
        )


def load_dataset(name: str, split: str = "train", data_dir: Optional[str] = None,
                 **kwargs) -> Dataset:
    return DATASETS.create(name, split=split, data_dir=data_dir, **kwargs)


# ---------------------------------------------------------------------------
# Synthetic learnable tasks (no-download stand-ins with real structure)
# ---------------------------------------------------------------------------


def _synthetic_images(num: int, shape, num_classes: int, seed: int,
                      split_seed: int, noise: float = 0.35):
    """Class-prototype images + Gaussian noise: learnable by a small CNN.

    Prototypes depend only on ``seed`` (shared across train/test splits);
    ``split_seed`` drives the per-split label draw and sample noise.
    """
    proto_rng = np.random.RandomState(seed + 1000)
    protos = proto_rng.rand(num_classes, *shape).astype(np.float32)
    rng = np.random.RandomState(split_seed)
    labels = rng.randint(0, num_classes, size=num).astype(np.int32)
    images = protos[labels] + noise * rng.randn(num, *shape).astype(np.float32)
    return images.astype(np.float32), labels


@DATASETS.register("synthetic", "synthetic_mnist")
def _synthetic_mnist(split: str = "train", data_dir=None, num_train: int = 4000,
                     num_test: int = 1000, num_classes: int = 10,
                     image_shape=(28, 28, 1), seed: int = 0, **_) -> Dataset:
    n = num_train if split == "train" else num_test
    images, labels = _synthetic_images(
        n, image_shape, num_classes, seed=seed,
        split_seed=seed + (0 if split == "train" else 1),
    )
    images = (images - MNIST_MEAN) / MNIST_STD
    return Dataset({"image": images, "label": labels}, num_classes,
                   name="synthetic", meta={"normalized": True})


@DATASETS.register("synthetic_cifar")
def _synthetic_cifar(split: str = "train", data_dir=None, num_train: int = 4000,
                     num_test: int = 1000, seed: int = 0, **_) -> Dataset:
    n = num_train if split == "train" else num_test
    images, labels = _synthetic_images(
        n, (32, 32, 3), 10, seed=seed,
        split_seed=seed + (0 if split == "train" else 1),
    )
    images = (images - CIFAR_MEAN) / CIFAR_STD
    return Dataset({"image": images, "label": labels}, 10, name="synthetic_cifar",
                   meta={"normalized": True})


@DATASETS.register("synthetic_multimodal")
def _synthetic_multimodal(split: str = "train", data_dir=None,
                          num_train: int = 2000, num_test: int = 500,
                          num_classes: int = 20, num_attributes: int = 312,
                          image_shape=(32, 32, 3), seed: int = 0, **_) -> Dataset:
    """Image + binary attribute vector task (CUB-200-shaped, smaller)."""
    n = num_train if split == "train" else num_test
    rng = np.random.RandomState(seed + (0 if split == "train" else 1))
    images, labels = _synthetic_images(
        n, image_shape, num_classes, seed=seed,
        split_seed=seed + (0 if split == "train" else 1),
    )
    # Class-conditional attribute prototypes, binarized with flip noise.
    proto_rng = np.random.RandomState(seed + 7)
    attr_protos = (proto_rng.rand(num_classes, num_attributes) > 0.7).astype(
        np.float32
    )
    flips = (rng.rand(n, num_attributes) < 0.05).astype(np.float32)
    attrs = np.abs(attr_protos[labels] - flips).astype(np.float32)
    return Dataset(
        {"image": images, "label": labels, "attributes": attrs},
        num_classes, name="synthetic_multimodal", meta={"normalized": False},
    )


@DATASETS.register("synthetic_avmnist")
def _synthetic_avmnist(split: str = "train", data_dir=None, num_train: int = 2000,
                       num_test: int = 500, seed: int = 0,
                       image_shape=(28, 28, 1), **_) -> Dataset:
    """Image + audio (mel-spectrogram-shaped [F=20, T=32, 1]) fusion task."""
    n = num_train if split == "train" else num_test
    s = seed + (0 if split == "train" else 1)
    images, labels = _synthetic_images(n, tuple(image_shape), 10, seed=seed,
                                       split_seed=s)
    proto_rng = np.random.RandomState(seed + 13)
    audio_protos = proto_rng.rand(10, 20, 32, 1).astype(np.float32)
    rng = np.random.RandomState(s + 17)
    audio = audio_protos[labels] + 0.35 * rng.randn(n, 20, 32, 1).astype(np.float32)
    images = (images - MNIST_MEAN) / MNIST_STD
    return Dataset(
        {"image": images, "audio": audio.astype(np.float32), "label": labels},
        10, name="synthetic_avmnist", meta={"normalized": True},
    )


@DATASETS.register("synthetic_clip")
def _synthetic_clip(split: str = "train", data_dir=None, num_train: int = 2000,
                    num_test: int = 500, num_classes: int = 10,
                    seq_len: int = 16, vocab_size: int = 1024,
                    seed: int = 0, **_) -> Dataset:
    """Image + token-sequence pairs for the CLIP-style classifier."""
    n = num_train if split == "train" else num_test
    s = seed + (0 if split == "train" else 1)
    images, labels = _synthetic_images(n, (32, 32, 3), num_classes,
                                       seed=seed, split_seed=s)
    # Class-conditional "caption": a bag of 6 class-specific tokens plus
    # random filler, with id 0 reserved for padding.
    proto_rng = np.random.RandomState(seed + 21)
    class_tokens = proto_rng.randint(1, vocab_size, size=(num_classes, 6))
    rng = np.random.RandomState(s + 23)
    text = np.zeros((n, seq_len), np.int32)
    text[:, :6] = class_tokens[labels]
    filler_len = max(seq_len - 8, 0)
    if filler_len:
        text[:, 6 : 6 + filler_len] = rng.randint(
            1, vocab_size, size=(n, filler_len)
        )
    return Dataset(
        {"image": images, "text": text, "label": labels}, num_classes,
        name="synthetic_clip", meta={"vocab_size": vocab_size},
    )


@DATASETS.register("synthetic_cremad")
def _synthetic_cremad(split: str = "train", data_dir=None, num_train: int = 1200,
                      num_test: int = 300, num_frames: int = 4,
                      seed: int = 0, **_) -> Dataset:
    """Audio (mel) + video (frame stack) emotion-shaped task, 6 classes."""
    n = num_train if split == "train" else num_test
    s = seed + (0 if split == "train" else 1)
    proto_rng = np.random.RandomState(seed + 31)
    audio_protos = proto_rng.rand(6, 20, 32, 1).astype(np.float32)
    video_protos = proto_rng.rand(6, num_frames, 16, 16, 1).astype(np.float32)
    rng = np.random.RandomState(s + 37)
    labels = rng.randint(0, 6, size=n).astype(np.int32)
    audio = audio_protos[labels] + 0.35 * rng.randn(n, 20, 32, 1)
    video = video_protos[labels] + 0.35 * rng.randn(n, num_frames, 16, 16, 1)
    return Dataset(
        {
            "audio": audio.astype(np.float32),
            "video": video.astype(np.float32),
            "label": labels,
        },
        6, name="synthetic_cremad", meta={},
    )


@DATASETS.register("digits")
def _sklearn_digits(split: str = "train", data_dir=None, seed: int = 0,
                    **_) -> Dataset:
    """Real handwritten digits (sklearn's bundled 8x8 UCI set, 1797 samples)
    — the only real image dataset available without network egress. Split
    80/20 deterministically; pixel range 0..16 scaled to 0..1 and normalized
    with its own mean/std."""
    from sklearn.datasets import load_digits

    digits = load_digits()
    x = (digits.images.astype(np.float32) / 16.0)[..., None]
    y = digits.target.astype(np.int32)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(y))
    cut = int(0.8 * len(y))
    idx = order[:cut] if split == "train" else order[cut:]
    # Normalization statistics from the TRAIN split only (computing them
    # over the full set would leak held-out statistics into training-time
    # preprocessing); both splits are standardized with the same values,
    # matching the fixed-constant convention of the mnist/cifar loaders.
    train_x = x[order[:cut]]
    mean, std = float(train_x.mean()), float(train_x.std() + 1e-8)
    x = (x - mean) / std
    return Dataset({"image": x[idx], "label": y[idx]}, 10, name="digits",
                   meta={"normalized": True})


# ---------------------------------------------------------------------------
# MNIST from local IDX files (reference: src/utils/data_loader.py:24-50)
# ---------------------------------------------------------------------------


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


@DATASETS.register("mnist")
def _mnist(split: str = "train", data_dir: Optional[str] = None, **_) -> Dataset:
    """MNIST from IDX files under ``data_dir`` (no network in this env).

    Accepts both raw and gzipped idx files with the standard names.
    """
    data_dir = data_dir or os.environ.get("MNIST_DIR", "data/mnist")
    prefix = "train" if split == "train" else "t10k"
    imgs = labels = None
    for ext in ("", ".gz"):
        ip = os.path.join(data_dir, f"{prefix}-images-idx3-ubyte{ext}")
        lp = os.path.join(data_dir, f"{prefix}-labels-idx1-ubyte{ext}")
        if os.path.exists(ip) and os.path.exists(lp):
            imgs, labels = _read_idx(ip), _read_idx(lp)
            break
    if imgs is None:
        raise FileNotFoundError(
            f"MNIST idx files not found under {data_dir}; this environment has "
            "no network egress — place the 4 idx(.gz) files there, or use "
            "dataset='synthetic' for a learnable stand-in with MNIST shapes."
        )
    images = imgs.astype(np.float32)[..., None] / 255.0
    images = (images - MNIST_MEAN) / MNIST_STD
    return Dataset({"image": images, "label": labels.astype(np.int32)}, 10,
                   name="mnist", meta={"normalized": True})


@DATASETS.register("cifar10")
def _cifar10(split: str = "train", data_dir: Optional[str] = None, **_) -> Dataset:
    """CIFAR-10 from the local python-pickle batches (cifar-10-batches-py)."""
    data_dir = data_dir or os.environ.get("CIFAR10_DIR", "data/cifar10")
    base = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(base):
        base = data_dir
    names = (
        [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
    )
    xs, ys = [], []
    for nm in names:
        path = os.path.join(base, nm)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"CIFAR-10 batch {path} missing (no network egress; use "
                "dataset='synthetic_cifar' as a stand-in)."
            )
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.append(np.asarray(d[b"labels"]))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    x = x.astype(np.float32) / 255.0
    x = (x - CIFAR_MEAN) / CIFAR_STD
    y = np.concatenate(ys).astype(np.int32)
    return Dataset({"image": x, "label": y}, 10, name="cifar10",
                   meta={"normalized": True})
