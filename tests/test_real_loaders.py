"""Exercise the real-dataset loaders (mnist IDX, cifar10 pickle batches)
against fabricated on-disk files, so that dropping real files into
MNIST_DIR/CIFAR10_DIR is a config change, not a debugging session.

The reference loads MNIST via torchvision (reference:
src/utils/data_loader.py:24-50); here the IDX/pickle formats are parsed
directly, so the parsers themselves are what these tests pin down.
"""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from multimodal_fl_security_tpu.data.datasets import (
    CIFAR_MEAN,
    CIFAR_STD,
    MNIST_MEAN,
    MNIST_STD,
    load_dataset,
)
from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def _write_idx(path: str, arr: np.ndarray, gz: bool = False) -> None:
    """Serialize a uint8 array in the standard IDX format."""
    dtype_code = 0x08  # unsigned byte
    header = struct.pack(">HBB", 0, dtype_code, arr.ndim)
    header += struct.pack(">" + "I" * arr.ndim, *arr.shape)
    payload = header + arr.astype(np.uint8).tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


def _fabricate_mnist(dirpath: str, n_train: int = 40, n_test: int = 20,
                     gz: bool = False) -> dict:
    rng = np.random.RandomState(0)
    ext = ".gz" if gz else ""
    data = {}
    for prefix, n in (("train", n_train), ("t10k", n_test)):
        imgs = rng.randint(0, 256, size=(n, 28, 28), dtype=np.uint8)
        labels = (np.arange(n) % 10).astype(np.uint8)
        _write_idx(os.path.join(
            dirpath, f"{prefix}-images-idx3-ubyte{ext}"), imgs, gz)
        _write_idx(os.path.join(
            dirpath, f"{prefix}-labels-idx1-ubyte{ext}"), labels, gz)
        data[prefix] = (imgs, labels)
    return data


def _fabricate_cifar10(dirpath: str, per_batch: int = 8) -> dict:
    base = os.path.join(dirpath, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(1)
    data = {}
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        raw = rng.randint(0, 256, size=(per_batch, 3 * 32 * 32),
                          dtype=np.uint8)
        labels = [int(i % 10) for i in range(per_batch)]
        with open(os.path.join(base, name), "wb") as f:
            pickle.dump({b"data": raw, b"labels": labels}, f)
        data[name] = (raw, labels)
    return data


# ---------------------------------------------------------------------------
# MNIST
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gz", [False, True], ids=["raw", "gzip"])
def test_mnist_idx_round_trip(tmp_path, gz):
    fab = _fabricate_mnist(str(tmp_path), gz=gz)
    train = load_dataset("mnist", "train", data_dir=str(tmp_path))
    test = load_dataset("mnist", "test", data_dir=str(tmp_path))

    assert train.arrays["image"].shape == (40, 28, 28, 1)
    assert test.arrays["image"].shape == (20, 28, 28, 1)
    assert train.num_classes == 10
    np.testing.assert_array_equal(train.labels, fab["train"][1])
    np.testing.assert_array_equal(test.labels, fab["t10k"][1])

    # Pixel pipeline: uint8 -> /255 -> (x - mean)/std, exact round trip.
    expect = (fab["train"][0].astype(np.float32)[..., None] / 255.0
              - MNIST_MEAN) / MNIST_STD
    np.testing.assert_allclose(train.arrays["image"], expect, rtol=1e-6)


def test_mnist_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_dataset("mnist", "train", data_dir=str(tmp_path / "nope"))


def test_mnist_full_pipeline_one_round(tmp_path):
    """load_dataset('mnist') -> partition -> engine round through the public
    runner, on fabricated files: the path that breaks first if real files
    ever appear in MNIST_DIR."""
    _fabricate_mnist(str(tmp_path), n_train=80, n_test=20)
    cfg = ExperimentConfig(
        name="mnist_fab", dataset="mnist", data_dir=str(tmp_path),
        num_clients=4, num_rounds=1, local_epochs=1, batch_size=10,
        eval_batch_size=20, learning_rate=0.01, seed=0,
    )
    res = run_simulation(cfg)
    assert len(res.round_accuracies) == 1
    assert np.isfinite(res.final_loss)


# ---------------------------------------------------------------------------
# CIFAR-10
# ---------------------------------------------------------------------------


def test_cifar10_pickle_round_trip(tmp_path):
    fab = _fabricate_cifar10(str(tmp_path))
    train = load_dataset("cifar10", "train", data_dir=str(tmp_path))
    test = load_dataset("cifar10", "test", data_dir=str(tmp_path))

    assert train.arrays["image"].shape == (40, 32, 32, 3)  # 5 batches x 8
    assert test.arrays["image"].shape == (8, 32, 32, 3)
    # Labels concatenate in batch order.
    expect_labels = np.concatenate(
        [fab[f"data_batch_{i}"][1] for i in range(1, 6)]).astype(np.int32)
    np.testing.assert_array_equal(train.labels, expect_labels)

    # CHW -> HWC transpose + normalization, exact on batch 1 sample 0.
    raw0 = fab["data_batch_1"][0][0].reshape(3, 32, 32).transpose(1, 2, 0)
    expect0 = (raw0.astype(np.float32) / 255.0 - CIFAR_MEAN) / CIFAR_STD
    np.testing.assert_allclose(train.arrays["image"][0], expect0, rtol=1e-6)


def test_cifar10_missing_batch_raises(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    with pytest.raises(FileNotFoundError):
        load_dataset("cifar10", "train", data_dir=str(tmp_path))
