"""CUB-200 loader tests against the real dataset (skipped if absent)."""

import os

import numpy as np
import pytest

from multimodal_fl_security_tpu.data.cub200 import _find_root

try:
    CUB_ROOT = _find_root(None)
    HAS_CUB = True
except FileNotFoundError:
    HAS_CUB = False

pytestmark = pytest.mark.skipif(not HAS_CUB, reason="CUB_200_2011 not found")


def test_cub200_loads_images_and_attributes():
    from multimodal_fl_security_tpu.data.datasets import load_dataset

    ds = load_dataset("cub200", "train", image_size=32, max_samples=60)
    assert ds.arrays["image"].shape == (60, 32, 32, 3)
    assert ds.arrays["attributes"].shape == (60, 312)
    assert set(np.unique(ds.arrays["attributes"])) <= {0.0, 1.0}
    assert ds.num_classes == 200
    # ImageNet-normalized values live in a plausible range.
    assert -3 < ds.arrays["image"].mean() < 3


def test_cub200_split_disjoint():
    from multimodal_fl_security_tpu.data.datasets import load_dataset

    tr = load_dataset("cub200", "train", image_size=16, max_samples=40)
    te = load_dataset("cub200", "test", image_size=16, max_samples=40)
    assert len(tr) == 40 and len(te) == 40
    # Same class space, different images (trivially: different means).
    assert not np.allclose(tr.arrays["image"][0], te.arrays["image"][0])


def test_cub200_fl_smoke():
    """One FL round on real CUB images with the multimodal fusion model."""
    from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    cfg = ExperimentConfig(
        name="cub_smoke", dataset="cub200", model="multimodal_cnn",
        num_clients=3, num_rounds=1, local_epochs=1, batch_size=8,
        learning_rate=0.01, eval_batch_size=32,
        dataset_params={"image_size": 32, "max_samples": 120},
    )
    res = run_simulation(cfg)
    assert np.isfinite(res.final_loss)
    assert 0.0 <= res.final_accuracy <= 1.0


def test_cub200_attribute_corruption():
    """attr_noise/attr_dropout (VERDICT r3 #4): deterministic per-image
    corruption breaks the per-class-identical attribute signature."""
    from multimodal_fl_security_tpu.data.datasets import load_dataset

    clean = load_dataset("cub200", "train", image_size=16, max_samples=40)
    noisy = load_dataset("cub200", "train", image_size=16, max_samples=40,
                         attr_noise=0.1, attr_dropout=0.1, attr_seed=7)
    a0, a1 = clean.arrays["attributes"], noisy.arrays["attributes"]
    assert a0.shape == a1.shape
    flipped = float((a0 != a1).mean())
    # ~10% flip + ~10% dropout of remaining ones
    assert 0.05 < flipped < 0.3, flipped
    # deterministic: same seed -> same corruption
    again = load_dataset("cub200", "train", image_size=16, max_samples=40,
                         attr_noise=0.1, attr_dropout=0.1, attr_seed=7)
    np.testing.assert_array_equal(a1, again.arrays["attributes"])
    # different seed -> different corruption
    other = load_dataset("cub200", "train", image_size=16, max_samples=40,
                         attr_noise=0.1, attr_dropout=0.1, attr_seed=8)
    assert (a1 != other.arrays["attributes"]).any()
    # images within one class now differ in attributes (headroom restored)
    labs = noisy.arrays["label"]
    for c in np.unique(labs):
        idx = np.nonzero(labs == c)[0]
        if len(idx) >= 2:
            assert not np.array_equal(a1[idx[0]], a1[idx[1]])
            break
