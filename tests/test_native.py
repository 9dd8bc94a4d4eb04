"""Native (C++) data-path tests: correctness vs numpy fallbacks.

Skipped when libmft_native.so is not built (``make -C native``).
"""

import numpy as np
import pytest

from multimodal_fl_security_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libmft_native.so not built")


def test_gather_pad_matches_numpy(rng):
    src = rng.rand(50, 7, 3).astype(np.float32)
    idx = [np.array([0, 5, 10]), np.array([1]), np.arange(20, 30)]
    n_max = 12
    got = native.gather_pad(src, idx, n_max)
    expected = np.zeros((3, 12, 7, 3), np.float32)
    for i, ix in enumerate(idx):
        expected[i, : len(ix)] = src[ix]
    np.testing.assert_array_equal(got, expected)


def test_gather_pad_dtypes(rng):
    for dtype in (np.int32, np.uint8, np.float64):
        src = (rng.rand(20, 4) * 100).astype(dtype)
        got = native.gather_pad(src, [np.arange(10), np.arange(10, 20)], 10)
        np.testing.assert_array_equal(got[0], src[:10])
        np.testing.assert_array_equal(got[1], src[10:])


def test_gather_pad_large_threaded(rng):
    src = rng.rand(5000, 97).astype(np.float32)
    idx = [rng.choice(5000, size=rng.randint(100, 900), replace=False)
           for _ in range(16)]
    n_max = 1024
    got = native.gather_pad(src, idx, n_max, num_threads=8)
    for i, ix in enumerate(idx):
        np.testing.assert_array_equal(got[i, : len(ix)], src[ix])
        assert (got[i, len(ix):] == 0).all()


def test_dirichlet_assign_partitions_everything(rng):
    labels = rng.randint(0, 10, size=5000).astype(np.int32)
    assign = native.dirichlet_assign(labels, num_clients=8, alpha=0.3,
                                     seed=42)
    assert assign is not None
    assert assign.shape == (5000,)
    assert assign.min() >= 0 and assign.max() < 8
    # Deterministic per seed.
    assign2 = native.dirichlet_assign(labels, 8, 0.3, 42)
    np.testing.assert_array_equal(assign, assign2)
    # Low alpha is more heterogeneous than high alpha.
    def emd(a):
        total = np.bincount(labels, minlength=10) / len(labels)
        vals = []
        for c in range(8):
            m = a == c
            if m.sum() == 0:
                continue
            d = np.bincount(labels[m], minlength=10) / m.sum()
            vals.append(np.abs(d - total).sum() / 2)
        return np.mean(vals)

    het_low = emd(native.dirichlet_assign(labels, 8, 0.05, 1))
    het_high = emd(native.dirichlet_assign(labels, 8, 50.0, 1))
    assert het_low > 2 * het_high


def test_read_idx_roundtrip(tmp_path):
    # Write a tiny IDX3 file (2 images of 3x4 uint8).
    import struct

    data = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    path = tmp_path / "t-images-idx3-ubyte"
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3))
        f.write(struct.pack(">III", 2, 3, 4))
        f.write(data.tobytes())
    got = native.read_idx(str(path))
    np.testing.assert_array_equal(got, data)
