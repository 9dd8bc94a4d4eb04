"""Data layer tests (reference: tests/test_data.py): partition coverage and
disjointness, IID balance, Dirichlet heterogeneity, reproducibility, and
client stacking masks. Runs on the synthetic dataset (no downloads here)."""

import numpy as np
import pytest

from multimodal_fl_security_tpu.data.datasets import load_dataset
from multimodal_fl_security_tpu.data.partition import (
    analyze_partition,
    partition_data,
)
from multimodal_fl_security_tpu.data.stacking import stack_clients


@pytest.fixture(scope="module")
def labels():
    return load_dataset("synthetic", "train", num_train=4000).labels


def test_iid_disjoint_and_complete(labels):
    parts = partition_data(labels, 10, "iid")
    allidx = np.concatenate(parts)
    assert len(allidx) == len(labels)
    assert len(np.unique(allidx)) == len(labels)  # reference: :59-80


def test_iid_class_balance(labels):
    parts = partition_data(labels, 10, "iid")
    for p in parts:
        counts = np.bincount(labels[p], minlength=10)
        counts = counts[counts > 0]
        assert counts.max() / counts.min() < 2.5  # reference: :82-98


def test_dirichlet_low_alpha_is_heterogeneous(labels):
    iid_parts = partition_data(labels, 10, "iid")
    nid_parts = partition_data(labels, 10, "dirichlet", alpha=0.1)
    assert len(np.unique(np.concatenate(nid_parts))) == len(labels)

    def mean_emd(parts):
        return analyze_partition(labels, parts, 10)["mean_emd"]

    assert mean_emd(nid_parts) > 2 * mean_emd(iid_parts)  # reference: :112-134


def test_alpha_actually_changes_partition(labels):
    """Regression guard for the reference's alpha-never-plumbed bug
    (SURVEY.md §2.9-1)."""
    a01 = partition_data(labels, 10, "dirichlet", alpha=0.1)
    a50 = partition_data(labels, 10, "dirichlet", alpha=5.0)
    h01 = analyze_partition(labels, a01, 10)["mean_emd"]
    h50 = analyze_partition(labels, a50, 10)["mean_emd"]
    assert h01 > h50


def test_partition_reproducible(labels):
    p1 = partition_data(labels, 8, "dirichlet", alpha=0.5, seed=42)
    p2 = partition_data(labels, 8, "dirichlet", alpha=0.5, seed=42)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)  # reference: :136-141
    p3 = partition_data(labels, 8, "dirichlet", alpha=0.5, seed=7)
    assert any(len(a) != len(b) or (a != b).any() for a, b in zip(p1, p3))


def test_shard_partition_pathological(labels):
    parts = partition_data(labels, 10, "shard", shards_per_client=2)
    assert len(np.unique(np.concatenate(parts))) == len(labels)
    stats = analyze_partition(labels, parts, 10)
    # Most clients see few classes (2 shards => typically <= 3 classes).
    present = [c["num_classes_present"] for c in stats["clients"]]
    assert np.median(present) <= 3


def test_stacking_masks_and_counts(labels):
    ds = load_dataset("synthetic", "train", num_train=1000)
    parts = partition_data(ds.labels, 4, "dirichlet", alpha=0.3)
    cd = stack_clients(ds, parts, pad_multiple=32)
    assert cd.mask.shape[0] == 4
    assert cd.max_samples % 32 == 0
    np.testing.assert_array_equal(cd.counts, [len(p) for p in parts])
    # Mask sums equal true counts; padded slots zero.
    np.testing.assert_array_equal(cd.mask.sum(1).astype(int), cd.counts)
    for i, p in enumerate(parts):
        np.testing.assert_array_equal(
            cd.arrays["label"][i, : len(p)], ds.labels[p]
        )
        assert (cd.arrays["label"][i, len(p):] == 0).all()


def test_synthetic_train_test_share_structure():
    """Train and test must be the same task (prototypes shared across
    splits) or nothing is learnable."""
    tr = load_dataset("synthetic", "train", num_train=3000, seed=3)
    te = load_dataset("synthetic", "test", num_test=3000, seed=3)
    # Nearest-prototype structure: the per-class means must agree across
    # splits far better than means of different classes do.
    for c in range(3):
        mtr = tr.arrays["image"][tr.labels == c].mean(0)
        mte = te.arrays["image"][te.labels == c].mean(0)
        other = te.arrays["image"][te.labels == (c + 1) % 10].mean(0)
        same_gap = np.abs(mtr - mte).mean()
        cross_gap = np.abs(mtr - other).mean()
        assert same_gap < 0.5 * cross_gap, (same_gap, cross_gap)


def test_sklearn_digits_real_dataset():
    """Real handwritten digits (offline): loadable, split disjointly,
    learnable by the FL loop."""
    tr = load_dataset("digits", "train")
    te = load_dataset("digits", "test")
    assert tr.num_classes == 10
    assert len(tr) + len(te) == 1797
    assert tr.arrays["image"].shape[1:] == (8, 8, 1)

    from helpers import tiny_config
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    cfg = tiny_config("digits_fl", dataset="digits", num_rounds=3,
                      learning_rate=0.05, dataset_params={})
    res = run_simulation(cfg)
    assert res.final_accuracy > 0.5, res.round_accuracies


def test_on_device_augmentation():
    """flip/shift augmentation: shape-preserving, key-dependent, pure."""
    import jax
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.data.preprocess import (
        make_augment_fn,
        random_flip,
        random_shift,
    )

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    k = jax.random.PRNGKey(0)

    flipped = random_flip(k, imgs, p=1.0)
    np.testing.assert_allclose(np.asarray(flipped),
                               np.asarray(imgs)[:, :, ::-1, :])

    shifted = random_shift(k, imgs, max_shift=2)
    assert shifted.shape == imgs.shape
    # content preserved modulo shift: per-sample sums close (zero padding
    # enters at edges, so allow slack) and dtype stable.
    assert shifted.dtype == imgs.dtype

    fn = make_augment_fn("crop_flip")
    batch = {"image": imgs, "label": jnp.zeros((8,), jnp.int32)}
    out1 = fn(jax.random.PRNGKey(1), batch)
    out2 = fn(jax.random.PRNGKey(2), batch)
    assert out1["image"].shape == imgs.shape
    assert not np.allclose(np.asarray(out1["image"]),
                           np.asarray(out2["image"]))
    assert make_augment_fn("none") is None

    # And inside a jitted train step (engine wiring). Uses real digits:
    # the synthetic prototype task is pixel-precise (every pixel is class
    # identity), so any spatial augmentation acts as label noise there,
    # while real handwriting tolerates small shifts.
    from helpers import tiny_config
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    res = run_simulation(tiny_config("aug_fl", dataset="digits",
                                     num_rounds=3, learning_rate=0.05,
                                     augment="crop", dataset_params={}))
    assert res.final_accuracy > 0.4, res.round_accuracies


def test_random_resized_crop_and_erase():
    """rrc/erase augmentations: shape/dtype preserving, key-dependent,
    jit-safe; erase zeroes at most the configured fraction."""
    import jax
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.data.preprocess import (
        make_augment_fn,
        random_erase,
        random_resized_crop,
    )

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)

    out = jax.jit(random_resized_crop)(jax.random.PRNGKey(0), imgs)
    assert out.shape == imgs.shape and out.dtype == imgs.dtype
    assert not np.allclose(np.asarray(out), np.asarray(imgs))
    # identity when the crop is pinned to the full image
    ident = random_resized_crop(jax.random.PRNGKey(0), imgs,
                                min_scale=1.0, max_scale=1.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(imgs),
                               atol=1e-5)

    # Border-artifact property (ADVICE r4): every interpolation sample
    # must land inside the input pixel-center grid, so a constant image
    # comes back EXACTLY constant for any key/scale. Pre-clamp, a
    # border-touching crop mixed scale_and_translate's zero padding into
    # the first/last row/column (up to ~20% attenuation at min_scale).
    ones = jnp.ones((8, 17, 23, 2), jnp.float32)  # odd dims on purpose
    for seed in range(4):
        out1 = random_resized_crop(jax.random.PRNGKey(seed), ones,
                                   min_scale=0.35, max_scale=1.0)
        np.testing.assert_allclose(np.asarray(out1), 1.0, atol=1e-5,
                                   err_msg=f"border zero-mix, seed {seed}")

    er = jax.jit(lambda k, x: random_erase(k, x, frac=0.25, p=1.0))(
        jax.random.PRNGKey(3), imgs)
    assert er.shape == imgs.shape
    zeroed = np.asarray(er == 0).mean()
    assert 0.0 < zeroed <= 0.25 * 0.25 + 1e-6

    for mode in ("rrc_flip", "rrc_flip_erase"):
        fn = make_augment_fn(mode)
        b = fn(jax.random.PRNGKey(1), {"image": imgs})
        assert b["image"].shape == imgs.shape


def test_color_jitter_and_rotate():
    """Device-side ColorJitter / RandomRotation equivalents (reference:
    src/utils/cub200_loader.py:197-198) and the ref_cub composite mode."""
    import jax
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.data.datasets import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from multimodal_fl_security_tpu.data.preprocess import (
        color_jitter,
        make_augment_fn,
        random_rotate,
    )

    rng = np.random.RandomState(1)
    raw = jnp.asarray(rng.rand(4, 24, 24, 3), jnp.float32)
    m = np.asarray(IMAGENET_MEAN, np.float32).reshape(-1)
    s = np.asarray(IMAGENET_STD, np.float32).reshape(-1)

    # zero-strength jitter is the identity (raw and normalized space)
    ident = color_jitter(jax.random.PRNGKey(0), raw, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(raw), atol=1e-6)
    norm = (raw - m) / s
    ident_n = color_jitter(jax.random.PRNGKey(0), norm, 0.0, 0.0, 0.0,
                           mean=m, std=s)
    np.testing.assert_allclose(np.asarray(ident_n), np.asarray(norm),
                               atol=1e-5)

    # jittered raw output stays in [0, 1] (torchvision _blend clamps)
    out = jax.jit(color_jitter)(jax.random.PRNGKey(2), raw)
    o = np.asarray(out)
    assert o.min() >= -1e-6 and o.max() <= 1 + 1e-6
    assert not np.allclose(o, np.asarray(raw))

    # saturation keeps a gray image gray (R=G=B is a fixed point of the
    # gray-blend); brightness/contrast off to isolate it
    gray = jnp.broadcast_to(raw[..., :1], raw.shape)
    gout = np.asarray(color_jitter(jax.random.PRNGKey(3), gray,
                                   0.0, 0.0, 0.9))
    np.testing.assert_allclose(gout[..., 0], gout[..., 1], atol=1e-5)
    np.testing.assert_allclose(gout[..., 1], gout[..., 2], atol=1e-5)

    # max_deg=0 rotation is exact (integer-coordinate bilinear samples)
    r0 = random_rotate(jax.random.PRNGKey(4), raw, max_deg=0.0)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(raw), atol=1e-6)

    # raw-black normalized images are exactly the fill value, so any
    # rotation returns them unchanged (fill correctness at the corners)
    black = jnp.broadcast_to(jnp.asarray((0.0 - m) / s, jnp.float32),
                             (2, 16, 16, 3))
    rb = random_rotate(jax.random.PRNGKey(5), black, max_deg=15.0,
                       mean=m, std=s)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(black), atol=1e-5)

    # a real rotation moves pixels, preserves shape/dtype, and keeps the
    # center pixel (rotation fixed point) for every sample
    big = jnp.asarray(rng.rand(3, 25, 25, 3), jnp.float32)
    rr = jax.jit(lambda k, x: random_rotate(k, x, max_deg=15.0))(
        jax.random.PRNGKey(6), big)
    assert rr.shape == big.shape and rr.dtype == big.dtype
    assert not np.allclose(np.asarray(rr), np.asarray(big))
    np.testing.assert_allclose(np.asarray(rr)[:, 12, 12, :],
                               np.asarray(big)[:, 12, 12, :], atol=1e-4)

    # composite reference-recipe mode is jit-safe and shape-preserving
    fn = make_augment_fn("ref_cub")
    b = jax.jit(fn)(jax.random.PRNGKey(7), {"image": norm})
    assert b["image"].shape == norm.shape
    assert np.isfinite(np.asarray(b["image"])).all()
