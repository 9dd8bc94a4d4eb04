"""Space-to-depth stem layout (ops/s2d.py, data/stacking.py::to_s2d_layout).

The s2d path must be numerically the conv path: same scalar products,
regrouped by layout. Model-apply equality is exact in f32; a full SGD
round accumulates fp-reordering drift, bounded loosely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.data.stacking import (
    ClientData,
    make_batch_adapter,
    to_flat_layout,
    to_s2d_layout,
)
from multimodal_fl_security_tpu.models import create_model, init_model
from multimodal_fl_security_tpu.models.simple_cnn import SimpleCNN
from multimodal_fl_security_tpu.ops.s2d import (
    s2d_block_shape,
    s2d_stem_conv,
    space_to_depth,
)
from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec


@pytest.fixture
def image_batch(rng):
    return rng.normal(0, 1, (4, 28, 28, 8)).astype(np.float32)


def test_space_to_depth_block_semantics(rng):
    x = rng.normal(0, 1, (2, 6, 6, 3)).astype(np.float32)
    xb = space_to_depth(x)
    assert xb.shape == (2,) + s2d_block_shape((6, 6, 3))
    xpad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for bi, bj, r, c in [(0, 0, 0, 0), (1, 2, 1, 0), (3, 3, 1, 1)]:
        np.testing.assert_array_equal(
            xb[:, bi, bj, (r * 2 + c) * 3 : (r * 2 + c + 1) * 3],
            xpad[:, 2 * bi + r, 2 * bj + c, :],
        )


def test_space_to_depth_numpy_matches_jnp(image_batch):
    got_np = space_to_depth(image_batch)
    got_j = np.asarray(space_to_depth(jnp.asarray(image_batch)))
    np.testing.assert_array_equal(got_np, got_j)


def test_s2d_stem_matches_conv(image_batch, rng):
    w4 = rng.normal(0, 0.1, (4, 4, 8, 128)).astype(np.float32)
    y_conv = jax.lax.conv_general_dilated(
        jnp.asarray(image_batch), jnp.asarray(w4), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y_s2d = s2d_stem_conv(space_to_depth(jnp.asarray(image_batch)),
                          jnp.asarray(w4))
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_conv),
                               rtol=1e-5, atol=1e-5)


def test_model_logits_identical_across_layouts(image_batch):
    model = SimpleCNN(num_classes=10)
    params = model.init(jax.random.PRNGKey(1), {"image": image_batch})["params"]
    l_img = model.apply({"params": params}, {"image": image_batch})
    l_s2d = model.apply(
        {"params": params}, {"image_s2d": space_to_depth(image_batch)}
    )
    np.testing.assert_allclose(np.asarray(l_s2d), np.asarray(l_img),
                               rtol=1e-5, atol=1e-5)


def test_to_s2d_layout_from_nhwc_and_flat(rng):
    imgs = rng.normal(0, 1, (3, 8, 28, 28, 8)).astype(np.float32)
    labels = rng.randint(0, 10, (3, 8)).astype(np.int32)
    cd = ClientData(
        arrays={"image": imgs, "label": labels},
        mask=np.ones((3, 8), np.float32),
        counts=np.full((3,), 8, np.int32),
        num_classes=10,
    )
    for source in (cd, to_flat_layout(cd)):
        out = to_s2d_layout(source)
        assert "image" not in out.arrays
        assert out.feature_shapes["image_s2d"] == (15, 15, 32)
        # flat 128-aligned: 15*15*32 = 7200 -> 7296
        assert out.arrays["image_s2d"].shape == (3, 8, 7296)
        adapted = make_batch_adapter(out.feature_shapes)(
            {k: v[0] for k, v in out.arrays.items()}
        )
        np.testing.assert_allclose(
            adapted["image_s2d"], space_to_depth(imgs[0]), rtol=1e-6, atol=1e-6
        )


def test_engine_round_equivalent_across_layouts(rng):
    c, n, b = 4, 32, 8
    imgs = rng.normal(0, 1, (c, n, 28, 28, 8)).astype(np.float32)
    labels = rng.randint(0, 10, (c, n)).astype(np.int32)
    cd = ClientData(
        arrays={"image": imgs, "label": labels},
        mask=np.ones((c, n), np.float32),
        counts=np.full((c,), n, np.int32),
        num_classes=10,
    )
    cd_flat, cd_s2d = to_flat_layout(cd), to_s2d_layout(cd)
    model = create_model("simple_cnn", num_classes=10)
    sample = make_batch_adapter(cd_flat.feature_shapes)(
        {k: v[0, :b] for k, v in cd_flat.arrays.items()}
    )
    params = init_model(model, sample, seed=0)["params"]
    spec = TrainSpec(learning_rate=0.05, batch_size=b, local_epochs=1)
    p1, m1 = RoundEngine(model, cd_flat, spec).run_round(
        params, jax.random.PRNGKey(3))
    p2, m2 = RoundEngine(model, cd_s2d, spec).run_round(
        params, jax.random.PRNGKey(3))
    diffs = jax.tree_util.tree_map(
        lambda a, b_: float(jnp.max(jnp.abs(a - b_))), p1, p2)
    assert max(jax.tree_util.tree_leaves(diffs)) < 3e-4
    assert abs(float(m1["client_loss_mean"]) -
               float(m2["client_loss_mean"])) < 1e-2


def test_runner_s2d_layout_end_to_end():
    import multimodal_fl_security_tpu as mft

    base = dict(
        dataset="synthetic", num_clients=4, num_rounds=2, local_epochs=1,
        learning_rate=0.05, batch_size=16,
        dataset_params={"num_train": 400, "num_test": 200}, seed=7,
    )
    res_flat = mft.run_simulation(
        mft.ExperimentConfig(name="s2d_flat", resident_layout="flat", **base))
    res_s2d = mft.run_simulation(
        mft.ExperimentConfig(name="s2d_s2d", resident_layout="s2d", **base))
    # Same partition/seeds; only the stem's fp summation order differs, so
    # the two layouts must track each other round by round (measured
    # identical to 3 decimals at this scale).
    for a_flat, a_s2d in zip(res_flat.round_accuracies,
                             res_s2d.round_accuracies):
        assert abs(a_flat - a_s2d) < 0.03


def test_runner_s2d_guards():
    import multimodal_fl_security_tpu as mft
    import pytest as _pytest

    with _pytest.raises(ValueError, match="simple_cnn-family"):
        mft.run_simulation(mft.ExperimentConfig(
            name="g1", dataset="synthetic_cifar", resident_layout="s2d",
            num_clients=2, num_rounds=1,
            dataset_params={"num_train": 64, "num_test": 32}))
    with _pytest.raises(ValueError, match="augmentation"):
        mft.run_simulation(mft.ExperimentConfig(
            name="g2", dataset="synthetic", resident_layout="s2d",
            augment="flip", num_clients=2, num_rounds=1,
            dataset_params={"num_train": 64, "num_test": 32}))
