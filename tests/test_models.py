"""Model unit tests (reference: tests/test_models.py): output shapes,
class-count variants, parameter budgets, multimodal fwd with/without
attributes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.models import create_model, init_model
from multimodal_fl_security_tpu.models.registry import param_count


def img_batch(b=4, shape=(28, 28, 1)):
    return {
        "image": jnp.asarray(np.random.RandomState(0).rand(b, *shape),
                             jnp.float32),
        "label": jnp.zeros((b,), jnp.int32),
    }


def test_simple_cnn_output_shape():
    model = create_model("simple_cnn", num_classes=10)
    batch = img_batch()
    vs = init_model(model, batch)
    out = model.apply(vs, batch, train=False)
    assert out.shape == (4, 10)
    assert jnp.isfinite(out).all()


@pytest.mark.parametrize("nc", [2, 10, 47])
def test_simple_cnn_class_variants(nc):
    model = create_model("simple_cnn", num_classes=nc)
    batch = img_batch()
    vs = init_model(model, batch)
    assert model.apply(vs, batch, train=False).shape == (4, nc)


def test_simple_cnn_param_budget():
    """~1.2M params at 28x28x1 (reference: simple_cnn.py:24, test bound
    100k..2M at tests/test_models.py:63-78)."""
    model = create_model("simple_cnn", num_classes=10)
    vs = init_model(model, img_batch())
    n = param_count(vs)
    assert 100_000 < n < 2_000_000, n


def test_cifar_cnn_shape():
    model = create_model("cifar_cnn", num_classes=10)
    batch = img_batch(shape=(32, 32, 3))
    vs = init_model(model, batch)
    assert model.apply(vs, batch, train=False).shape == (4, 10)


def test_multimodal_with_and_without_attributes():
    model = create_model("multimodal_cnn", num_classes=20, num_attributes=312)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
        "attributes": jnp.asarray(rng.rand(4, 312), jnp.float32),
        "label": jnp.zeros((4,), jnp.int32),
    }
    vs = init_model(model, batch)
    out_full = model.apply(vs, batch, train=False)
    assert out_full.shape == (4, 20)

    # Without attributes: same parameter structure, still works
    # (reference zero-pads, cub200_cnn.py:104-108).
    no_attr = {k: v for k, v in batch.items() if k != "attributes"}
    out_img = model.apply(vs, no_attr, train=False)
    assert out_img.shape == (4, 20)
    assert not np.allclose(np.asarray(out_full), np.asarray(out_img))

    # attr_present mask zeroes the attribute contribution.
    masked = dict(batch, attr_present=jnp.zeros((4,), jnp.float32))
    out_masked = model.apply(vs, masked, train=False)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_img), rtol=1e-5, atol=1e-5
    )


def test_dropout_only_active_in_train_mode():
    model = create_model("simple_cnn", num_classes=10)
    batch = img_batch()
    vs = init_model(model, batch)
    e1 = model.apply(vs, batch, train=False)
    e2 = model.apply(vs, batch, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = model.apply(vs, batch, train=True,
                     rngs={"dropout": jax.random.PRNGKey(0)})
    t2 = model.apply(vs, batch, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_get_set_weights_roundtrip():
    """numpy weight-exchange round trip (reference: test_models.py:40-55)."""
    from multimodal_fl_security_tpu.models.registry import (
        get_weights,
        set_weights,
    )

    model = create_model("simple_cnn", num_classes=10)
    batch = img_batch()
    params = init_model(model, batch)["params"]
    weights = get_weights(params)
    assert all(hasattr(w, "shape") for w in weights)
    perturbed = [w + 1.0 for w in weights]
    restored = set_weights(params, perturbed)
    out = get_weights(restored)
    for a, b in zip(out, perturbed):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_fused_stem_matches_unfused_exactly():
    """ConvPoolFused is a pure re-tiling of conv+relu+pool: identical
    params, identical outputs (same dot products, f32)."""
    import jax
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.models.simple_cnn import SimpleCNN

    x = {"image": jnp.asarray(
        np.random.RandomState(0).randn(4, 28, 28, 1).astype(np.float32))}
    fused = SimpleCNN(num_classes=10, fused_stem=True)
    plain = SimpleCNN(num_classes=10, fused_stem=False)
    params = fused.init(jax.random.PRNGKey(0), x)["params"]
    # Same parameter shapes -> rename the stem module to feed the plain one.
    plain_params = dict(params)
    plain_params["Conv_1"] = plain_params.pop("Conv_0")
    plain_params["Conv_0"] = plain_params.pop("ConvPoolFused_0")
    yf = fused.apply({"params": params}, x)
    yp = plain.apply({"params": plain_params}, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-5, atol=1e-5)

    # Odd spatial dims keep exactness (VALID pool drops the last row/col).
    x13 = {"image": jnp.asarray(
        np.random.RandomState(1).randn(2, 13, 13, 1).astype(np.float32))}
    p13 = fused.init(jax.random.PRNGKey(1), x13)["params"]
    pp13 = dict(p13)
    pp13["Conv_1"] = pp13.pop("Conv_0")
    pp13["Conv_0"] = pp13.pop("ConvPoolFused_0")
    np.testing.assert_allclose(
        np.asarray(fused.apply({"params": p13}, x13)),
        np.asarray(plain.apply({"params": pp13}, x13)),
        rtol=1e-5, atol=1e-5)


# ------------------------------------------------------- norm="batch" ---
def test_resnet_frozen_batchnorm_reference_compat_mode():
    """norm="batch" is the reference-compat mode: BatchNorm with stats
    frozen at init (the reference simulation never aggregates BN buffers,
    SURVEY.md 2.9-4), i.e. a learnable per-channel affine. It must be a
    pure function of params (no mutable collections) and train under the
    engine's client vmap."""
    import jax
    from multimodal_fl_security_tpu.data.datasets import Dataset
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    rng = np.random.default_rng(0)
    model = create_model("resnet18", num_classes=4, norm="batch")
    sample = {"image": rng.normal(0, 1, (4, 16, 16, 3)).astype(np.float32),
              "label": np.zeros(4, np.int32)}
    variables = init_model(model, sample, seed=0)
    assert set(variables.keys()) == {"params"}, (
        "frozen-BN mode must not create mutable collections"
    )
    params = variables["params"]
    flat_names = jax.tree_util.tree_flatten_with_path(params)[0]
    joined = ["/".join(str(k) for k in kp) for kp, _ in flat_names]
    assert any("FrozenBatchNorm" in n for n in joined)

    n, c = 16, 2
    ds = Dataset(
        {"image": rng.normal(0, 1, (c * n, 16, 16, 3)).astype(np.float32),
         "label": rng.integers(0, 4, c * n).astype(np.int32)}, 4)
    idx = [np.arange(i * n, (i + 1) * n) for i in range(c)]
    cd = stack_clients(ds, idx, pad_multiple=8, layout="flat")
    engine = RoundEngine(model, cd,
                         TrainSpec(learning_rate=0.01, batch_size=8,
                                   local_epochs=1))
    new_params, metrics = engine.run_round(params, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["client_loss_mean"]))


def test_resnet_rejects_unknown_norm():
    import pytest as _pytest
    from multimodal_fl_security_tpu.models import create_model, init_model

    model = create_model("resnet18", num_classes=4, norm="layer")
    sample = {"image": np.zeros((2, 16, 16, 3), np.float32),
              "label": np.zeros(2, np.int32)}
    with _pytest.raises(ValueError, match="norm"):
        init_model(model, sample, seed=0)
