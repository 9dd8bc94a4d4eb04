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
