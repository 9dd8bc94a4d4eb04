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
