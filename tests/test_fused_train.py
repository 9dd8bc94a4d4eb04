"""Fused local-training megakernel: layout + mirror equivalence tests.

The Pallas kernel (ops/fused_train.py) is verified in two hops:
CPU tests here prove the packed-layout algebra (parameter embedding,
shift/mask convolution taps, pool compaction, fc1 packing) equals the
flax SimpleCNN; a TPU-marked test proves the kernel equals the mirror.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.models.simple_cnn import SimpleCNN
from multimodal_fl_security_tpu.ops import fused_train as ft
from multimodal_fl_security_tpu.ops.s2d import space_to_depth


@pytest.fixture(scope="module")
def setup():
    model = SimpleCNN(num_classes=10, dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(1), (32, 28, 28, 8))
    blocks = space_to_depth(img)
    params = model.init(jax.random.PRNGKey(0), {"image_s2d": blocks})["params"]
    return model, blocks, params


def test_param_pack_roundtrip(setup):
    _, _, params = setup
    packed = jax.jit(ft.pack_params)(params)
    assert packed["w_stem"].shape == (4, 512, 128)
    assert packed["w_cv2"].shape == (9, 128, 256)
    assert packed["w_fc1"].shape == (28, 128, 128)
    rt = jax.jit(lambda p: ft.unpack_params(p, params))(packed)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_block_pack_roundtrip():
    xb = jax.random.normal(jax.random.PRNGKey(2), (3, 15, 15, 32))
    packed = ft.pack_blocks(xb)
    assert packed.shape == (3, 60, 128)
    np.testing.assert_allclose(
        np.asarray(ft.unpack_blocks(packed)), np.asarray(xb))


def test_mirror_forward_equals_flax(setup):
    model, blocks, params = setup
    ref = model.apply({"params": params}, {"image_s2d": blocks}, train=False)
    pk = jax.jit(ft.pack_params)(params)
    out = jax.jit(ft.mirror_forward)(pk, ft.pack_blocks(blocks))
    np.testing.assert_allclose(
        np.asarray(out)[:, :10], np.asarray(ref), rtol=1e-4, atol=1e-5)
    # padded logit lanes must not blow up (fc2 columns >= 10 are zero)
    assert float(jnp.max(jnp.abs(out[:, 10:]))) < 1e-5


def test_mirror_grads_equal_flax(setup):
    """AD through pack_params + mirror_forward == AD through the flax
    model — validates that gradient consolidation across the embedded
    weight copies (what the kernel does by hand) is the true gradient."""
    model, blocks, params = setup
    labels = jax.random.randint(jax.random.PRNGKey(3), (32,), 0, 10)

    def ce(logits):
        logp = jax.nn.log_softmax(logits[:, :10].astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    def loss_flax(p):
        return ce(model.apply({"params": p}, {"image_s2d": blocks},
                              train=False))

    def loss_mirror(p):
        return ce(ft.mirror_forward(ft.pack_params(p), ft.pack_blocks(blocks)))

    g_ref = jax.jit(jax.grad(loss_flax))(params)
    g_out = jax.jit(jax.grad(loss_mirror))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
