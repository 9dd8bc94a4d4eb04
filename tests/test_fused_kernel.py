"""Fused megakernel: consolidation-op and interpret-mode equivalence.

Two hops (CPU, no TPU needed): the kernel's roll/mask/selector
consolidation ops equal the vjp-derived fold/consolidate of
ops/fused_train.py on raw cotangents; and the WHOLE kernel — run
through the Pallas interpreter — equals the mirror training loop
(itself proven equal to the flax/optax engine path in
tests/test_fused_train.py). The real-TPU kernel-vs-mirror run lives in
benchmarks/fused_kernel_bench.py (the interpreter does not exercise
Mosaic lowering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.models.simple_cnn import SimpleCNN
from multimodal_fl_security_tpu.ops import fused_kernel as fk
from multimodal_fl_security_tpu.ops import fused_train as ft
from multimodal_fl_security_tpu.ops.s2d import space_to_depth


@pytest.fixture(scope="module")
def setup():
    model = SimpleCNN(num_classes=10, dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(1), (32, 28, 28, 8))
    blocks = space_to_depth(img)
    params = model.init(jax.random.PRNGKey(0), {"image_s2d": blocks})["params"]
    return model, blocks, params


def _raw_cotangent(params, blocks, key):
    """A real raw packed cotangent (from AD of the packed loss)."""
    labels = jax.random.randint(key, (32,), 0, 10)
    onehot = jax.nn.one_hot(labels, 128)
    bmask = jnp.ones((32,))

    def loss(pk):
        return ft.packed_ce(ft.mirror_forward(pk, ft.pack_blocks(blocks)),
                            onehot, bmask)

    return jax.grad(loss)(ft.pack_params(params))


def test_selector_consolidation_equals_vjp(setup):
    """Every kernel consolidation op == the vjp-derived P P^T on a real
    raw cotangent: the selector/butterfly algebra is the fold."""
    _, blocks, params = setup
    g_raw = _raw_cotangent(params, blocks, jax.random.PRNGKey(5))
    ref = jax.jit(lambda g: ft.consolidate_grads(g, params))(g_raw)
    e = jnp.asarray(fk.build_stem_selectors(8))
    roll = fk._jnp_roll

    got = {
        "w_stem": fk.embed_stem(fk.fold_stem(g_raw["w_stem"], e, roll),
                                e, roll),
        "b_stem": fk.lane_group_sum(g_raw["b_stem"], 32, roll),
        "w_cv2": fk.embed_cv2(fk.consolidate_cv2(g_raw["w_cv2"], roll),
                              roll),
        "b_cv2": fk.lane_group_sum(g_raw["b_cv2"], 64, roll),
        "w_fc1": g_raw["w_fc1"] * jnp.asarray(fk._fc1_keep_mask()),
        "b_fc1": g_raw["b_fc1"],
        "w_fc2": jnp.where(jnp.arange(128)[None, :] < 10,
                           g_raw["w_fc2"], 0.0),
        "b_fc2": jnp.where(jnp.arange(128)[None, :] < 10,
                           g_raw["b_fc2"], 0.0),
    }
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_fold_stem_equals_vjp_fold(setup):
    """fold_stem's logical tile == fold_grads' flax kernel gradient."""
    _, blocks, params = setup
    g_raw = _raw_cotangent(params, blocks, jax.random.PRNGKey(6))
    ref = ft.fold_grads(g_raw, params)["ConvPoolFused_0"]["kernel"]
    e = jnp.asarray(fk.build_stem_selectors(8))
    kl = fk.fold_stem(g_raw["w_stem"], e, fk._jnp_roll)
    got = kl[:72, :32].reshape(3, 3, 8, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)
    # unused tile slots must be exactly zero
    assert float(jnp.max(jnp.abs(kl[72:]))) == 0.0
    assert float(jnp.max(jnp.abs(kl[:, 32:]))) == 0.0


def test_kernel_interpret_nonremat_equals_mirror(setup):
    """The SHIPPED AD spelling (no jax.checkpoint — what the compiled
    Mosaic path runs) through the interpreter == mirror_local_train.
    The default interpret run remats; without this test a graph-level
    regression in the non-remat spelling would only be caught by the
    manual on-chip --check (ADVICE r4)."""
    model, _, params = setup
    key = jax.random.PRNGKey(13)
    C, n = 1, 32
    img = jax.random.normal(key, (C, n, 28, 28, 8))
    blocks = space_to_depth(img)
    xp = ft.pack_blocks(blocks)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (C, n), 0, 10)
    bmask = jnp.ones((C, n))

    out = fk.fused_local_train(
        params, xp, labels, bmask,
        learning_rate=0.05, momentum=0.9, clip_norm=1.0, local_epochs=1,
        compute_dtype=jnp.float32, interpret=True, remat=False)

    ref = ft.mirror_local_train(
        params, xp[0], jax.nn.one_hot(labels[0], 128), bmask[0],
        lr=0.05, momentum=0.9, clip_norm=1.0, local_epochs=1)
    got = jax.tree_util.tree_map(lambda x: x[0], out)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(got)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=str(ka))


def test_kernel_interpret_equals_mirror(setup):
    """The full pallas kernel (interpret mode) == mirror_local_train
    per client — same multi-step SGD trajectory, both clients."""
    model, _, params = setup
    key = jax.random.PRNGKey(11)
    C, n = 2, 64
    img = jax.random.normal(key, (C, n, 28, 28, 8))
    blocks = space_to_depth(img)
    xp = ft.pack_blocks(blocks)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (C, n), 0, 10)
    bmask = jnp.ones((C, n)).at[:, -8:].set(0.0)

    out = fk.fused_local_train(
        params, xp, labels, bmask,
        learning_rate=0.05, momentum=0.9, clip_norm=1.0, local_epochs=2,
        compute_dtype=jnp.float32, interpret=True)

    for c in range(C):
        ref = ft.mirror_local_train(
            params, xp[c], jax.nn.one_hot(labels[c], 128), bmask[c],
            lr=0.05, momentum=0.9, clip_norm=1.0, local_epochs=2)
        got = jax.tree_util.tree_map(lambda x, _c=c: x[_c], out)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(ref),
                jax.tree_util.tree_leaves_with_path(got)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"client {c} {ka}")
