"""Pallas kernel correctness vs jnp references (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.ops.pallas_kernels import (
    gram_pallas,
    pairwise_sq_dists_pallas,
    sorted_reduce_pallas,
)
from multimodal_fl_security_tpu.ops.reductions import coordinate_median


@pytest.fixture
def updates(rng):
    return jnp.asarray(rng.normal(0, 1, size=(10, 300)).astype(np.float32))


def test_gram_matches_reference(updates):
    g = gram_pallas(updates, block_d=128, interpret=True)
    centered = np.asarray(updates) - np.asarray(updates).mean(0)
    expected = centered @ centered.T
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4, atol=1e-4)


def test_pairwise_sq_dists_matches_direct(updates):
    d2 = pairwise_sq_dists_pallas(updates, block_d=128, interpret=True)
    u = np.asarray(updates)
    expected = ((u[:, None] - u[None, :]) ** 2).sum(-1)
    np.fill_diagonal(expected, 0)
    np.testing.assert_allclose(np.asarray(d2), expected, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("c", [5, 8, 10, 16])
def test_sorted_reduce_median(rng, c):
    u = jnp.asarray(rng.normal(0, 5, size=(c, 200)).astype(np.float32))
    got = sorted_reduce_pallas(u, mode="median", block_d=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(coordinate_median(u)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("c,trim", [(7, 1), (10, 2), (12, 1)])
def test_sorted_reduce_trimmed(rng, c, trim):
    u = jnp.asarray(rng.normal(0, 5, size=(c, 160)).astype(np.float32))
    got = sorted_reduce_pallas(u, mode="trimmed", trim=trim, block_d=160,
                               interpret=True)
    srt = np.sort(np.asarray(u), axis=0)
    expected = srt[trim : c - trim].mean(0)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_sorted_reduce_with_d_padding(rng):
    # D not a multiple of block_d: zero tail must not poison results.
    u = jnp.asarray(rng.normal(0, 1, size=(6, 100)).astype(np.float32))
    got = sorted_reduce_pallas(u, mode="median", block_d=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(coordinate_median(u)), rtol=1e-5, atol=1e-5
    )


def test_client_stem_conv_matches_grouped_conv(rng):
    # Per-client-weight fused stem (ops/client_conv.py) vs the XLA
    # grouped-conv lowering it replaces, in interpreter mode.
    from multimodal_fl_security_tpu.ops.client_conv import (
        client_stem_conv, client_stem_conv_reference)
    import jax

    c, b = 3, 4
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (c, b, 28 * 28 * 8), jnp.float32)
    w4 = jax.random.normal(kw, (c, 4, 4, 8, 128), jnp.float32) * 0.1
    got = client_stem_conv(x, w4, interpret=True)
    expected = client_stem_conv_reference(x, w4)
    assert got.shape == (c, b, 14, 14, 128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-4
    )
