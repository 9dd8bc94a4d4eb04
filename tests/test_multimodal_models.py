"""Fusion-family model tests + device-side preprocessing tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.data.preprocess import (
    hash_tokenize,
    log_mel_spectrogram,
    mel_filterbank,
    normalize,
    resize_images,
)
from multimodal_fl_security_tpu.models import create_model, init_model


def test_avmnist_fusion_shapes():
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(4, 28, 28, 1), jnp.float32),
        "audio": jnp.asarray(rng.rand(4, 20, 32, 1), jnp.float32),
        "label": jnp.zeros((4,), jnp.int32),
    }
    model = create_model("avmnist_fusion", num_classes=10)
    vs = init_model(model, batch)
    out = model.apply(vs, batch, train=False)
    assert out.shape == (4, 10) and jnp.isfinite(out).all()


def test_clip_style_shapes_and_embeddings():
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
        "text": jnp.asarray(rng.randint(0, 1024, (4, 16)), jnp.int32),
        "label": jnp.zeros((4,), jnp.int32),
    }
    model = create_model("clip_style", num_classes=10)
    vs = init_model(model, batch)
    out = model.apply(vs, batch, train=False)
    assert out.shape == (4, 10)
    img_e, txt_e = model.apply(vs, batch, method=model.embed)
    assert img_e.shape == (4, 128) and txt_e.shape == (4, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img_e), axis=1),
                               1.0, rtol=1e-4)


def test_clip_text_padding_is_masked():
    rng = np.random.RandomState(0)
    base = rng.randint(1, 1024, (2, 16)).astype(np.int32)
    padded = base.copy()
    padded[:, 8:] = 0  # pad tail
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)

    def batch(t):
        return {"image": images, "text": jnp.asarray(t),
                "label": jnp.zeros((2,), jnp.int32)}

    model = create_model("clip_style", num_classes=10)
    vs = init_model(model, batch(padded))
    out_padded = model.apply(vs, batch(padded), train=False)
    # Real-token change must move the output; pad positions are already
    # masked from attention and pooling (ids there stay 0 by construction).
    variant = padded.copy()
    variant[:, 0] = (variant[:, 0] % 1023) + 1  # different real token
    out_variant = model.apply(vs, batch(variant), train=False)
    assert not np.allclose(np.asarray(out_variant), np.asarray(out_padded))


def test_cremad_fusion_shapes():
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.rand(3, 20, 32, 1), jnp.float32),
        "video": jnp.asarray(rng.rand(3, 4, 16, 16, 1), jnp.float32),
        "label": jnp.zeros((3,), jnp.int32),
    }
    model = create_model("cremad_fusion", num_classes=6)
    vs = init_model(model, batch)
    out = model.apply(vs, batch, train=False)
    assert out.shape == (3, 6) and jnp.isfinite(out).all()


def test_resnet50_forward_and_depth():
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
        "label": jnp.zeros((2,), jnp.int32),
    }
    model = create_model("resnet50", num_classes=200)
    vs = init_model(model, batch)
    out = model.apply(vs, batch, train=False)
    assert out.shape == (2, 200)
    from multimodal_fl_security_tpu.models.registry import param_count

    n = param_count(vs)
    assert n > 20_000_000, n  # ResNet-50 scale (~25M, reference cub200_cnn.py:38)


# ------------------------------------------------------------ preprocessing ---
def test_normalize_and_resize():
    x = jnp.ones((2, 8, 8, 3))
    y = normalize(x, mean=[0.5, 0.5, 0.5], std=[0.25, 0.25, 0.25])
    np.testing.assert_allclose(np.asarray(y), 2.0)
    z = resize_images(x, 16, 16)
    assert z.shape == (2, 16, 16, 3)


def test_log_mel_spectrogram_shapes_and_discrimination():
    rng = np.random.RandomState(0)
    n = 4096
    t = np.arange(n) / 16000.0
    low = np.sin(2 * np.pi * 440 * t)[None].astype(np.float32)
    high = np.sin(2 * np.pi * 4000 * t)[None].astype(np.float32)
    mel_low = log_mel_spectrogram(jnp.asarray(low), num_mels=20)
    mel_high = log_mel_spectrogram(jnp.asarray(high), num_mels=20)
    assert mel_low.shape[0] == 1 and mel_low.shape[1] == 20
    assert mel_low.shape[3] == 1
    # Energy concentrates in different mel bands for different pitches.
    lo_band = int(np.asarray(mel_low).mean(2).argmax(1).ravel()[0])
    hi_band = int(np.asarray(mel_high).mean(2).argmax(1).ravel()[0])
    assert hi_band > lo_band


def test_mel_filterbank_rows_cover_spectrum():
    fb = mel_filterbank(20, 129)
    assert fb.shape == (20, 129)
    assert (fb.sum(1) > 0).all()


def test_hash_tokenize_stable_and_padded():
    a = hash_tokenize(["hello world", "hello"], seq_len=4)
    b = hash_tokenize(["hello world"], seq_len=4)
    assert a.shape == (2, 4)
    np.testing.assert_array_equal(a[0], b[0])  # stable
    assert a[0][0] == a[1][0]                  # same word -> same id
    assert (a[1][1:] == 0).all()               # padding is id 0
    assert a.max() < 1024 and a.min() >= 0
