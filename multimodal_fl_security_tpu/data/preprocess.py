"""Device-side preprocessing: normalization, resize, log-mel spectrogram,
hash tokenization.

The reference does all preprocessing on the host inside torchvision
transforms (reference: src/utils/data_loader.py:16-21,
src/utils/cub200_loader.py:192-216). Here every transform is a pure jnp
function, so preprocessing fuses into the XLA input pipeline and runs on
device (BASELINE.json north star: "image/text/audio preprocessing fuses into
XLA device-side pipelines").
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def normalize(images: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Channel-wise (x - mean) / std; mean/std scalars or per-channel."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def resize_images(images: jnp.ndarray, height: int, width: int,
                  method: str = "bilinear") -> jnp.ndarray:
    """Batched NHWC resize on device (vs torchvision Resize on host)."""
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, height, width, c), method=method)


def random_flip(key: jnp.ndarray, images: jnp.ndarray, p: float = 0.5):
    """Per-sample horizontal flip (train-time augmentation)."""
    flips = jax.random.bernoulli(key, p, (images.shape[0],))
    return jnp.where(flips[:, None, None, None], images[:, :, ::-1, :], images)


def random_shift(key: jnp.ndarray, images: jnp.ndarray, max_shift: int = 2):
    """Per-sample random translation within +/- max_shift pixels (the
    jit-friendly stand-in for random cropping: pad + dynamic slice)."""
    b, h, w, c = images.shape
    kx, ky = jax.random.split(key)
    dx = jax.random.randint(kx, (b,), -max_shift, max_shift + 1)
    dy = jax.random.randint(ky, (b,), -max_shift, max_shift + 1)
    padded = jnp.pad(images, ((0, 0), (max_shift, max_shift),
                              (max_shift, max_shift), (0, 0)))

    def crop(img, ddy, ddx):
        return jax.lax.dynamic_slice(
            img, (max_shift + ddy, max_shift + ddx, 0), (h, w, c)
        )

    return jax.vmap(crop)(padded, dy, dx)


def random_resized_crop(key: jnp.ndarray, images: jnp.ndarray,
                        min_scale: float = 0.35,
                        max_scale: float = 1.0) -> jnp.ndarray:
    """Per-sample random zoom-crop resized back to the input shape — the
    device-side equivalent of torchvision RandomResizedCrop (reference:
    src/utils/cub200_loader.py:195 uses RandomResizedCrop(224, scale=
    (0.7, 1.0))). Crop AREA is sampled in [min_scale, max_scale] of the
    image; position uniform within bounds. jit-safe: output shape is
    static, the per-sample crop geometry rides through
    jax.image.scale_and_translate's dynamic scale/translation arguments.
    """
    b, h, w, _ = images.shape
    karea, kx, ky = jax.random.split(key, 3)
    area = jax.random.uniform(karea, (b,), minval=min_scale, maxval=max_scale)
    side = jnp.sqrt(area)                      # crop side fraction
    # output = crop resized to (h, w): zoom factor 1/side >= 1
    zoom = 1.0 / side
    # Crop top-left in (1 - side) * [0.5/dim, 1 - 0.5/dim]: the output
    # sample positions u_i = (i + 0.5 - t)/z - 0.5 then stay inside the
    # input pixel-center grid [0, dim-1]. scale_and_translate zero-pads
    # out-of-range samples, so the naive [0, 1 - side] origin range let a
    # border-touching crop mix zeros into the first/last interpolated
    # row/column (up to ~20% edge attenuation at min_scale=0.35);
    # torchvision's crop-then-resize never samples outside the crop. The
    # clamp insets the sampled window by half an INPUT pixel per edge —
    # same crop statistics, no border artifact.
    fx = (1.0 - side) * (0.5 + jax.random.uniform(kx, (b,)) * (w - 1.0)) / w
    fy = (1.0 - side) * (0.5 + jax.random.uniform(ky, (b,)) * (h - 1.0)) / h

    def one(img, z, ox, oy):
        scale = jnp.stack([z, z])
        # out_px = in_px * z + t  =>  t = -origin_px * z
        trans = jnp.stack([-oy * h * z, -ox * w * z])
        return jax.image.scale_and_translate(
            img, (h, w, img.shape[-1]), (0, 1), scale, trans,
            method="linear")

    return jax.vmap(one)(images, zoom, fx, fy).astype(images.dtype)


def random_erase(key: jnp.ndarray, images: jnp.ndarray,
                 frac: float = 0.25, p: float = 0.5) -> jnp.ndarray:
    """Per-sample cutout: zero a random (frac*H x frac*W) rectangle with
    probability p (jit-safe iota masks, no dynamic shapes)."""
    b, h, w, _ = images.shape
    kx, ky, kp = jax.random.split(key, 3)
    eh, ew = int(h * frac), int(w * frac)
    y0 = jax.random.randint(ky, (b,), 0, h - eh + 1)
    x0 = jax.random.randint(kx, (b,), 0, w - ew + 1)
    on = jax.random.bernoulli(kp, p, (b,))
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    inside = ((ys >= y0[:, None, None]) & (ys < (y0 + eh)[:, None, None])
              & (xs >= x0[:, None, None]) & (xs < (x0 + ew)[:, None, None]))
    mask = jnp.where(on[:, None, None] & inside, 0.0, 1.0)
    return images * mask[..., None].astype(images.dtype)


_GRAY_WEIGHTS = (0.2989, 0.587, 0.114)  # torchvision rgb_to_grayscale


def color_jitter(key: jnp.ndarray, images: jnp.ndarray,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2,
                 mean=None, std=None) -> jnp.ndarray:
    """Per-sample brightness/contrast/saturation jitter — the device-side
    equivalent of the reference's ColorJitter(0.2, 0.2, 0.2) on CUB train
    images (reference: src/utils/cub200_loader.py:198). Each factor is
    sampled U[1-v, 1+v] per image; ops apply in fixed brightness ->
    contrast -> saturation order (torchvision randomizes the order — a
    documented, statistically negligible divergence at these strengths)
    and clamp to [0, 1] in raw space like torchvision's _blend.

    ``mean``/``std``: if given, ``images`` are normalized; the jitter runs
    in raw [0, 1] space between an unnormalize/renormalize pair (all
    elementwise, fused by XLA).
    """
    b = images.shape[0]
    dtype = images.dtype
    x = images.astype(jnp.float32)
    if mean is not None:
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)
        x = x * std + mean
    kb, kc, ks = jax.random.split(key, 3)
    shape = (b, 1, 1, 1)
    fb = jax.random.uniform(kb, shape, minval=1 - brightness,
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, shape, minval=1 - contrast,
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, shape, minval=1 - saturation,
                            maxval=1 + saturation)
    x = jnp.clip(x * fb, 0.0, 1.0)
    gray = (x * jnp.asarray(_GRAY_WEIGHTS, jnp.float32)).sum(-1,
                                                             keepdims=True)
    gmean = gray.mean(axis=(1, 2), keepdims=True)
    x = jnp.clip(fc * x + (1 - fc) * gmean, 0.0, 1.0)
    x = jnp.clip(fs * x + (1 - fs) * gray, 0.0, 1.0)
    if mean is not None:
        x = (x - mean) / std
    return x.astype(dtype)


def random_rotate(key: jnp.ndarray, images: jnp.ndarray,
                  max_deg: float = 15.0, mean=None, std=None) -> jnp.ndarray:
    """Per-sample rotation by U[-max_deg, +max_deg] about the image center,
    bilinear — the device-side equivalent of the reference's
    RandomRotation(15) (reference: src/utils/cub200_loader.py:197; its
    torchvision default resamples NEAREST — bilinear is a deliberate
    quality upgrade, documented divergence).
    Out-of-frame corners fill with raw-space black, like torchvision's
    default fill=0; with ``mean``/``std`` given (normalized inputs) the
    fill value is (0 - mean)/std per channel. jit-safe: static output
    shape, per-sample angles ride through map_coordinates' dynamic
    sample grid.
    """
    b, h, w, c = images.shape
    dtype = images.dtype
    theta = jax.random.uniform(key, (b,), minval=-max_deg, maxval=max_deg)
    theta = theta * (jnp.pi / 180.0)
    if mean is not None:
        fill = (0.0 - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
            std, jnp.float32)
    else:
        fill = jnp.zeros((c,), jnp.float32)
    # Rotate (x - fill) with cval=0, then add fill back: inside the frame
    # this is the identity correction; outside it yields exactly `fill`.
    x = images.astype(jnp.float32) - fill
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.mgrid[0:h, 0:w]
    ys = ys.astype(jnp.float32) - cy
    xs = xs.astype(jnp.float32) - cx

    def one(args):
        img, t = args
        cos, sin = jnp.cos(t), jnp.sin(t)
        sy = cos * ys - sin * xs + cy  # inverse map: dest -> source
        sx = sin * ys + cos * xs + cx
        return jnp.stack(
            [jax.scipy.ndimage.map_coordinates(
                img[..., k], [sy, sx], order=1, mode="constant", cval=0.0)
             for k in range(c)], axis=-1)

    # lax.map, not vmap: the bilinear gather's corner/weight intermediates
    # are ~8 x [H, W] f32 per channel; batch-vectorized at 224px inside the
    # training scan they peak at GBs and OOM'd a ResNet-18 CUB run on a
    # 16 GB chip. Serializing per sample cuts peak memory by the batch
    # factor; the augment is a rounding error next to the conv step time.
    out = jax.lax.map(one, (x, theta)) + fill
    return out.astype(dtype)


def make_augment_fn(mode: str):
    """Batch augmentation for the training step: (key, batch) -> batch.

    Modes: "flip", "crop", "crop_flip" (flip + small shift), "rrc_flip"
    (random-resized-crop + flip), "rrc_flip_erase" (+ cutout), "ref_cub"
    (the reference's FULL CUB train transform on device:
    RandomResizedCrop(scale 0.7-1.0) -> flip -> RandomRotation(15) ->
    ColorJitter(0.2) in the reference's own order,
    src/utils/cub200_loader.py:193-199; assumes ImageNet-normalized
    inputs, which is how data/cub200.py stores residents). Pure and
    jit/vmap-safe; applied on device inside the local-training scan (the
    reference ran torchvision augmentation on the host,
    cub200_loader.py:192-216).
    """
    mode = (mode or "none").lower()
    if mode in ("none", ""):
        return None

    if mode == "ref_cub":
        from multimodal_fl_security_tpu.data.datasets import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        m = np.asarray(IMAGENET_MEAN, np.float32).reshape(-1)
        s = np.asarray(IMAGENET_STD, np.float32).reshape(-1)

        def fn(key, batch):
            images = batch["image"]
            k1, k2, k3, k4 = jax.random.split(key, 4)
            images = random_resized_crop(k1, images, min_scale=0.7)
            images = random_flip(k2, images)
            images = random_rotate(k3, images, max_deg=15.0, mean=m, std=s)
            images = color_jitter(k4, images, mean=m, std=s)
            return dict(batch, image=images)

        return fn

    def fn(key, batch):
        images = batch["image"]
        if mode in ("flip", "crop_flip", "rrc_flip", "rrc_flip_erase"):
            key, sub = jax.random.split(key)
            images = random_flip(sub, images)
        if mode in ("crop", "crop_flip"):
            key, sub = jax.random.split(key)
            images = random_shift(sub, images)
        if mode in ("rrc_flip", "rrc_flip_erase"):
            key, sub = jax.random.split(key)
            images = random_resized_crop(sub, images)
        if mode == "rrc_flip_erase":
            key, sub = jax.random.split(key)
            images = random_erase(sub, images)
        return dict(batch, image=images)

    return fn


# ---------------------------------------------------------------------------
# Audio: log-mel spectrogram
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(num_mels: int, num_fft_bins: int,
                   sample_rate: int = 16000,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Triangular mel filterbank matrix [num_mels, num_fft_bins] (host
    constant; the matmul it feeds runs on the MXU)."""
    fmax = fmax or sample_rate / 2
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), num_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.floor((num_fft_bins * 2 - 1) * hz_pts / sample_rate).astype(int)
    bins = np.clip(bins, 0, num_fft_bins - 1)
    fb = np.zeros((num_mels, num_fft_bins), np.float32)
    for m in range(num_mels):
        lo, mid, hi = bins[m], bins[m + 1], bins[m + 2]
        if mid > lo:
            fb[m, lo:mid] = (np.arange(lo, mid) - lo) / max(mid - lo, 1)
        if hi > mid:
            fb[m, mid:hi] = (hi - np.arange(mid, hi)) / max(hi - mid, 1)
    return fb


@partial(jax.jit, static_argnames=("frame_length", "hop", "num_mels",
                                   "sample_rate"))
def log_mel_spectrogram(waveform: jnp.ndarray, frame_length: int = 256,
                        hop: int = 128, num_mels: int = 20,
                        sample_rate: int = 16000) -> jnp.ndarray:
    """Batched waveform [B, N] -> log-mel spectrogram [B, num_mels, T, 1].

    STFT via strided framing + rFFT; Hann window; mel projection is one
    matmul. Everything is on device — the host never sees a spectrogram.
    """
    b, n = waveform.shape
    num_frames = 1 + (n - frame_length) // hop
    idx = (jnp.arange(num_frames)[:, None] * hop
           + jnp.arange(frame_length)[None, :])
    frames = waveform[:, idx]  # [B, T, frame_length]
    window = jnp.hanning(frame_length).astype(jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))  # [B, T, F]
    fb = jnp.asarray(mel_filterbank(num_mels, spec.shape[-1], sample_rate))
    mel = jnp.einsum("btf,mf->bmt", spec ** 2, fb)
    return jnp.log(mel + 1e-6)[..., None]


# ---------------------------------------------------------------------------
# Text: hash tokenizer
# ---------------------------------------------------------------------------


def hash_tokenize(texts: Sequence[str], seq_len: int = 16,
                  vocab_size: int = 1024) -> np.ndarray:
    """Whitespace-split + stable-hash vocabulary mapping; id 0 is padding.

    A dependency-free tokenizer (host-side string handling is unavoidable;
    the embedding lookup it feeds is on device).
    """
    out = np.zeros((len(texts), seq_len), np.int32)
    for i, t in enumerate(texts):
        for j, tok in enumerate(str(t).lower().split()[:seq_len]):
            h = 2166136261
            for ch in tok.encode():
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            out[i, j] = 1 + (h % (vocab_size - 1))
    return out
