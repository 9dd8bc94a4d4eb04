"""Multimodal fusion encoders: image + attribute vector.

Behavioral parity with the reference's CUB200MultimodalCNN
(reference: src/models/cub200_cnn.py:57-118): a 3-block conv image branch
producing a 256-d embedding, an attribute MLP (A -> 128 -> 256), late fusion
by concatenation into a 512 -> 256 -> num_classes head, and a zeroed
attribute embedding when attributes are absent (the reference zero-pads the
attribute branch input, cub200_cnn.py:104-108).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from multimodal_fl_security_tpu.models.registry import MODELS


def adaptive_avg_pool(x: jnp.ndarray, out_hw=(4, 4)) -> jnp.ndarray:
    """NHWC adaptive average pool (torch AdaptiveAvgPool2d semantics)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    import jax

    return jax.image.resize(x, (b, oh, ow, c), method="linear")


class ImageEncoder(nn.Module):
    """3-block conv encoder -> embed_dim vector.

    Pools to a coarse 4x4 grid and flattens before the projection — the
    reference's AdaptiveAvgPool2d((4,4)) + Linear design
    (reference: cub200_cnn.py:71-77) — so coarse spatial layout survives
    into the embedding (full global pooling loses position-coded classes).
    """

    embed_dim: int = 256
    features: tuple = (32, 64, 128)
    pool_hw: tuple = (4, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for f in self.features:
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = adaptive_avg_pool(x, self.pool_hw)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        return nn.relu(x)


class AttributeEncoder(nn.Module):
    """MLP over the binary attribute vector (A -> 128 -> embed_dim)."""

    embed_dim: int = 256
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = a.astype(self.dtype)
        a = nn.Dense(self.hidden, dtype=self.dtype)(a)
        a = nn.relu(a)
        a = nn.Dense(self.embed_dim, dtype=self.dtype)(a)
        return nn.relu(a)


class MultimodalFusionCNN(nn.Module):
    """Image + attribute late-fusion classifier.

    ``batch["attributes"]`` is optional: when missing (or when
    ``batch["attr_present"]`` masks it out) the attribute embedding is zero,
    matching the reference's zero-pad behavior.
    """

    num_classes: int = 200
    num_attributes: int = 312
    embed_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> jnp.ndarray:
        img_emb = ImageEncoder(self.embed_dim, dtype=self.dtype)(
            batch["image"], train=train
        )
        attr_enc = AttributeEncoder(self.embed_dim, dtype=self.dtype)
        if "attributes" in batch:
            attr_emb = attr_enc(batch["attributes"], train=train)
            if "attr_present" in batch:
                present = batch["attr_present"].astype(self.dtype)[:, None]
                attr_emb = attr_emb * present
        else:
            # Initialize the branch with zeros so the parameter structure is
            # identical whether or not attributes are fed at runtime.
            zeros = jnp.zeros(
                (batch["image"].shape[0], self.num_attributes), self.dtype
            )
            attr_emb = attr_enc(zeros, train=train) * 0.0

        fused = jnp.concatenate([img_emb, attr_emb], axis=-1)
        fused = nn.Dense(self.embed_dim, dtype=self.dtype)(fused)
        fused = nn.relu(fused)
        fused = nn.Dropout(0.3, deterministic=not train)(fused)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(fused)


@MODELS.register("multimodal_cnn", "cub200_multimodal")
def _make_multimodal(num_classes: int = 200, **kwargs) -> MultimodalFusionCNN:
    return MultimodalFusionCNN(num_classes=num_classes, **kwargs)
