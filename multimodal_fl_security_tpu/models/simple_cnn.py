"""Small image CNNs (MNIST / CIFAR-10 scale).

Architecture parity with the reference SimpleCNN
(reference: src/models/simple_cnn.py:13-76):
conv(C_in->32, 3x3, SAME) + maxpool2 -> conv(32->64, 3x3, SAME) + maxpool2
-> dropout(0.25) -> dense(128) -> dropout(0.5) -> dense(num_classes),
~1.2M parameters at 28x28x1 input. Layout is NHWC for the TPU MXU; the
reference's NCHW torch layout is an implementation detail, not behavior.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from multimodal_fl_security_tpu.models.registry import MODELS


class SimpleCNN(nn.Module):
    """Two conv blocks + two dense layers; input size agnostic."""

    num_classes: int = 10
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> jnp.ndarray:
        x = batch["image"].astype(self.dtype)
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


class CifarCNN(nn.Module):
    """Three conv blocks for 32x32x3 inputs (BASELINE.json CIFAR-10 config)."""

    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> jnp.ndarray:
        x = batch["image"].astype(self.dtype)
        for features in (32, 64, 128):
            x = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.Dense(256, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


@MODELS.register("simple_cnn", "mnist_cnn")
def _make_simple_cnn(num_classes: int = 10, **kwargs) -> SimpleCNN:
    return SimpleCNN(num_classes=num_classes, **kwargs)


@MODELS.register("cifar_cnn")
def _make_cifar_cnn(num_classes: int = 10, **kwargs) -> CifarCNN:
    return CifarCNN(num_classes=num_classes, **kwargs)
