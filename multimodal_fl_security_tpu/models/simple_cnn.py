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
import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.models.registry import MODELS


class ConvPoolFused(nn.Module):
    """conv(3x3, SAME) -> relu -> maxpool(2) as ONE stride-2 conv.

    The 3x3 kernel is embedded at each of the 4 pool-window offsets of a
    4x4/stride-2 kernel with 4x the output channels, then the groups are
    max-reduced: exactly the same values as conv+relu+pool (max commutes
    with the shared bias; relu is monotone), but the MXU contraction grows
    from 3*3*C_in lanes / C_out columns to 4*4*C_in / 4*C_out — measured
    19% faster per training step at the bench workload (per-client vmapped
    weights, docs/performance.md). Parameters are identical to nn.Conv's
    (one (3,3,C_in,C_out) kernel + bias), so model semantics, counts, and
    gradients match the unfused stem.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, s2d: bool = False) -> jnp.ndarray:
        """``x`` is either the image [B, H, W, ch] (conv path) or its
        space-to-depth blocks [B, HB, WB, 4*ch] when ``s2d`` (the resident
        layout ops/s2d.py builds — the stem then runs as four batched
        GEMMs instead of a grouped conv). Parameters are identical either
        way, so a model trained on blocks evaluates on images."""
        cin = x.shape[-1] // 4 if s2d else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        k = kernel.astype(self.dtype)
        w4 = jnp.zeros((4, 4, cin, 4 * self.features), self.dtype)
        for g, (di, dj) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            w4 = w4.at[di : di + 3, dj : dj + 3, :,
                       g * self.features : (g + 1) * self.features].set(k)
        if s2d:
            from multimodal_fl_security_tpu.ops.s2d import s2d_stem_conv

            y = s2d_stem_conv(x.astype(self.dtype), w4)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w4, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 4, self.features).max(axis=3)
        return nn.relu(y + bias.astype(self.dtype))


class SimpleCNN(nn.Module):
    """Two conv blocks + two dense layers; input size agnostic."""

    num_classes: int = 10
    hidden_dim: int = 128
    dtype: Any = jnp.float32
    #: fuse the first conv+relu+pool stage into one stride-2 conv
    #: (mathematically exact; see ConvPoolFused)
    fused_stem: bool = True

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> jnp.ndarray:
        if "image_s2d" in batch:
            # Space-to-depth resident layout (ops/s2d.py): the stem runs
            # on pre-blocked input; params and downstream shapes match the
            # image path, so train-on-blocks / eval-on-images just works.
            x = ConvPoolFused(32, dtype=self.dtype)(
                batch["image_s2d"].astype(self.dtype), s2d=True)
        elif self.fused_stem and batch["image"].shape[1] >= 2 \
                and batch["image"].shape[2] >= 2:
            x = ConvPoolFused(32, dtype=self.dtype)(
                batch["image"].astype(self.dtype))
        else:
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
