"""ResNet for CUB-200-scale transfer learning (reference: src/models/
cub200_cnn.py:23-54 wraps torchvision ResNet-50 with a Dropout(0.3) +
Linear(2048 -> num_classes) head).

Deliberate divergences, documented per SURVEY.md §7:
  - **Normalization**: GroupNorm by default instead of BatchNorm. The
    reference's simulation path never aggregates BN running stats (global
    model keeps init buffers — latent bug, SURVEY.md §2.9-4), and BN is
    known-broken under FedAvg with non-IID clients; GroupNorm keeps the
    model a pure function of parameters, which is also what the stacked
    [C, ...] client-vmap wants. ``norm="batch"`` selects the
    reference-compat frozen-stats mode (``FrozenBatchNorm``): stats stay
    at init exactly as in the reference simulation, reducing BN to its
    learnable per-channel affine.
  - **Pretrained weights come from a local file**, not a download (this
    environment has no network egress): ``ExperimentConfig.pretrained_path``
    merges a pickled parameter pytree into the fresh init by name+shape
    (models/pretrained.py::load_pretrained — a head with a different class
    count keeps its fresh init, like the reference's replaced fc), and
    ``freeze_backbone`` masks every non-head subtree out of local training
    (reference: cub200_cnn.py:29-54). A torchvision ResNet-50 checkpoint —
    the reference's actual weights format — converts directly:
    ``python -m multimodal_fl_security_tpu.models.torch_convert ckpt.pth
    out.pkl`` folds BatchNorm stats into the ``norm="batch"`` affine
    exactly; together with the torch-exact explicit padding below, the
    converted model reproduces torch's eval forward numerically
    (tests/test_torch_convert.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_fl_security_tpu.models.registry import MODELS


class FrozenBatchNorm(nn.Module):
    """Reference-compat "batch" normalization: stats frozen at init.

    The reference's SIMULATION path never aggregates BatchNorm running
    stats — it exchanges ``model.parameters()`` only, so the global
    model normalizes with init statistics (mean 0, var 1) forever
    (latent bug, SURVEY.md §2.9-4; reference: run_experiments.py:238).
    With init stats, BN reduces to the learnable per-channel affine
    ``y = x * scale + bias`` — implemented here as exactly that, so the
    reference-compat mode is a pure function of parameters and runs
    under the client vmap with no mutable collections.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class ResNetBlock(nn.Module):
    """Bottleneck block (1x1 -> 3x3 -> 1x1) with projection shortcut."""

    features: int
    strides: int = 1
    norm: Callable = nn.GroupNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        # Explicit symmetric padding = torch's Conv2d(padding=1). For
        # stride 1 this IS "SAME"; for stride 2 XLA's "SAME" pads
        # asymmetrically ((0,1) on even inputs), which would shift
        # converted torchvision weights one pixel off their training-time
        # receptive fields (models/torch_convert.py).
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = self.norm()(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet-v1 with bottleneck blocks; stage_sizes (3,4,6,3) = ResNet-50."""

    num_classes: int = 200
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.float32
    head_dropout: float = 0.3  # reference: cub200_cnn.py:44-48
    #: "group" (default) or "batch" (reference-compat frozen-stats mode,
    #: see FrozenBatchNorm)
    norm: str = "group"

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False) -> jnp.ndarray:
        if self.norm == "batch":
            norm = partial(FrozenBatchNorm, dtype=self.dtype)
        elif self.norm == "group":
            norm = partial(nn.GroupNorm, num_groups=32)
        else:
            raise ValueError(f"unknown norm {self.norm!r}")
        x = batch["image"].astype(self.dtype)
        # Torch-exact stem padding (Conv2d(7, stride 2, padding=3) and
        # MaxPool2d(3, stride 2, padding=1)): XLA's "SAME" pads these
        # stride-2 windows asymmetrically, see note in ResNetBlock.
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = ResNetBlock(self.width * 2 ** stage, strides=strides,
                                norm=norm, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


@MODELS.register("resnet50", "cub200_cnn")
def _make_resnet50(num_classes: int = 200, **kwargs) -> ResNet:
    kwargs.setdefault("stage_sizes", (3, 4, 6, 3))
    return ResNet(num_classes=num_classes, **kwargs)


@MODELS.register("resnet18")
def _make_resnet18(num_classes: int = 10, **kwargs) -> ResNet:
    # Kept bottleneck-style for simplicity; (2,2,2,2) stage layout.
    kwargs.setdefault("stage_sizes", (2, 2, 2, 2))
    return ResNet(num_classes=num_classes, **kwargs)
