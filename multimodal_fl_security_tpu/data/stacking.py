"""Stack per-client shards into client-major device arrays.

This is the structural move that makes the framework TPU-native: instead of
the reference's sequential per-client Python loop over DataLoaders
(reference: experiments/run_experiments.py:193-240), every modality array is
stacked to ``[C, N_max, ...]`` with a validity mask, so local training can be
``vmap``-ed over the client axis and sharded across a device mesh.

Ragged shards (Dirichlet partitions) are zero-padded to ``N_max``; the mask
zeroes padded samples out of the loss, and true example counts are kept for
FedAvg weighting — this matches the reference's example-count-weighted
aggregation (reference: src/defenses/base_defense.py:80-97).

Resident layout
---------------
Multi-dim features (images, spectrograms) can be stored in one of two
layouts on the device:

* ``"nhwc"`` — the logical shape ``[C, N, H, W, ch]``. XLA tile-pads the
  two minor dims of a resident array to (8, 128); a ``[.., 28, 1]`` minor
  pair inflates up to 5.2x in HBM (OOMs CUB-scale sweeps at C=400) and the
  per-step row gather moves the padding too.
* ``"flat"`` — ``[C, N, D']`` with ``D'`` = feature size rounded up to a
  128 multiple, zero tile padding. ``feature_shapes`` records the logical
  per-sample shape; the training/eval step reshapes each gathered BATCH
  back at the model boundary (``make_batch_adapter``), which XLA fuses
  into the gather. Measured ~9% faster per round at C=100 and immune to
  the tile-padding blowup (docs/performance.md "Client-count scaling").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from multimodal_fl_security_tpu.data.datasets import Dataset


@dataclass
class ClientData:
    """Client-stacked arrays ready for device placement.

    arrays: modality name -> [C, N_max, ...] (includes "label": [C, N_max])
    mask:   [C, N_max] float32 — 1.0 for real samples, 0.0 for padding
    counts: [C] int32 — true shard sizes (FedAvg weights)
    feature_shapes: logical per-sample shapes of flat-stored arrays
        (empty = every array is already in its logical shape)
    """

    arrays: Dict[str, np.ndarray]
    mask: np.ndarray
    counts: np.ndarray
    num_classes: int
    feature_shapes: Dict[str, tuple] = field(default_factory=dict)

    @property
    def num_clients(self) -> int:
        return self.mask.shape[0]

    @property
    def max_samples(self) -> int:
        return self.mask.shape[1]


def to_flat_layout(
    cd: ClientData,
    pad_to: int = 128,
    dtype: Optional[np.dtype] = None,
) -> ClientData:
    """Convert multi-dim features to the flat 128-aligned resident layout.

    Arrays with per-sample rank >= 2 are reshaped to ``[C, N, D]`` and
    zero-padded up to a ``pad_to`` multiple in the minor dim; their logical
    shapes land in ``feature_shapes``. Rank <= 1 arrays (labels, attribute
    vectors) pass through. ``dtype`` optionally re-types the flattened
    features (e.g. bfloat16 when the model computes bf16 anyway — halves
    resident HBM and gather traffic).
    """
    arrays: Dict[str, np.ndarray] = {}
    shapes: Dict[str, tuple] = dict(cd.feature_shapes)
    for key, arr in cd.arrays.items():
        sample_shape = arr.shape[2:]
        if len(sample_shape) < 2:
            arrays[key] = arr
            continue
        c, n = arr.shape[:2]
        d = int(np.prod(sample_shape))
        d_pad = ((d + pad_to - 1) // pad_to) * pad_to
        flat = np.ascontiguousarray(arr).reshape(c, n, d)
        if d_pad != d:
            out = np.zeros((c, n, d_pad), dtype=arr.dtype)
            out[:, :, :d] = flat
            flat = out
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            # Host-side cast (ml_dtypes registers bfloat16 with numpy);
            # also halves the host->device transfer for bf16 residents.
            flat = flat.astype(np.dtype(dtype))
        arrays[key] = flat
        shapes[key] = tuple(sample_shape)
    return ClientData(arrays=arrays, mask=cd.mask, counts=cd.counts,
                      num_classes=cd.num_classes, feature_shapes=shapes)


def to_s2d_layout(cd: ClientData, key: str = "image",
                  dtype: Optional[np.dtype] = None) -> ClientData:
    """Re-block the resident image modality to space-to-depth layout.

    ``arrays[key]`` (either logical [C, N, H, W, ch] or flat [C, N, D']
    with ``feature_shapes[key]``) is replaced by ``f"{key}_s2d"`` holding
    2x2 pixel blocks of the (1,1)-padded image, stored flat 128-aligned.
    SimpleCNN's stem consumes blocks directly as a 2x2/stride-1 conv
    (ops/s2d.py) — halves the stem's isolated dw vs the grouped-conv
    lowering at C=100 (benchmarks/fused_conv_bench.py). The
    eval/test side keeps plain images; parameters are layout-independent.
    """
    from multimodal_fl_security_tpu.ops.s2d import (
        s2d_block_shape, space_to_depth)

    arr = cd.arrays[key]
    shapes = dict(cd.feature_shapes)
    logical = shapes.pop(key, None)
    if logical is not None:
        c, n = arr.shape[:2]
        d = int(np.prod(logical))
        arr = np.asarray(arr)[:, :, :d].reshape((c, n) + tuple(logical))
    if arr.ndim != 5:
        raise ValueError(f"s2d layout needs [C, N, H, W, ch]; got {arr.shape}")
    blocks = space_to_depth(np.ascontiguousarray(arr))
    arrays = {k: v for k, v in cd.arrays.items() if k != key}
    arrays[f"{key}_s2d"] = blocks
    shapes[f"{key}_s2d"] = s2d_block_shape(arr.shape[2:])
    out = ClientData(arrays=arrays, mask=cd.mask, counts=cd.counts,
                     num_classes=cd.num_classes, feature_shapes=shapes)
    return to_flat_layout(out, dtype=dtype)


def make_batch_adapter(feature_shapes: Dict[str, tuple]):
    """Build adapt(batch) restoring flat-stored features to logical shape.

    Works on numpy and jax arrays; slices off the 128-alignment padding and
    reshapes — both fuse into the surrounding program under jit. Returns
    ``None`` when there is nothing to adapt (caller can skip the hop).
    """
    if not feature_shapes:
        return None
    sizes = {k: int(np.prod(s)) for k, s in feature_shapes.items()}

    def adapt(batch):
        out = dict(batch)
        for k, shape in feature_shapes.items():
            v = out.get(k)
            if v is None:
                continue
            out[k] = v[..., : sizes[k]].reshape(v.shape[:-1] + tuple(shape))
        return out

    return adapt


def stack_clients(
    dataset: Dataset,
    client_indices: List[np.ndarray],
    pad_multiple: int = 1,
    layout: str = "nhwc",
    resident_dtype: Optional[np.dtype] = None,
) -> ClientData:
    """Gather per-client shards and pad to a common length.

    ``pad_multiple`` rounds N_max up (e.g. to the batch size) so the batch
    grid divides evenly. ``layout="flat"`` converts the result with
    :func:`to_flat_layout` (optionally re-typed to ``resident_dtype``).
    """
    from multimodal_fl_security_tpu.data.native import gather_pad

    c = len(client_indices)
    counts = np.array([len(ix) for ix in client_indices], dtype=np.int32)
    n_max = int(counts.max())
    if pad_multiple > 1:
        n_max = ((n_max + pad_multiple - 1) // pad_multiple) * pad_multiple

    # gather_pad dispatches to the multithreaded C++ path (native/
    # mft_native.cpp) when libmft_native.so is built, numpy otherwise.
    arrays: Dict[str, np.ndarray] = {
        key: gather_pad(np.ascontiguousarray(arr), client_indices, n_max)
        for key, arr in dataset.arrays.items()
    }

    mask = np.zeros((c, n_max), dtype=np.float32)
    for i, ix in enumerate(client_indices):
        mask[i, : len(ix)] = 1.0

    cd = ClientData(arrays=arrays, mask=mask, counts=counts,
                    num_classes=dataset.num_classes)
    if layout == "flat":
        cd = to_flat_layout(cd, dtype=resident_dtype)
    elif layout == "s2d":
        # Data poisoning happens on the shards BEFORE stacking
        # (experiments/runner.py), so image-space triggers are blocked
        # along with the image — the layout cannot bypass an attack.
        cd = to_s2d_layout(cd, dtype=resident_dtype)
    elif layout != "nhwc":
        raise ValueError(f"unknown resident layout {layout!r}")
    return cd


def batch_dataset(dataset: Dataset, batch_size: int) -> Dict[str, np.ndarray]:
    """Pad a flat dataset to a whole number of batches; adds a "mask" entry."""
    n = len(dataset)
    n_pad = ((n + batch_size - 1) // batch_size) * batch_size
    out = {}
    for key, arr in dataset.arrays.items():
        padded = np.zeros((n_pad,) + arr.shape[1:], dtype=arr.dtype)
        padded[:n] = arr
        out[key] = padded
    mask = np.zeros((n_pad,), dtype=np.float32)
    mask[:n] = 1.0
    out["mask"] = mask
    return out
