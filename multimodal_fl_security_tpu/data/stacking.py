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
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from multimodal_fl_security_tpu.data.datasets import Dataset


@dataclass
class ClientData:
    """Client-stacked arrays ready for device placement.

    arrays: modality name -> [C, N_max, ...] (includes "label": [C, N_max])
    mask:   [C, N_max] float32 — 1.0 for real samples, 0.0 for padding
    counts: [C] int32 — true shard sizes (FedAvg weights)
    """

    arrays: Dict[str, np.ndarray]
    mask: np.ndarray
    counts: np.ndarray
    num_classes: int

    @property
    def num_clients(self) -> int:
        return self.mask.shape[0]

    @property
    def max_samples(self) -> int:
        return self.mask.shape[1]


def stack_clients(
    dataset: Dataset,
    client_indices: List[np.ndarray],
    pad_multiple: int = 1,
) -> ClientData:
    """Gather per-client shards and pad to a common length.

    ``pad_multiple`` rounds N_max up (e.g. to the batch size) so the batch
    grid divides evenly.
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

    return ClientData(arrays=arrays, mask=mask, counts=counts,
                      num_classes=dataset.num_classes)


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
