"""Client data partitioners: IID, Dirichlet non-IID, label shards.

Semantics follow the reference partitioners
(reference: src/utils/data_loader.py:53-143, src/utils/partition.py:12-126):

- ``iid``: seeded global shuffle, equal contiguous chunks.
- ``dirichlet`` (a.k.a. ``noniid``): per-class Dirichlet(alpha) proportions
  with an exact-count residual fix so every sample lands on exactly one
  client. The reference never plumbed alpha from the experiment config into
  the simulation (it always used 0.5; SURVEY.md §2.9-1) — here alpha is a
  real parameter.
- ``shard``: sort-by-label, ``shards_per_client`` contiguous shards each
  (classic McMahan'17 pathological non-IID).

The partition seed defaults to 42 to match the reference's hardcoded
partition determinism (reference: src/utils/data_loader.py:78,115) but is a
real parameter here (SURVEY.md §2.9-5).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def partition_data(
    labels: np.ndarray,
    num_clients: int,
    strategy: str = "iid",
    alpha: float = 0.5,
    shards_per_client: int = 2,
    seed: int = 42,
    min_per_client: int = 1,
) -> List[np.ndarray]:
    """Split sample indices across clients; returns one index array per client."""
    strategy = (strategy or "iid").lower()
    if strategy in ("iid",):
        return _iid(labels, num_clients, seed)
    if strategy in ("dirichlet", "noniid", "non_iid", "non-iid"):
        return _dirichlet(labels, num_clients, alpha, seed, min_per_client)
    if strategy in ("shard", "pathological"):
        return _shard(labels, num_clients, shards_per_client, seed)
    raise ValueError(f"unknown partition strategy: {strategy}")


def _iid(labels: np.ndarray, num_clients: int, seed: int) -> List[np.ndarray]:
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(labels))
    return [np.sort(part) for part in np.array_split(idx, num_clients)]


def _dirichlet(labels: np.ndarray, num_clients: int, alpha: float, seed: int,
               min_per_client: int) -> List[np.ndarray]:
    rng = np.random.RandomState(seed)
    classes = np.unique(labels)
    client_indices: List[List[int]] = [[] for _ in range(num_clients)]
    for c in classes:
        cls_idx = np.where(labels == c)[0]
        rng.shuffle(cls_idx)
        props = rng.dirichlet([alpha] * num_clients)
        # Exact-count residual fix: floor the counts then hand out leftovers
        # to the largest fractional shares (reference: partition.py:54-87).
        raw = props * len(cls_idx)
        counts = np.floor(raw).astype(int)
        leftover = len(cls_idx) - counts.sum()
        if leftover > 0:
            order = np.argsort(-(raw - counts))
            counts[order[:leftover]] += 1
        start = 0
        for i in range(num_clients):
            client_indices[i].extend(cls_idx[start : start + counts[i]].tolist())
            start += counts[i]
    # Guarantee a minimum shard size by stealing from the largest clients.
    sizes = np.array([len(ci) for ci in client_indices])
    for i in range(num_clients):
        while len(client_indices[i]) < min_per_client:
            donor = int(np.argmax([len(ci) for ci in client_indices]))
            client_indices[i].append(client_indices[donor].pop())
    return [np.sort(np.asarray(ci, dtype=np.int64)) for ci in client_indices]


def _shard(labels: np.ndarray, num_clients: int, shards_per_client: int,
           seed: int) -> List[np.ndarray]:
    rng = np.random.RandomState(seed)
    order = np.argsort(labels, kind="stable")
    num_shards = num_clients * shards_per_client
    shards = np.array_split(order, num_shards)
    shard_ids = rng.permutation(num_shards)
    out = []
    for i in range(num_clients):
        mine = shard_ids[i * shards_per_client : (i + 1) * shards_per_client]
        out.append(np.sort(np.concatenate([shards[s] for s in mine])))
    return out


def get_class_distribution(labels: np.ndarray, indices: np.ndarray,
                           num_classes: int) -> np.ndarray:
    """Class histogram of one client shard (reference: data_loader.py:181-197)."""
    return np.bincount(labels[indices], minlength=num_classes)


def analyze_partition(labels: np.ndarray,
                      client_indices: List[np.ndarray],
                      num_classes: int) -> Dict:
    """Per-client class statistics (reference: src/utils/partition.py:129-162)."""
    stats = []
    global_dist = np.bincount(labels, minlength=num_classes).astype(np.float64)
    global_dist /= max(global_dist.sum(), 1)
    for i, idx in enumerate(client_indices):
        counts = np.bincount(labels[idx], minlength=num_classes).astype(np.float64)
        dist = counts / max(counts.sum(), 1)
        stats.append(
            {
                "client": i,
                "num_samples": int(len(idx)),
                "class_counts": counts.astype(int).tolist(),
                "num_classes_present": int((counts > 0).sum()),
                # Earth-mover-ish heterogeneity signal used by the reference's
                # EDA (reference: experiments/eda_analysis.py:79-131).
                "emd_to_global": float(np.abs(dist - global_dist).sum() / 2.0),
            }
        )
    sizes = np.array([s["num_samples"] for s in stats])
    return {
        "clients": stats,
        "size_mean": float(sizes.mean()),
        "size_std": float(sizes.std()),
        "size_min": int(sizes.min()),
        "size_max": int(sizes.max()),
        "mean_emd": float(np.mean([s["emd_to_global"] for s in stats])),
    }


def partition_matching(
    ref_labels: np.ndarray,
    ref_indices: List[np.ndarray],
    labels: np.ndarray,
    seed: int = 42,
) -> List[np.ndarray]:
    """Partition ``labels``' samples so each client's class mix matches its
    mix in a reference partition (e.g. give every client a TEST shard
    distributed like its TRAIN shard, for personalized evaluation —
    rounds/personalization.py).

    Same-seed ``partition_data`` calls on two datasets do NOT line up: the
    Dirichlet stream's consumption depends on the label array. Here the
    per-class apportionment is computed from the reference shard histograms
    directly (largest-remainder rounding, so every sample lands on exactly
    one client).
    """
    rng = np.random.RandomState(seed)
    num_clients = len(ref_indices)
    num_classes = int(max(ref_labels.max(), labels.max())) + 1
    want = np.zeros((num_clients, num_classes), np.float64)
    for i, ix in enumerate(ref_indices):
        want[i] = np.bincount(ref_labels[ix], minlength=num_classes)

    out: List[List[int]] = [[] for _ in range(num_clients)]
    for k in range(num_classes):
        pool = np.where(labels == k)[0]
        rng.shuffle(pool)
        weights = want[:, k]
        total = weights.sum()
        if total <= 0:
            weights = np.ones(num_clients)  # class absent upstream: spread
            total = float(num_clients)
        exact = weights / total * len(pool)
        base = np.floor(exact).astype(int)
        rem = len(pool) - base.sum()
        order = np.argsort(-(exact - base))
        base[order[:rem]] += 1
        off = 0
        for i in range(num_clients):
            out[i].extend(pool[off : off + base[i]].tolist())
            off += base[i]
    return [np.asarray(sorted(ix), dtype=np.int64) for ix in out]
