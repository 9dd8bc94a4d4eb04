"""Exploratory data analysis: dataset stats + partition heterogeneity.

Parity with the reference (reference: experiments/eda_analysis.py:20-303):
per-channel image statistics on a subsample, per-client heterogeneity
metrics (EMD to the global label distribution, label variance, class
coverage, combined score = EMD * (1 - coverage)), partition heatmaps, and a
markdown report generator.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import numpy as np

from multimodal_fl_security_tpu.data.datasets import Dataset
from multimodal_fl_security_tpu.data.partition import partition_data


def dataset_stats(dataset: Dataset, subsample: int = 500,
                  seed: int = 0) -> Dict[str, Any]:
    """Label distribution + per-channel image mean/std on a subsample
    (reference: eda_analysis.py:20-76)."""
    labels = dataset.labels
    counts = np.bincount(labels, minlength=dataset.num_classes)
    out: Dict[str, Any] = {
        "num_samples": int(len(dataset)),
        "num_classes": int(dataset.num_classes),
        "class_counts": counts.tolist(),
        "class_balance": float(counts.max() / max(counts.min(), 1)),
        "modalities": sorted(k for k in dataset.arrays if k != "label"),
    }
    if "image" in dataset.arrays:
        rng = np.random.RandomState(seed)
        idx = rng.choice(len(dataset), size=min(subsample, len(dataset)),
                         replace=False)
        imgs = dataset.arrays["image"][idx]
        out["image_shape"] = list(imgs.shape[1:])
        out["channel_mean"] = imgs.mean(axis=(0, 1, 2)).tolist()
        out["channel_std"] = imgs.std(axis=(0, 1, 2)).tolist()
    return out


def heterogeneity_metrics(labels: np.ndarray,
                          client_indices: List[np.ndarray],
                          num_classes: int) -> Dict[str, Any]:
    """Per-client EMD/variance/coverage + combined score
    (reference: eda_analysis.py:79-131)."""
    global_dist = np.bincount(labels, minlength=num_classes).astype(float)
    global_dist /= max(global_dist.sum(), 1)
    per_client = []
    for i, idx in enumerate(client_indices):
        counts = np.bincount(labels[idx], minlength=num_classes).astype(float)
        dist = counts / max(counts.sum(), 1)
        emd = float(np.abs(dist - global_dist).sum() / 2.0)
        coverage = float((counts > 0).mean())
        per_client.append({
            "client": i,
            "emd": emd,
            "label_variance": float(dist.var()),
            "class_coverage": coverage,
            "combined_score": emd * (1.0 - coverage),
        })
    return {
        "per_client": per_client,
        "mean_emd": float(np.mean([c["emd"] for c in per_client])),
        "mean_coverage": float(
            np.mean([c["class_coverage"] for c in per_client])
        ),
        "mean_combined": float(
            np.mean([c["combined_score"] for c in per_client])
        ),
    }


def plot_partition_heatmap(labels: np.ndarray,
                           client_indices: List[np.ndarray],
                           num_classes: int,
                           out_path: str = "partition_heatmap.png") -> str:
    """Client x class sample-count heatmap (reference: eda_analysis.py:171-247)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    grid = np.stack([
        np.bincount(labels[idx], minlength=num_classes)
        for idx in client_indices
    ])
    fig, ax = plt.subplots(figsize=(8, 0.4 * len(client_indices) + 2))
    im = ax.imshow(grid, cmap="YlOrRd", aspect="auto")
    ax.set_xlabel("Class")
    ax.set_ylabel("Client")
    fig.colorbar(im, ax=ax, label="samples")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def generate_report(dataset: Dataset, num_clients: int = 10,
                    out_dir: str = "eda_report",
                    partitions=("iid", "dirichlet"),
                    alphas=(0.5, 0.1)) -> str:
    """Full EDA report (reference: eda_analysis.py:250-303)."""
    os.makedirs(out_dir, exist_ok=True)
    lines = [f"# EDA Report — {dataset.name}", ""]
    stats = dataset_stats(dataset)
    lines.append("## Dataset")
    for k, v in stats.items():
        lines.append(f"- **{k}**: {v}")
    lines.append("")
    for strategy in partitions:
        for alpha in (alphas if strategy != "iid" else [None]):
            tag = strategy if alpha is None else f"{strategy}(alpha={alpha})"
            parts = partition_data(dataset.labels, num_clients, strategy,
                                   alpha=alpha or 0.5)
            het = heterogeneity_metrics(dataset.labels, parts,
                                        dataset.num_classes)
            png = os.path.join(
                out_dir, f"partition_{strategy}_{alpha or 'na'}.png"
            )
            plot_partition_heatmap(dataset.labels, parts,
                                   dataset.num_classes, png)
            lines += [
                f"## Partition: {tag}",
                f"- mean EMD to global: {het['mean_emd']:.4f}",
                f"- mean class coverage: {het['mean_coverage']:.4f}",
                f"- mean combined score: {het['mean_combined']:.4f}",
                f"- heatmap: {os.path.basename(png)}",
                "",
            ]
    path = os.path.join(out_dir, "report.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path
