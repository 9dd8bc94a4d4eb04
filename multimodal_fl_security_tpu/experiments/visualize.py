"""Result visualization: accuracy-vs-round curves, attack x defense heatmaps.

Parity with the reference (reference: experiments/visualize.py:24-145):
results loader, per-experiment accuracy curves, attack x defense accuracy
heatmap, markdown table. matplotlib is imported lazily with Agg so headless
runs work.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List

import numpy as np


def load_results(results_dir: str) -> List[Dict[str, Any]]:
    out = []
    for path in sorted(glob.glob(os.path.join(results_dir, "*.json"))):
        try:
            with open(path) as f:
                d = json.load(f)
            if isinstance(d, dict) and "final_accuracy" in d:
                out.append(d)
        except (json.JSONDecodeError, OSError):
            continue
    return out


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_accuracy_curves(results: List[Dict[str, Any]],
                         out_path: str = "accuracy_curves.png") -> str:
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    for r in results:
        accs = r.get("round_accuracies", [])
        name = r.get("config", {}).get("name", "?")
        ax.plot(range(1, len(accs) + 1), accs, marker="o", label=name)
    ax.set_xlabel("Round")
    ax.set_ylabel("Test accuracy")
    ax.set_title("Accuracy vs round")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_attack_defense_heatmap(results: List[Dict[str, Any]],
                                metric: str = "final_accuracy",
                                out_path: str = "heatmap.png") -> str:
    """Attack x defense heatmap (reference: visualize.py:64-113)."""
    plt = _plt()
    attacks = sorted({r["config"].get("attack_type", "none") for r in results})
    defenses = sorted({r["config"].get("defense_type", "none") for r in results})
    # Accumulate every run per cell FIRST, then mean once — an iterative
    # pairwise mean would weight later files exponentially more (3 seeds
    # 0.2/0.4/0.9 -> 0.6 instead of the true 0.5).
    cells: Dict[tuple, list] = {}
    for r in results:
        if metric == "attack_success_rate" and r.get(metric) is None:
            continue
        i = attacks.index(r["config"].get("attack_type", "none"))
        j = defenses.index(r["config"].get("defense_type", "none"))
        v = r.get(metric)
        if v is not None:
            cells.setdefault((i, j), []).append(float(v))
    grid = np.full((len(attacks), len(defenses)), np.nan)
    for (i, j), vals in cells.items():
        grid[i, j] = float(np.mean(vals))
    fig, ax = plt.subplots(figsize=(1.2 * len(defenses) + 2,
                                    0.8 * len(attacks) + 2))
    im = ax.imshow(grid, cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(defenses)), defenses, rotation=30, ha="right")
    ax.set_yticks(range(len(attacks)), attacks)
    for i in range(len(attacks)):
        for j in range(len(defenses)):
            if not np.isnan(grid[i, j]):
                ax.text(j, i, f"{grid[i, j]:.3f}", ha="center", va="center",
                        color="w", fontsize=8)
    ax.set_title(metric)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def results_markdown(results: List[Dict[str, Any]]) -> str:
    from multimodal_fl_security_tpu.experiments.emitters import (
        markdown_table,
        results_to_rows,
    )

    return markdown_table(results_to_rows(results))
