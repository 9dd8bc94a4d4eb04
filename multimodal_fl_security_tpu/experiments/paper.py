"""Paper experiment matrix: the reference's publication sweep.

Parity with the reference runner (reference: experiments/
run_paper_experiments.py:35-124, 293-312, 356-391):
  - dataset presets: MNIST {10 clients, 10 rounds, lr .01, seeds
    42/123/456/789/1024}, CUB {3 clients, 75 rounds, bs 16, lr .001,
    seeds 42/123/456}, QUICK {5 clients, 3 rounds, 1 seed};
  - matrix = baseline + {label_flip, backdoor, model_replacement} x
    {none, krum, trimmed_mean, fltrust, dp_sgd} x {iid, dirichlet
    alpha in {0.5, 0.1}};
  - per-cell multi-seed aggregation, Markdown + LaTeX tables.

Unlike the reference, alpha really is applied per cell (SURVEY.md §2.9-1)
and model_replacement really fires in simulation (§2.9-2).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

from multimodal_fl_security_tpu.experiments.emitters import (
    latex_table,
    markdown_table,
)
from multimodal_fl_security_tpu.experiments.matrix import (
    BatchExperimentRunner,
    ExperimentMatrix,
    aggregate_seed_cells,
)

PAPER_PRESETS: Dict[str, Dict[str, Any]] = {
    # reference: run_paper_experiments.py:35-49 (MNIST_CONFIG)
    "mnist": dict(
        datasets=["mnist"], client_counts=[10], num_rounds=10,
        local_epochs=2, batch_size=32, learning_rate=0.01,
        seeds=[42, 123, 456, 789, 1024],
    ),
    # reference: run_paper_experiments.py:51-58 (CUB_CONFIG)
    "cub200": dict(
        datasets=["cub200"], client_counts=[3], num_rounds=75,
        local_epochs=1, batch_size=16, learning_rate=0.001,
        seeds=[42, 123, 456],
    ),
    # reference: run_paper_experiments.py:60-65 (QUICK_CONFIG); synthetic
    # stands in for MNIST in this no-download environment.
    "quick": dict(
        datasets=["synthetic"], client_counts=[5], num_rounds=3,
        local_epochs=1, batch_size=32, learning_rate=0.05,
        seeds=[42], dataset_params={"num_train": 2000, "num_test": 500},
    ),
    # The MNIST paper config on the bundled sklearn digits dataset — the
    # full 300-experiment reference sweep (run with
    # full_distributions=True) with no downloads. The reference budgets
    # 50-55 h for this on a GPU (RUNPOD_SETUP_GUIDE.md / PROJECT_KNOWLEDGE
    # .md:596); see artifacts/full_paper_digits for the on-TPU wall clock.
    "digits_full": dict(
        datasets=["digits"], client_counts=[10], num_rounds=10,
        local_epochs=2, batch_size=32, learning_rate=0.05,
        seeds=[42, 123, 456, 789, 1024],
    ),
}

PAPER_ATTACKS = ["none", "label_flip", "backdoor", "model_replacement"]
PAPER_DEFENSES = ["none", "krum", "trimmed_mean", "fltrust", "dp_sgd"]


def build_paper_matrix(preset: str = "quick",
                       full_distributions: bool = False) -> ExperimentMatrix:
    cfg = dict(PAPER_PRESETS[preset])
    partitions = ["iid", "dirichlet"] if full_distributions else ["iid"]
    alphas = [0.5, 0.1] if full_distributions else [0.5]
    return ExperimentMatrix(
        attacks=PAPER_ATTACKS,
        defenses=PAPER_DEFENSES,
        partitions=partitions,
        alphas=alphas,
        **cfg,
    )


def run_paper_experiments(preset: str = "quick",
                          results_dir: str = "results/paper",
                          full_distributions: bool = False,
                          resume: bool = True) -> Dict[str, Any]:
    matrix = build_paper_matrix(preset, full_distributions)
    runner = BatchExperimentRunner(results_dir)
    results = runner.run_matrix(matrix, resume=resume)
    cells = aggregate_seed_cells(results)

    rows: List[Dict[str, Any]] = []
    for cell in sorted(cells, key=lambda c: c["cell"]):
        rows.append({
            "cell": cell["cell"],
            "seeds": cell["num_seeds"],
            "accuracy": cell["accuracy_mean"],
            "acc_std": cell["accuracy_std"],
            "asr": cell.get("asr_mean", "-"),
        })

    md = markdown_table(rows)
    tex = latex_table(rows, caption=f"Attack x defense results ({preset})",
                      label=f"tab:{preset}")
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "paper_results.md"), "w") as f:
        f.write(md)
    with open(os.path.join(results_dir, "paper_results.tex"), "w") as f:
        f.write(tex)
    with open(os.path.join(results_dir, "paper_cells.json"), "w") as f:
        json.dump(cells, f, indent=2)
    return {"cells": cells, "markdown": md, "latex": tex,
            "num_experiments": len(results)}
