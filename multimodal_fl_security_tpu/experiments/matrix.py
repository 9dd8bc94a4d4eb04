"""Experiment matrix: attack x defense x distribution x seed sweeps.

Parity with the reference's two matrix runners:
  - ``ExperimentMatrix`` / ``BatchExperimentRunner`` with skip-existing
    resume and summary emitters (reference: experiments/experiment_matrix.py:
    27-207);
  - the paper matrix — baseline + {attacks} x {defenses} x {iid, dirichlet
    alpha in {0.5, 0.1}} over multiple seeds with per-cell mean/std
    aggregation and LaTeX/Markdown tables (reference:
    experiments/run_paper_experiments.py:35-124, 205-312, 356-391).

Unlike the reference, alpha is actually applied per cell (SURVEY.md §2.9-1).
"""

from __future__ import annotations

import dataclasses
import datetime
import glob
import json
import logging
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import ExperimentRunner

logger = logging.getLogger(__name__)

# Attack grid (reference: run_paper_experiments.py:74-97).
ATTACK_GRID: Dict[str, Dict[str, Any]] = {
    "none": {},
    "label_flip": {"source_class": 7, "target_class": 1, "poison_ratio": 0.5},
    "backdoor": {"target_class": 0, "poison_ratio": 0.1, "trigger_size": 3},
    "model_replacement": {"scale_factor": 10.0},
    "scaling": {"scale": 10.0},
    "ipm": {"epsilon": 0.5},
}

# Defense grid (reference: run_paper_experiments.py:100-124).
DEFENSE_GRID: Dict[str, Dict[str, Any]] = {
    "none": {},
    "krum": {"num_malicious": 1},
    "multi_krum": {"num_malicious": 1, "multi_k": 3},
    "trimmed_mean": {"trim_ratio": 0.1},
    "median": {},
    "fltrust": {},
    "dp_sgd": {"clip_norm": 1.0, "noise_multiplier": 0.1},
    "norm_bounding": {"max_norm": 50.0},
}


@dataclass
class ExperimentMatrix:
    """Grid definition (reference: experiment_matrix.py:27-97)."""

    datasets: List[str] = field(default_factory=lambda: ["synthetic"])
    attacks: List[str] = field(
        default_factory=lambda: ["none", "label_flip", "backdoor"]
    )
    defenses: List[str] = field(
        default_factory=lambda: ["none", "krum", "trimmed_mean"]
    )
    partitions: List[str] = field(default_factory=lambda: ["iid"])
    alphas: List[float] = field(default_factory=lambda: [0.5])
    client_counts: List[int] = field(default_factory=lambda: [5])
    malicious_ratio: float = 0.2  # reference: experiment_matrix.py:60
    seeds: List[int] = field(default_factory=lambda: [42])
    num_rounds: int = 5
    local_epochs: int = 2
    batch_size: int = 32
    learning_rate: float = 0.01
    dataset_params: Dict[str, Any] = field(default_factory=dict)

    def cells(self) -> List[ExperimentConfig]:
        configs = []
        for dataset in self.datasets:
            for num_clients in self.client_counts:
                n_mal = max(1, int(num_clients * self.malicious_ratio))
                for attack in self.attacks:
                    for defense in self.defenses:
                        for partition in self.partitions:
                            alphas = self.alphas if partition != "iid" else [0.5]
                            for alpha in alphas:
                                for seed in self.seeds:
                                    configs.append(
                                        self._make_config(
                                            dataset, num_clients, n_mal, attack,
                                            defense, partition, alpha, seed,
                                        )
                                    )
        return configs

    def _make_config(self, dataset, num_clients, n_mal, attack, defense,
                     partition, alpha, seed) -> ExperimentConfig:
        dist = partition if partition == "iid" else f"{partition}{alpha}"
        name = f"{attack}_{defense}_{dataset}_{dist}_{num_clients}c_s{seed}"
        attack_enabled = attack != "none"
        return ExperimentConfig(
            name=name,
            dataset=dataset,
            num_clients=num_clients,
            num_rounds=self.num_rounds,
            local_epochs=self.local_epochs,
            batch_size=self.batch_size,
            learning_rate=self.learning_rate,
            partition=partition,
            alpha=alpha,
            seed=seed,
            attack_enabled=attack_enabled,
            attack_type=attack,
            malicious_clients=list(range(n_mal)) if attack_enabled else [],
            attack_params=dict(ATTACK_GRID.get(attack, {})),
            defense_enabled=defense != "none",
            defense_type=defense,
            num_malicious_assumed=n_mal,
            defense_params=dict(DEFENSE_GRID.get(defense, {})),
            dataset_params=dict(self.dataset_params),
        )


class BatchExperimentRunner:
    """Runs a matrix with skip-existing resume
    (reference: experiment_matrix.py:109-158)."""

    def __init__(self, results_dir: str = "results/matrix"):
        self.results_dir = results_dir
        self.runner = ExperimentRunner(results_dir)

    def _existing(self, name: str) -> Optional[str]:
        hits = glob.glob(os.path.join(self.results_dir, f"{name}_*.json"))
        return hits[0] if hits else None

    def run_matrix(self, matrix: ExperimentMatrix,
                   resume: bool = True) -> List[Dict[str, Any]]:
        os.makedirs(self.results_dir, exist_ok=True)
        cells = matrix.cells()
        results = []
        for i, cfg in enumerate(cells):
            existing = self._existing(cfg.name) if resume else None
            if existing:
                logger.info("[%d/%d] skip (exists): %s", i + 1, len(cells),
                            cfg.name)
                with open(existing) as f:
                    results.append(json.load(f))
                continue
            logger.info("[%d/%d] run: %s", i + 1, len(cells), cfg.name)
            try:
                res = self.runner.run_simulation(cfg)
                stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
                path = os.path.join(self.results_dir, f"{cfg.name}_{stamp}.json")
                res.save(path)
                results.append(res.to_dict())
            except Exception as e:  # record the error, keep sweeping
                # (reference: experiment_matrix.py:140-147)
                logger.exception("experiment %s failed", cfg.name)
                results.append({"config": cfg.to_dict(), "error": str(e)})
        self._write_summary(results)
        return results

    def _write_summary(self, results: List[Dict[str, Any]]) -> None:
        """Aggregated JSON + markdown summary table
        (reference: experiment_matrix.py:160-207)."""
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        agg_path = os.path.join(self.results_dir, f"matrix_results_{stamp}.json")
        with open(agg_path, "w") as f:
            json.dump(results, f, indent=2, default=str)

        lines = [
            "# Experiment Matrix Summary",
            "",
            "| Experiment | Accuracy | ASR | Time (s) |",
            "|---|---|---|---|",
        ]
        for r in results:
            name = r.get("config", {}).get("name", "?")
            if "error" in r:
                lines.append(f"| {name} | ERROR | - | - |")
                continue
            acc = r.get("final_accuracy", float("nan"))
            asr = r.get("attack_success_rate")
            asr_s = f"{asr:.4f}" if asr is not None else "-"
            t = r.get("training_time_seconds", 0.0)
            lines.append(f"| {name} | {acc:.4f} | {asr_s} | {t:.1f} |")
        with open(os.path.join(self.results_dir, "summary_table.md"), "w") as f:
            f.write("\n".join(lines) + "\n")


def aggregate_seed_cells(results: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Group per-seed runs of one cell, report mean/std
    (reference: run_paper_experiments.py:205-220)."""
    cells: Dict[str, List[Dict]] = {}
    for r in results:
        if "error" in r:
            continue
        cfg = r["config"]
        key = "_".join([
            cfg.get("attack_type", "none"), cfg.get("defense_type", "none"),
            cfg.get("dataset", "?"), cfg.get("partition", "iid"),
            str(cfg.get("alpha", "")), str(cfg.get("num_clients", "")),
        ])
        cells.setdefault(key, []).append(r)
    out = []
    for key, runs in cells.items():
        accs = np.array([r["final_accuracy"] for r in runs], dtype=float)
        asrs = [r.get("attack_success_rate") for r in runs]
        asrs = np.array([a for a in asrs if a is not None], dtype=float)
        row = {
            "cell": key,
            "num_seeds": len(runs),
            "accuracy_mean": float(accs.mean()),
            "accuracy_std": float(accs.std(ddof=1)) if len(accs) > 1 else 0.0,
        }
        if len(asrs):
            row["asr_mean"] = float(asrs.mean())
            row["asr_std"] = float(asrs.std(ddof=1)) if len(asrs) > 1 else 0.0
        out.append(row)
    return out
