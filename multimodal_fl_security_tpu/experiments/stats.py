"""Statistical analysis of experiment results.

Parity with the reference (reference: experiments/statistical_tests.py):
t-distribution confidence intervals (:15-34), paired/independent t-tests
with Cohen's d and qualitative effect-size labels (:37-103), the 3-way
baseline/attack/attack+defense comparison (:106-143), and a results-dir
analyzer emitting a markdown report (:146-228).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import stats as sps


def compute_confidence_interval(values: Sequence[float],
                                confidence: float = 0.95
                                ) -> Tuple[float, float, float]:
    """(mean, lower, upper) via the t distribution."""
    vals = np.asarray(list(values), dtype=float)
    mean = float(vals.mean())
    if len(vals) < 2:
        return mean, mean, mean
    sem = sps.sem(vals)
    half = sem * sps.t.ppf((1 + confidence) / 2.0, len(vals) - 1)
    return mean, mean - float(half), mean + float(half)


def _effect_label(d: float) -> str:
    d = abs(d)
    if d < 0.2:
        return "negligible"
    if d < 0.5:
        return "small"
    if d < 0.8:
        return "medium"
    return "large"


def paired_t_test(a: Sequence[float], b: Sequence[float],
                  alpha: float = 0.05) -> Dict[str, Any]:
    a, b = np.asarray(a, float), np.asarray(b, float)
    t, p = sps.ttest_rel(a, b)
    diff = a - b
    d = diff.mean() / diff.std(ddof=1) if diff.std(ddof=1) > 0 else 0.0
    return {
        "t_statistic": float(t), "p_value": float(p),
        "significant": bool(p < alpha), "cohens_d": float(d),
        "effect_size": _effect_label(d),
        "mean_difference": float(diff.mean()),
    }


def independent_t_test(a: Sequence[float], b: Sequence[float],
                       alpha: float = 0.05) -> Dict[str, Any]:
    a, b = np.asarray(a, float), np.asarray(b, float)
    t, p = sps.ttest_ind(a, b)
    pooled = np.sqrt(
        ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1))
        / max(len(a) + len(b) - 2, 1)
    )
    d = (a.mean() - b.mean()) / pooled if pooled > 0 else 0.0
    return {
        "t_statistic": float(t), "p_value": float(p),
        "significant": bool(p < alpha), "cohens_d": float(d),
        "effect_size": _effect_label(d),
        "mean_difference": float(a.mean() - b.mean()),
    }


def compare_scenarios(baseline: Sequence[float], attack: Sequence[float],
                      defended: Sequence[float]) -> Dict[str, Any]:
    """3-way comparison: attack impact + defense recovery
    (reference: statistical_tests.py:106-143)."""
    out: Dict[str, Any] = {
        "baseline_mean": float(np.mean(baseline)),
        "attack_mean": float(np.mean(attack)),
        "defended_mean": float(np.mean(defended)),
        "attack_impact": independent_t_test(baseline, attack),
        "defense_recovery": independent_t_test(defended, attack),
    }
    drop = out["baseline_mean"] - out["attack_mean"]
    recovered = out["defended_mean"] - out["attack_mean"]
    out["recovery_ratio"] = float(recovered / drop) if abs(drop) > 1e-9 else None
    return out


def analyze_results_dir(results_dir: str,
                        report_path: Optional[str] = None) -> Dict[str, Any]:
    """Load all result JSONs, group into cells, CI everything, emit a
    markdown report (reference: statistical_tests.py:146-228)."""
    from multimodal_fl_security_tpu.experiments.visualize import load_results

    records: List[Dict] = load_results(results_dir)

    cells: Dict[str, List[Dict]] = {}
    for r in records:
        cfg = r.get("config", {})
        key = f"{cfg.get('attack_type', 'none')}/{cfg.get('defense_type', 'none')}"
        cells.setdefault(key, []).append(r)

    analysis: Dict[str, Any] = {"num_experiments": len(records), "cells": {}}
    lines = ["# Statistical Analysis", "",
             f"Experiments analyzed: {len(records)}", "",
             "| Attack/Defense | n | Accuracy (95% CI) | ASR (95% CI) |",
             "|---|---|---|---|"]
    for key in sorted(cells):
        runs = cells[key]
        accs = [r["final_accuracy"] for r in runs]
        m, lo, hi = compute_confidence_interval(accs)
        asrs = [r["attack_success_rate"] for r in runs
                if r.get("attack_success_rate") is not None]
        cell: Dict[str, Any] = {
            "n": len(runs),
            "accuracy": {"mean": m, "ci_low": lo, "ci_high": hi},
        }
        asr_s = "-"
        if asrs:
            am, alo, ahi = compute_confidence_interval(asrs)
            cell["asr"] = {"mean": am, "ci_low": alo, "ci_high": ahi}
            asr_s = f"{am:.4f} [{alo:.4f}, {ahi:.4f}]"
        analysis["cells"][key] = cell
        lines.append(
            f"| {key} | {len(runs)} | {m:.4f} [{lo:.4f}, {hi:.4f}] | {asr_s} |"
        )

    if report_path:
        with open(report_path, "w") as f:
            f.write("\n".join(lines) + "\n")
    analysis["report_markdown"] = "\n".join(lines)
    return analysis
