"""Result table emitters: Markdown and LaTeX.

Parity with the reference's table generators (reference:
experiments/run_paper_experiments.py:223-283 and
experiments/visualize.py:116-145).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional


def markdown_table(rows: List[Dict[str, Any]],
                   columns: Optional[List[str]] = None) -> str:
    if not rows:
        return "(no results)\n"
    columns = columns or list(rows[0].keys())
    lines = ["| " + " | ".join(columns) + " |",
             "|" + "|".join(["---"] * len(columns)) + "|"]
    for row in rows:
        cells = []
        for c in columns:
            v = row.get(c, "")
            cells.append(f"{v:.4f}" if isinstance(v, float) else str(v))
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines) + "\n"


def latex_table(rows: List[Dict[str, Any]],
                columns: Optional[List[str]] = None,
                caption: str = "Experiment results",
                label: str = "tab:results") -> str:
    """Booktabs-style LaTeX table (reference: run_paper_experiments.py:223-265)."""
    if not rows:
        return "% no results\n"
    columns = columns or list(rows[0].keys())

    def esc(s: str) -> str:
        return str(s).replace("_", r"\_").replace("%", r"\%")

    lines = [
        r"\begin{table}[t]",
        r"\centering",
        rf"\caption{{{esc(caption)}}}",
        rf"\label{{{label}}}",
        r"\begin{tabular}{" + "l" * len(columns) + "}",
        r"\toprule",
        " & ".join(esc(c) for c in columns) + r" \\",
        r"\midrule",
    ]
    for row in rows:
        cells = []
        for c in columns:
            v = row.get(c, "")
            cells.append(f"{v:.4f}" if isinstance(v, float) else esc(v))
        lines.append(" & ".join(cells) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    return "\n".join(lines) + "\n"


def results_to_rows(results: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Flatten result dicts into table rows (the reference's summary layout:
    experiment | accuracy | ASR | time)."""
    rows = []
    for r in results:
        cfg = r.get("config", {})
        asr = r.get("attack_success_rate")
        rows.append({
            "experiment": cfg.get("name", "?"),
            "attack": cfg.get("attack_type", "none"),
            "defense": cfg.get("defense_type", "none"),
            "accuracy": float(r.get("final_accuracy", float("nan"))),
            "asr": float(asr) if asr is not None else "-",
            "time_s": float(r.get("training_time_seconds", 0.0)),
        })
    return rows
