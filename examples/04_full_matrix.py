"""Full attack x defense matrix sweep (the reference's notebook 04):
the paper quick preset with resume + analysis tables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.paper import run_paper_experiments
from multimodal_fl_security_tpu.experiments.stats import analyze_results_dir


def main():
    out = run_paper_experiments(preset="quick", results_dir="results/paper")
    print(out["markdown"])
    analysis = analyze_results_dir("results/paper")
    print(analysis["report_markdown"])


if __name__ == "__main__":
    main()
