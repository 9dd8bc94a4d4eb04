"""Results analysis (the reference's notebook 06): statistics, scenario
comparison, plots over a results directory."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.stats import (
    analyze_results_dir,
    compare_scenarios,
)
from multimodal_fl_security_tpu.experiments.visualize import (
    load_results,
    plot_accuracy_curves,
    plot_attack_defense_heatmap,
)


def main(results_dir: str = "results/paper"):
    analysis = analyze_results_dir(results_dir)
    print(analysis["report_markdown"])
    results = load_results(results_dir)
    if results:
        print("wrote", plot_accuracy_curves(results))
        print("wrote", plot_attack_defense_heatmap(results))
        print("wrote", plot_attack_defense_heatmap(
            results, metric="attack_success_rate", out_path="asr_heatmap.png"))

    # Example 3-way comparison when the cells exist.
    def accs(attack, defense):
        return [r["final_accuracy"] for r in results
                if r["config"].get("attack_type") == attack
                and r["config"].get("defense_type") == defense]

    baseline, attacked, defended = (accs("none", "none"),
                                    accs("backdoor", "none"),
                                    accs("backdoor", "krum"))
    if len(baseline) > 1 and len(attacked) > 1 and len(defended) > 1:
        print(compare_scenarios(baseline, attacked, defended))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "results/paper")
