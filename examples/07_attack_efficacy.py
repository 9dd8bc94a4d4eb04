"""Attack-efficacy demonstration: the three-way contrast that is the
scientific point of the framework (reference: docs/attack_taxonomy.md:73-76
documents the target regime — backdoor ASR 80-99% with MTA drop < 3%).

Runs, on real data (sklearn digits, 8x8):
  1. clean baseline                 -> MTA reference point
  2. strong backdoor, no defense    -> ASR >= 0.8, MTA drop < 3%
  3. same attack + Krum             -> ASR ~ 0, MTA intact
  4. same attack + trimmed-mean / median -> partial/strong suppression

and writes per-run JSON + a summary table to artifacts/attack_efficacy/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import ExperimentRunner

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "attack_efficacy",
)

# The successful-attack regime: 2/5 colluding clients, poison_ratio 0.8,
# 30 rounds. (1/5 at ratio 0.1 over 5 rounds — the reference's quick
# config — never implants the trigger; see BASELINE.md ASR 9.15%. 30
# rounds keeps undefended ASR >= 0.8 across seeds/inits; at 20 it sits
# near 0.73-0.99 depending on the init draw.)
BASE = dict(
    dataset="digits", num_clients=5, num_rounds=30, local_epochs=2,
    batch_size=32, learning_rate=0.01, partition="iid", seed=42,
    target_class=0, trigger_size=3,
)
ATTACK = dict(
    attack_enabled=True, attack_type="backdoor",
    poison_ratio=0.8, malicious_clients=[0, 1],
)


def main():
    runner = ExperimentRunner(results_dir=OUT_DIR)
    rows = []

    def run(name, **kw):
        cfg = ExperimentConfig(name=name, **{**BASE, **kw})
        res = runner.run_simulation(cfg, save=True)
        asr = res.attack_success_rate
        rows.append((name, res.final_accuracy, asr))
        print(f"{name:32s} MTA={res.final_accuracy:.4f} "
              f"ASR={'-' if asr is None else f'{asr:.4f}'}")
        return res

    clean = run("clean_digits_iid_5c")
    none_ = run("backdoor_none_digits_5c2m", **ATTACK)
    krum = run("backdoor_krum_digits_5c2m", defense_enabled=True,
               defense_type="krum", num_malicious_assumed=1, **ATTACK)
    run("backdoor_trimmed_mean_digits_5c2m", defense_enabled=True,
        defense_type="trimmed_mean", trim_ratio=0.4, **ATTACK)
    run("backdoor_median_digits_5c2m", defense_enabled=True,
        defense_type="median", **ATTACK)
    # Beyond-reference: FoolsGold targets exactly this colluding-sybil
    # regime (the 2 poisoned clients push similar updates every round).
    fg = run("backdoor_foolsgold_digits_5c2m", defense_enabled=True,
             defense_type="foolsgold", **ATTACK)
    assert fg.attack_success_rate < 0.1, "foolsgold failed on its own regime"

    # The regime the framework is built to demonstrate:
    assert none_.attack_success_rate >= 0.8, "attack failed to implant"
    assert clean.final_accuracy - none_.final_accuracy < 0.03, \
        "attack is not stealthy (MTA drop >= 3%)"
    assert krum.attack_success_rate < 0.05, "krum failed to suppress"
    assert krum.final_accuracy > clean.final_accuracy - 0.03, \
        "krum wrecked clean accuracy"

    lines = [
        "# Attack efficacy — digits, backdoor p=0.8, 2/5 malicious, 30 rounds",
        "",
        "| Experiment | MTA | ASR |",
        "|---|---|---|",
    ]
    for name, mta, asr in rows:
        lines.append(f"| {name} | {mta:.4f} | "
                     f"{'-' if asr is None else f'{asr:.4f}'} |")
    lines += [
        "",
        "Regime check: undefended ASR >= 0.8 with MTA drop < 3% vs clean; "
        "Krum suppresses ASR below 0.05 with MTA intact "
        "(reference target: docs/attack_taxonomy.md:73-76).",
    ]
    with open(os.path.join(OUT_DIR, "summary_table.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {OUT_DIR}/summary_table.md")


if __name__ == "__main__":
    main()
