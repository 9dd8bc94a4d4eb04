"""Label-flip efficacy: find and demonstrate the regime where label
flipping WORKS, then the three-way contrast (reference:
docs/attack_taxonomy.md:46-49 targets ASR 40-80% with a 5-30% accuracy
impact — every committed label_flip artifact before round 3 sat at
ASR <= 5% because IID shards outvote the flip).

The effective regime (this script demonstrates it on real sklearn
digits): Dirichlet alpha=2.0 partitioning (ALPHA below; mild
heterogeneity — the committed artifacts are named *_dir20 after it);
the malicious clients are chosen AS the top holders of a source class
they majority-own (~70%, calibrated so honest clients keep enough true
source data for a defense to win), and they flip 100% of their source
samples. The flipped majority outvotes the honest remainder, so the
undefended global model learns source -> target.

Writes per-run JSON + a summary table to artifacts/label_flip_efficacy/.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from multimodal_fl_security_tpu.data.datasets import load_dataset
from multimodal_fl_security_tpu.data.partition import partition_data
from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import ExperimentRunner

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "label_flip_efficacy",
)

NUM_CLIENTS, NUM_MALICIOUS = 12, 4
ALPHA, SEED = 2.0, 42

BASE = dict(
    dataset="digits", num_clients=NUM_CLIENTS, num_rounds=40,
    local_epochs=2, batch_size=32, learning_rate=0.01,
    partition="noniid", alpha=ALPHA, partition_seed=SEED, seed=SEED,
)


def pick_regime():
    """The attack's concentration trick, calibrated: malicious = top
    holders of a source class they MAJORITY-own by SAMPLES (so the flip
    outvotes the honest signal and the undefended weighted mean learns
    source -> target), while every honest client still holds real source
    samples (so an honest-CLIENT majority teaches the true class and a
    coordinate-wise robust aggregator can restore it). Both conditions
    are necessary: at ownership ~100% no defense can possibly win, and
    when most honest clients hold zero source data the coordinate median
    sits among their no-signal updates and never learns the class either
    (both measured dead ends — see the commit history of this script).
    Scans classes for top-NUM_MALICIOUS sample-ownership closest to 70%
    within [0.55, 0.8] with >= 5 honest holders of >= 5 samples, under
    the SAME partition the runner will compute."""
    train = load_dataset("digits", "train")
    parts = partition_data(train.labels, NUM_CLIENTS, "noniid",
                           alpha=ALPHA, seed=SEED)
    best = None
    for src in range(train.num_classes):
        counts = np.array([(train.labels[ix] == src).sum() for ix in parts])
        total = counts.sum()
        if total == 0:
            continue
        order = np.argsort(-counts)[:NUM_MALICIOUS]
        own = counts[order].sum() / total
        honest = np.delete(np.arange(NUM_CLIENTS), order)
        if (counts[honest] >= 5).sum() < 5:
            continue
        if 0.55 <= own <= 0.8 and (best is None or
                                   abs(own - 0.7) < abs(best[2] - 0.7)):
            best = (src, sorted(int(m) for m in order), float(own))
    assert best is not None, "no class in the calibrated ownership band"
    src, mal, own = best
    print(f"source class {src}: malicious {mal} hold {own:.0%} "
          f"(honest clients keep {1 - own:.0%})")
    return src, (src + 2) % train.num_classes, mal, own


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    source, target, malicious, ownership = pick_regime()
    BASE.update(source_class=source, target_class=target)
    attack = dict(attack_enabled=True, attack_type="label_flip",
                  poison_ratio=1.0, malicious_clients=malicious)
    runner = ExperimentRunner(results_dir=OUT_DIR)
    rows = []

    def run(name, **kw):
        cfg = ExperimentConfig(name=name, **{**BASE, **kw})
        res = runner.run_simulation(cfg, save=True)
        asr = res.attack_success_rate
        rows.append((name, res.final_accuracy, asr))
        print(f"{name:40s} MTA={res.final_accuracy:.4f} "
              f"ASR={'-' if asr is None else f'{asr:.4f}'}")
        return res

    clean = run("clean_digits_dir20_12c")
    none_ = run("label_flip_none_digits_12c4m", **attack)
    krum = run("label_flip_krum_digits_12c4m", defense_enabled=True,
               defense_type="krum", num_malicious_assumed=NUM_MALICIOUS,
               **attack)
    median = run("label_flip_median_digits_12c4m", defense_enabled=True,
                 defense_type="median", **attack)
    trimmed = run("label_flip_trimmed_digits_12c4m", defense_enabled=True,
                  defense_type="trimmed_mean",
                  trim_ratio=NUM_MALICIOUS / NUM_CLIENTS, **attack)

    # The reference's design-target regime (attack_taxonomy.md:46-49).
    assert none_.attack_success_rate > 0.3, (
        f"label flip failed to bite: ASR {none_.attack_success_rate}"
    )
    drop = clean.final_accuracy - none_.final_accuracy
    best_defended = min(krum.attack_success_rate, median.attack_success_rate,
                        trimmed.attack_success_rate)
    assert best_defended < none_.attack_success_rate / 3, (
        f"defense failed: {best_defended} vs undefended "
        f"{none_.attack_success_rate}"
    )

    with open(os.path.join(OUT_DIR, "summary_table.md"), "w") as f:
        f.write(
            f"# Label-flip efficacy — digits, dirichlet a={ALPHA}, "
            f"{NUM_MALICIOUS}/{NUM_CLIENTS} malicious own "
            f"{ownership:.0%} of class {source}, flip p=1.0, "
            f"{BASE['num_rounds']} rounds\n\n"
        )
        f.write("| Experiment | MTA | ASR (source->target flip rate) |\n")
        f.write("|---|---|---|\n")
        for name, mta, asr in rows:
            f.write(f"| {name} | {mta:.4f} | "
                    f"{'-' if asr is None else f'{asr:.4f}'} |\n")
        f.write(
            f"\nRegime check: undefended ASR "
            f"{none_.attack_success_rate:.3f} > 0.3 with MTA impact "
            f"{drop:+.3f} (reference target band: ASR 40-80%, acc drop "
            f"5-30%, docs/attack_taxonomy.md:46-49); best defended ASR "
            f"{best_defended:.3f} < undefended/3.\n"
        )
    with open(os.path.join(OUT_DIR, "regime.json"), "w") as f:
        json.dump({
            "malicious_clients": malicious,
            "source_class_ownership": ownership,
            "asr_undefended": none_.attack_success_rate,
            "asr_krum": krum.attack_success_rate,
            "asr_median": median.attack_success_rate,
            "asr_trimmed_mean": trimmed.attack_success_rate,
            "mta_clean": clean.final_accuracy,
            "mta_attacked": none_.final_accuracy,
        }, f, indent=2)
    print("artifact written to", OUT_DIR)


if __name__ == "__main__":
    main()
