"""Command-line entry points.

Covers the reference's root scripts (SURVEY.md §2.7): single-experiment
runs (run_experiment.py), matrix sweeps with resume
(run_full_experiments.py --continue, experiment_matrix.py), quick sanity
gates (quick_test.py), and results analysis (statistical_tests.py,
visualize.py) — as subcommands of one CLI:

    python -m multimodal_fl_security_tpu.experiments.cli run --config cfg.yaml
    python -m multimodal_fl_security_tpu.experiments.cli matrix --quick
    python -m multimodal_fl_security_tpu.experiments.cli quick-test
    python -m multimodal_fl_security_tpu.experiments.cli analyze results/
    python -m multimodal_fl_security_tpu.experiments.cli eda --dataset synthetic
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time


def cmd_run(args) -> int:
    from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
    from multimodal_fl_security_tpu.experiments.runner import ExperimentRunner

    if args.config:
        from multimodal_fl_security_tpu.utils.yaml_config import load_config

        cfg = load_config(args.config)
    else:
        cfg = ExperimentConfig()
    for field in ("dataset", "num_clients", "num_rounds", "seed",
                  "attack_type", "defense_type", "partition"):
        v = getattr(args, field, None)
        if v is not None:
            setattr(cfg, field, v)
    if args.attack_type and args.attack_type != "none":
        cfg.attack_enabled = True
        if not cfg.malicious_clients:
            cfg.malicious_clients = list(
                range(max(1, int(cfg.num_clients * 0.2)))
            )
        # The defense must assume the REAL attacker count (same contract
        # as matrix.py) — leaving the dataclass default of 1 would
        # silently mis-parameterize krum/trimmed-mean against colluders.
        cfg.num_malicious_assumed = max(
            cfg.num_malicious_assumed, len(cfg.malicious_clients)
        )
    if args.defense_type and args.defense_type != "none":
        cfg.defense_enabled = True
    runner = ExperimentRunner(args.results_dir)
    res = runner.run_simulation(cfg, save=True)
    print(json.dumps({"final_accuracy": res.final_accuracy,
                      "attack_success_rate": res.attack_success_rate,
                      "training_time_seconds": res.training_time_seconds}))
    return 0


def cmd_matrix(args) -> int:
    from multimodal_fl_security_tpu.experiments.matrix import (
        BatchExperimentRunner,
        ExperimentMatrix,
        aggregate_seed_cells,
    )

    if args.quick:
        # --quick is a fixed preset; refusing contradictory flags beats
        # silently running a different experiment than the user asked for.
        overridden = [
            flag for flag, default in (
                ("--attacks", "none,label_flip,backdoor"),
                ("--defenses", "none,krum,trimmed_mean,median"),
                ("--seeds", "42,123,456"),
            ) if getattr(args, flag[2:].replace("-", "_")) != default
        ]
        if args.num_rounds != 5:
            overridden.append("--num-rounds")
        if overridden:
            raise SystemExit(
                f"--quick is a fixed preset and ignores {overridden}; "
                "drop --quick to run a custom grid"
            )
        matrix = ExperimentMatrix(
            datasets=[args.dataset],
            attacks=["none", "label_flip", "backdoor"],
            defenses=["none", "krum", "trimmed_mean"],
            num_rounds=3, seeds=[42],
            dataset_params={"num_train": 2000, "num_test": 500},
        )
    else:
        matrix = ExperimentMatrix(
            datasets=[args.dataset],
            attacks=list(args.attacks.split(",")),
            defenses=list(args.defenses.split(",")),
            partitions=["iid", "dirichlet"],
            alphas=[0.5, 0.1],
            seeds=[int(s) for s in args.seeds.split(",")],
            num_rounds=args.num_rounds,
        )
    runner = BatchExperimentRunner(args.results_dir)
    results = runner.run_matrix(matrix, resume=not args.no_resume)
    print(json.dumps(aggregate_seed_cells(results), indent=2))
    return 0


def cmd_quick_test(args) -> int:
    """Fast sanity gate (reference: quick_test.py:16-95): one small run must
    clear an accuracy threshold on the learnable synthetic task."""
    from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    t0 = time.time()
    res = run_simulation(ExperimentConfig(
        name="quick_test", dataset="synthetic", num_clients=5, num_rounds=3,
        local_epochs=2, learning_rate=0.05,
        dataset_params={"num_train": 2000, "num_test": 500},
    ))
    ok = res.final_accuracy > 0.5
    print(f"accuracy={res.final_accuracy:.4f} "
          f"({time.time() - t0:.1f}s) -> {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def cmd_paper(args) -> int:
    from multimodal_fl_security_tpu.experiments.paper import (
        run_paper_experiments,
    )

    out = run_paper_experiments(
        preset=args.preset, results_dir=args.results_dir,
        full_distributions=args.full_distributions,
        resume=not args.no_resume,
    )
    print(out["markdown"])
    print(f"{out['num_experiments']} experiments -> {args.results_dir}")
    return 0


def cmd_analyze(args) -> int:
    from multimodal_fl_security_tpu.experiments.stats import analyze_results_dir
    from multimodal_fl_security_tpu.experiments.visualize import (
        load_results,
        plot_accuracy_curves,
        plot_attack_defense_heatmap,
    )

    analysis = analyze_results_dir(args.results_dir,
                                   report_path=args.report)
    print(analysis["report_markdown"])
    if args.plots:
        results = load_results(args.results_dir)
        if results:
            print("wrote", plot_accuracy_curves(results))
            print("wrote", plot_attack_defense_heatmap(results))
    return 0


def cmd_eda(args) -> int:
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.experiments.eda import generate_report

    ds = load_dataset(args.dataset, "train")
    print("report:", generate_report(ds, num_clients=args.num_clients,
                                     out_dir=args.out_dir))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="multimodal_fl_security_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run one experiment")
    r.add_argument("--config", help="YAML config (nested or flat layout)")
    r.add_argument("--dataset")
    r.add_argument("--num-clients", dest="num_clients", type=int)
    r.add_argument("--num-rounds", dest="num_rounds", type=int)
    r.add_argument("--seed", type=int)
    r.add_argument("--attack-type", dest="attack_type")
    r.add_argument("--defense-type", dest="defense_type")
    r.add_argument("--partition")
    r.add_argument("--results-dir", default="results")
    r.set_defaults(fn=cmd_run)

    m = sub.add_parser("matrix", help="run an attack x defense matrix")
    m.add_argument("--dataset", default="synthetic")
    m.add_argument("--attacks", default="none,label_flip,backdoor")
    m.add_argument("--defenses", default="none,krum,trimmed_mean,median")
    m.add_argument("--seeds", default="42,123,456")
    m.add_argument("--num-rounds", dest="num_rounds", type=int, default=5)
    m.add_argument("--quick", action="store_true")
    m.add_argument("--no-resume", action="store_true")
    m.add_argument("--results-dir", default="results/matrix")
    m.set_defaults(fn=cmd_matrix)

    q = sub.add_parser("quick-test", help="fast sanity gate")
    q.set_defaults(fn=cmd_quick_test)

    pp = sub.add_parser("paper", help="paper attack x defense matrix")
    pp.add_argument("--preset", default="quick",
                    choices=["quick", "mnist", "cub200", "digits_full"])
    pp.add_argument("--full-distributions", action="store_true",
                    help="add dirichlet alpha in {0.5, 0.1} cells")
    pp.add_argument("--results-dir", default="results/paper")
    pp.add_argument("--no-resume", action="store_true")
    pp.set_defaults(fn=cmd_paper)

    a = sub.add_parser("analyze", help="statistical analysis of results dir")
    a.add_argument("results_dir")
    a.add_argument("--report", default=None)
    a.add_argument("--plots", action="store_true")
    a.set_defaults(fn=cmd_analyze)

    e = sub.add_parser("eda", help="dataset/partition EDA report")
    e.add_argument("--dataset", default="synthetic")
    e.add_argument("--num-clients", dest="num_clients", type=int, default=10)
    e.add_argument("--out-dir", dest="out_dir", default="eda_report")
    e.set_defaults(fn=cmd_eda)
    return p


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    args = build_parser().parse_args(argv)
    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
