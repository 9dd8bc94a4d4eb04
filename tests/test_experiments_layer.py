"""Experiments-layer tests: matrix resume, stats, emitters, tracking, YAML
config, EDA — the reference's L5/L6 behaviors (SURVEY.md §2.7)."""

import json
import os

import pytest

from multimodal_fl_security_tpu.experiments.emitters import (
    latex_table,
    markdown_table,
    results_to_rows,
)
from multimodal_fl_security_tpu.experiments.matrix import (
    BatchExperimentRunner,
    ExperimentMatrix,
    aggregate_seed_cells,
)
from multimodal_fl_security_tpu.experiments.stats import (
    analyze_results_dir,
    compare_scenarios,
    compute_confidence_interval,
    independent_t_test,
    paired_t_test,
)
from multimodal_fl_security_tpu.utils.yaml_config import (
    config_from_dict,
    load_config,
    save_config,
)


def _fake_result(tmpdir, name, acc, asr=None, attack="none", defense="none",
                 stamp="20260101_000000"):
    res = {
        "config": {"name": name, "attack_type": attack,
                   "defense_type": defense, "dataset": "synthetic",
                   "partition": "iid", "alpha": 0.5, "num_clients": 5},
        "round_accuracies": [acc], "round_losses": [0.5],
        "final_accuracy": acc, "final_loss": 0.5,
        "attack_success_rate": asr, "training_time_seconds": 1.0,
        "timestamp": "t",
    }
    path = os.path.join(tmpdir, f"{name}_{stamp}.json")
    with open(path, "w") as f:
        json.dump(res, f)
    return res


# ------------------------------------------------------------------ matrix ---
def test_matrix_cell_enumeration():
    m = ExperimentMatrix(attacks=["none", "backdoor"],
                         defenses=["none", "krum"],
                         partitions=["iid", "dirichlet"], alphas=[0.5, 0.1],
                         seeds=[1, 2])
    cells = m.cells()
    # iid contributes 1 alpha, dirichlet contributes 2: (1+2)*2*2*2 = 24
    assert len(cells) == 24
    names = {c.name for c in cells}
    assert len(names) == 24  # unique names
    bd = [c for c in cells if c.attack_type == "backdoor"][0]
    assert bd.attack_enabled and bd.malicious_clients == [0]


def test_matrix_resume_skips_existing(tmp_path):
    runner = BatchExperimentRunner(str(tmp_path))
    _fake_result(str(tmp_path), "none_none_synthetic_iid_5c_s42", 0.9)
    m = ExperimentMatrix(attacks=["none"], defenses=["none"], seeds=[42])
    results = runner.run_matrix(m, resume=True)
    # The lone cell already exists -> loaded, not re-run (fast).
    assert len(results) == 1
    assert results[0]["final_accuracy"] == 0.9
    assert os.path.exists(os.path.join(str(tmp_path), "summary_table.md"))


def test_aggregate_seed_cells():
    rows = [
        {"config": {"attack_type": "a", "defense_type": "d",
                    "dataset": "s", "partition": "iid", "alpha": 0.5,
                    "num_clients": 5},
         "final_accuracy": acc, "attack_success_rate": 0.1}
        for acc in (0.8, 0.9)
    ]
    agg = aggregate_seed_cells(rows)
    assert len(agg) == 1
    assert agg[0]["num_seeds"] == 2
    assert agg[0]["accuracy_mean"] == pytest.approx(0.85)
    assert agg[0]["asr_mean"] == pytest.approx(0.1)


# ------------------------------------------------------------------- stats ---
def test_confidence_interval():
    m, lo, hi = compute_confidence_interval([0.8, 0.85, 0.9])
    assert lo < m < hi
    assert m == pytest.approx(0.85)


def test_t_tests_and_effect_sizes():
    a = [0.9, 0.91, 0.89, 0.92, 0.9]
    b = [0.5, 0.52, 0.48, 0.51, 0.5]
    pt = paired_t_test(a, b)
    it = independent_t_test(a, b)
    assert pt["significant"] and it["significant"]
    assert it["effect_size"] == "large"
    assert it["mean_difference"] == pytest.approx(0.402, abs=1e-3)


def test_compare_scenarios_recovery():
    out = compare_scenarios(baseline=[0.9, 0.91], attack=[0.5, 0.52],
                            defended=[0.85, 0.86])
    assert out["recovery_ratio"] == pytest.approx(0.873, abs=0.01)


def test_analyze_results_dir(tmp_path):
    d = str(tmp_path)
    _fake_result(d, "a1", 0.9, attack="backdoor", defense="krum", asr=0.01,
                 stamp="1")
    _fake_result(d, "a2", 0.92, attack="backdoor", defense="krum", asr=0.02,
                 stamp="2")
    _fake_result(d, "b1", 0.95, stamp="3")
    analysis = analyze_results_dir(d, report_path=os.path.join(d, "rep.md"))
    assert analysis["num_experiments"] == 3
    assert "backdoor/krum" in analysis["cells"]
    assert analysis["cells"]["backdoor/krum"]["n"] == 2
    assert os.path.exists(os.path.join(d, "rep.md"))


# ---------------------------------------------------------------- emitters ---
def test_markdown_and_latex_tables():
    rows = results_to_rows([
        {"config": {"name": "e1", "attack_type": "backdoor",
                    "defense_type": "krum"},
         "final_accuracy": 0.9866, "attack_success_rate": 0.0016,
         "training_time_seconds": 10.0},
    ])
    md = markdown_table(rows)
    assert "| e1 |" in md and "0.9866" in md
    tex = latex_table(rows, caption="Results")
    assert r"\toprule" in tex and r"backdoor" in tex
    assert r"\_" not in tex.splitlines()[0]


# -------------------------------------------------------------------- yaml ---
def test_yaml_nested_and_flat_configs(tmp_path):
    nested = {
        "experiment": {"name": "exp1", "seed": 7},
        "server": {"num_rounds": 3, "num_clients": 8},
        "client": {"learning_rate": 0.1},
        "data": {"dataset": "synthetic", "partition": "dirichlet",
                 "alpha": 0.1},
        "attack": {"enabled": True, "type": "backdoor",
                   "trigger_position": "center"},
        "defense": {"enabled": True, "type": "krum", "num_malicious": 2},
        "model": {"name": "resnet18", "norm": "batch",
                  "pretrained_path": "/x/ckpt.pkl",
                  "freeze_backbone": True},
    }
    cfg = config_from_dict(nested)
    assert cfg.name == "exp1" and cfg.seed == 7
    assert cfg.num_rounds == 3 and cfg.num_clients == 8
    assert cfg.alpha == 0.1 and cfg.partition == "dirichlet"
    assert cfg.attack_enabled and cfg.attack_type == "backdoor"
    assert cfg.attack_params["trigger_position"] == "center"
    assert cfg.num_malicious_assumed == 2
    # model section: name maps, transfer fields map, the rest are
    # model-factory kwargs
    assert cfg.model == "resnet18"
    assert cfg.model_params == {"norm": "batch"}
    assert cfg.pretrained_path == "/x/ckpt.pkl" and cfg.freeze_backbone

    # Round-trip flat save/load.
    p = str(tmp_path / "cfg.yaml")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.name == cfg.name and cfg2.alpha == cfg.alpha


def test_default_yaml_loads():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "default.yaml"))
    assert cfg.num_clients == 5 and cfg.dataset == "synthetic"


def test_experiment_config_yaml_loads():
    # The shipped study variant: adaptive_krum vs krum on dirichlet data,
    # with the type-specific key routed into attack_params.
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "experiment_config.yaml"))
    assert cfg.name == "attack_defense_study"
    assert cfg.attack_enabled and cfg.attack_type == "adaptive_krum"
    assert cfg.malicious_clients == [0, 1]
    assert cfg.attack_params["perturbation_scale"] == 0.05
    assert cfg.defense_enabled and cfg.defense_type == "krum"
    assert cfg.num_malicious_assumed == 2
    assert cfg.partition == "dirichlet" and cfg.alpha == 0.5


# ---------------------------------------------------------------- tracking ---
def test_tracker_writes_results_json(tmp_path):
    from multimodal_fl_security_tpu.utils.tracking import ExperimentTracker

    with ExperimentTracker("t1", log_dir=str(tmp_path),
                           use_tensorboard=False,
                           config={"a": 1}) as tr:
        tr.log_round(1, accuracy=0.5, loss=1.0, asr=0.1,
                     defense_metrics={"num_rejected": 2})
        tr.log_round(2, accuracy=0.7, loss=0.8)
    path = os.path.join(str(tmp_path), "t1", "results.json")
    assert os.path.exists(path)
    with open(path) as f:
        data = json.load(f)
    assert len(data["history"]) == 2
    assert data["history"][0]["asr"] == 0.1
    assert data["duration_seconds"] >= 0


# --------------------------------------------------------------------- eda ---
def test_eda_report(tmp_path):
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.experiments.eda import (
        dataset_stats,
        generate_report,
        heterogeneity_metrics,
    )
    from multimodal_fl_security_tpu.data.partition import partition_data

    ds = load_dataset("synthetic", "train", num_train=1000)
    stats = dataset_stats(ds)
    assert stats["num_samples"] == 1000
    assert "image" in str(stats["modalities"])

    parts = partition_data(ds.labels, 5, "dirichlet", alpha=0.2)
    het = heterogeneity_metrics(ds.labels, parts, 10)
    assert 0 <= het["mean_emd"] <= 1

    report = generate_report(ds, num_clients=5, out_dir=str(tmp_path / "eda"))
    assert os.path.exists(report)


# --------------------------------------------------------------------- cli ---
def test_cli_parser_covers_subcommands():
    from multimodal_fl_security_tpu.experiments.cli import build_parser

    p = build_parser()
    for argv, checks in [
        (["run", "--dataset", "synthetic", "--num-clients", "7",
          "--defense-type", "krum"],
         {"dataset": "synthetic", "num_clients": 7, "defense_type": "krum"}),
        (["matrix", "--quick", "--dataset", "digits"],
         {"quick": True, "dataset": "digits"}),
        (["paper", "--preset", "mnist", "--full-distributions"],
         {"preset": "mnist", "full_distributions": True}),
        (["quick-test"], {}),
        (["analyze", "some/dir", "--plots"],
         {"results_dir": "some/dir", "plots": True}),
        (["eda", "--dataset", "synthetic"], {"dataset": "synthetic"}),
    ]:
        args = p.parse_args(argv)
        for k, v in checks.items():
            assert getattr(args, k) == v, (argv, k)
        assert callable(args.fn)
