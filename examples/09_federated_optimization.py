"""Round-2 federated-optimization features, end to end.

Demonstrates (all beyond the reference's surface):
  1. server optimizers — FedAvg-replace vs FedAdam on the same workload;
  2. FedProx local anchoring under heavy label skew;
  3. personalized evaluation (per-client fine-tune of the final global);
  4. the DnC spectral defense vs an AGR-agnostic Min-Max attack.

Run:  python examples/09_federated_optimization.py
(On the 1-chip TPU or CPU; small shapes, compiles cached.)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig  # noqa: E402
from multimodal_fl_security_tpu.experiments.runner import run_simulation  # noqa: E402
from multimodal_fl_security_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

BASE = dict(
    dataset="synthetic", num_clients=8, num_rounds=4, local_epochs=1,
    batch_size=16, learning_rate=0.05, eval_batch_size=100,
    dataset_params={"num_train": 1024, "num_test": 400,
                    "image_shape": (16, 16, 1)},
)


def run(name, **kw):
    res = run_simulation(ExperimentConfig(name=name, **{**BASE, **kw}))
    print(f"{name:28s} accs={['%.3f' % a for a in res.round_accuracies]}")
    return res


def main() -> None:
    print("== 1. server optimizers ==")
    plain = run("replace_update")
    adam = run("fedadam", server_optimizer="fedadam",
               server_opt_params={"server_lr": 0.3})

    print("== 2. FedProx under dirichlet(0.1) skew ==")
    fedavg_skew = run("skew_fedavg", partition="dirichlet", alpha=0.1)
    fedprox_skew = run("skew_fedprox", partition="dirichlet", alpha=0.1,
                       fedprox_mu=0.05)

    print("== 3. personalized evaluation ==")
    pers = run("personalized", partition="dirichlet", alpha=0.1,
               personalized_eval=True, personalization_epochs=1)
    pm = pers.extra_metrics["personalization"]
    print(f"  personalized acc {pm['personalized_accuracy_mean']:.3f} vs "
          f"global-on-client-dists "
          f"{pm['global_accuracy_on_client_dists_mean']:.3f}")

    print("== 4. DnC vs Min-Max (2/8 colluders) ==")
    undefended = run("minmax_none", attack_enabled=True,
                     attack_type="min_max", malicious_clients=[0, 1])
    dnc = run("minmax_dnc", attack_enabled=True, attack_type="min_max",
              malicious_clients=[0, 1], defense_enabled=True,
              defense_type="dnc", num_malicious_assumed=2)

    summary = {
        "final_acc_replace": plain.final_accuracy,
        "final_acc_fedadam": adam.final_accuracy,
        "final_acc_skew_fedavg": fedavg_skew.final_accuracy,
        "final_acc_skew_fedprox": fedprox_skew.final_accuracy,
        "personalized_accuracy": pm["personalized_accuracy_mean"],
        "global_acc_on_client_dists":
            pm["global_accuracy_on_client_dists_mean"],
        "final_acc_minmax_undefended": undefended.final_accuracy,
        "final_acc_minmax_dnc": dnc.final_accuracy,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
