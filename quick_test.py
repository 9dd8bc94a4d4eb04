#!/usr/bin/env python
"""Quick sanity gate (reference: quick_test.py:16-218).

Two fast checks before long runs: (1) a DP-SGD-defended run on the
learnable synthetic task must clear an accuracy threshold; (2) if the
CUB-200 data directory is present, a one-round multimodal run must produce
finite loss and above-floor accuracy.
"""

import sys
import time

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def test_dp_sgd() -> bool:
    t0 = time.time()
    res = run_simulation(ExperimentConfig(
        name="quick_dp", dataset="synthetic", num_clients=3, num_rounds=1,
        local_epochs=2, learning_rate=0.05,
        # Noise std = clip * z / n must stay well below the ~0.02 weight
        # scale or one noisy aggregate wipes the model (clip 50 is a no-op
        # bound here; z=1e-4 -> std ~0.0017).
        defense_enabled=True, defense_type="dp_sgd",
        defense_params={"clip_norm": 50.0, "noise_multiplier": 1e-4},
        dataset_params={"num_train": 3000, "num_test": 500},
    ))
    ok = res.final_accuracy > 0.7  # reference gate: quick_test.py:93-94
    print(f"dp_sgd: acc={res.final_accuracy:.4f} "
          f"({time.time() - t0:.1f}s) -> {'PASS' if ok else 'FAIL'}")
    return ok


def test_cub200() -> bool:
    try:
        from multimodal_fl_security_tpu.data.cub200 import _find_root

        _find_root(None)
    except FileNotFoundError:
        print("cub200: SKIP (dataset not found)")
        return True
    t0 = time.time()
    res = run_simulation(ExperimentConfig(
        name="quick_cub", dataset="cub200", model="multimodal_cnn",
        num_clients=3, num_rounds=1, local_epochs=1, batch_size=8,
        learning_rate=0.01, eval_batch_size=32,
        dataset_params={"image_size": 32, "max_samples": 240},
    ))
    ok = res.final_accuracy > 0.0 and res.final_loss == res.final_loss
    print(f"cub200: acc={res.final_accuracy:.4f} loss={res.final_loss:.3f} "
          f"({time.time() - t0:.1f}s) -> {'PASS' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    # Run BOTH gates even when the first fails: one run reports every
    # broken path instead of one debug cycle per failure.
    results = [test_dp_sgd(), test_cub200()]
    sys.exit(0 if all(results) else 1)
