"""Experiment tracking: TensorBoard scalars/histograms + JSON results.

Parity with the reference's ExperimentTracker (reference:
src/utils/tracking.py:24-214): optional-import TensorBoard guard, per-round
scalar logging (accuracy/loss/ASR/defense metrics), client-update and
aggregation logging, context-manager finish() writing results.json with the
run duration, and a timestamped factory.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

try:  # reference: tracking.py:16-21 (optional import guard)
    from torch.utils.tensorboard import SummaryWriter

    HAS_TENSORBOARD = True
except Exception:  # pragma: no cover
    SummaryWriter = None
    HAS_TENSORBOARD = False


class ExperimentTracker:
    def __init__(self, experiment_name: str, log_dir: str = "runs",
                 use_tensorboard: bool = True,
                 config: Optional[Dict[str, Any]] = None):
        self.experiment_name = experiment_name
        self.log_dir = os.path.join(log_dir, experiment_name)
        self.config = config or {}
        self.start_time = time.time()
        self.history: List[Dict[str, Any]] = []
        self.writer = None
        if use_tensorboard and HAS_TENSORBOARD:
            os.makedirs(self.log_dir, exist_ok=True)
            self.writer = SummaryWriter(self.log_dir)

    # -- round-level ---------------------------------------------------
    def log_round(self, round_idx: int, accuracy: float, loss: float,
                  asr: Optional[float] = None,
                  defense_metrics: Optional[Dict[str, Any]] = None) -> None:
        entry: Dict[str, Any] = {
            "round": round_idx, "accuracy": accuracy, "loss": loss,
        }
        if asr is not None:
            entry["asr"] = asr
        if defense_metrics:
            entry["defense"] = {
                k: _to_py(v) for k, v in defense_metrics.items()
            }
        self.history.append(entry)
        if self.writer:
            self.writer.add_scalar("eval/accuracy", accuracy, round_idx)
            self.writer.add_scalar("eval/loss", loss, round_idx)
            if asr is not None:
                self.writer.add_scalar("attack/asr", asr, round_idx)
            for k, v in (defense_metrics or {}).items():
                v = _to_py(v)
                if isinstance(v, (int, float)):
                    self.writer.add_scalar(f"defense/{k}", v, round_idx)

    def log_client_update(self, round_idx: int, client_id: int,
                          update_norm: float, loss: float) -> None:
        if self.writer:
            self.writer.add_scalar(
                f"client/{client_id}/update_norm", update_norm, round_idx
            )
            self.writer.add_scalar(f"client/{client_id}/loss", loss, round_idx)

    def log_model_weights(self, round_idx: int, flat_params) -> None:
        """Histogram + norm of the global model (reference: tracking.py:128-147)."""
        arr = np.asarray(flat_params)
        if self.writer:
            self.writer.add_histogram("model/weights", arr, round_idx)
            self.writer.add_scalar(
                "model/weight_norm", float(np.linalg.norm(arr)), round_idx
            )

    def log_aggregation(self, round_idx: int, num_selected: int,
                        num_rejected: int) -> None:
        if self.writer:
            self.writer.add_scalar("aggregation/selected", num_selected,
                                   round_idx)
            self.writer.add_scalar("aggregation/rejected", num_rejected,
                                   round_idx)

    # -- lifecycle -------------------------------------------------------
    def finish(self, final_metrics: Optional[Dict[str, Any]] = None) -> str:
        duration = time.time() - self.start_time
        os.makedirs(self.log_dir, exist_ok=True)
        payload = {
            "experiment": self.experiment_name,
            "config": self.config,
            "history": self.history,
            "final_metrics": {k: _to_py(v)
                              for k, v in (final_metrics or {}).items()},
            "duration_seconds": duration,
            "timestamp": datetime.datetime.now().isoformat(),
        }
        path = os.path.join(self.log_dir, "results.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=2, default=str)
        if self.writer:
            self.writer.flush()
            self.writer.close()
        return path

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()
        return False


def create_experiment_tracker(base_name: str, **kwargs) -> ExperimentTracker:
    """Timestamped tracker factory (reference: tracking.py:206-214)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    return ExperimentTracker(f"{base_name}_{stamp}", **kwargs)


def _to_py(v: Any) -> Any:
    """Device scalars -> python floats for JSON/TensorBoard."""
    try:
        import jax

        if isinstance(v, (jax.Array, np.ndarray)):
            return float(np.asarray(v).reshape(-1)[0]) if np.asarray(v).size == 1 \
                else np.asarray(v).tolist()
    except Exception:
        pass
    return v
