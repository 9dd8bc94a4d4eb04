"""Experiment configuration and results dataclasses.

Field-parity with the reference's ExperimentConfig/ExperimentResults
(reference: experiments/run_experiments.py:32-80), with deliberate fixes
documented in SURVEY.md §2.9:
  - ``alpha`` is actually plumbed into the Dirichlet partitioner (§2.9-1);
  - ``partition_seed`` is explicit (the reference hardcodes 42, §2.9-5);
  - model-poisoning attacks fire in simulation (§2.9-2);
  - extra fields for TPU execution (mesh axes, dtype) and multimodality.

``ExperimentResults.to_dict`` emits the same JSON schema as the reference's
result artifacts (experiments/quick_results/*.json), so the reference's
analysis/visualization scripts can read our output unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class ExperimentConfig:
    name: str = "experiment"
    dataset: str = "synthetic"
    model: Optional[str] = None  # None = dataset default
    # Extra keyword arguments for the model factory (models/registry.py),
    # e.g. {"norm": "batch"} selects the ResNet reference-compat
    # frozen-stats BatchNorm mode required for converted torchvision
    # checkpoints (models/torch_convert.py).
    model_params: Dict[str, Any] = field(default_factory=dict)
    # Transfer learning (reference: cub200_cnn.py:29-54): path to a local
    # pickled parameter pytree (models/pretrained.py::save_params). Leaves
    # merge by name+shape; a head with a different class count keeps its
    # fresh init, like the reference's replaced fc.
    pretrained_path: Optional[str] = None
    # Freeze everything except the classifier head during local training
    # (reference: cub200_cnn.py:40-44).
    freeze_backbone: bool = False
    num_clients: int = 5
    clients_per_round: Optional[int] = None  # None = all clients every round
    # Compile-time bound for large client counts: vmap over chunks of this
    # size inside a lax.map instead of one C-wide vmap (rounds/engine.py).
    client_chunk: Optional[int] = None
    num_rounds: int = 5
    local_epochs: int = 2
    batch_size: int = 32
    learning_rate: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 0.0
    clip_norm: float = 1.0  # reference clips grads at 1.0 (run_experiments.py:231)
    # On-device train-time augmentation: flip / crop / crop_flip /
    # rrc_flip / rrc_flip_erase / ref_cub (data/preprocess.py)
    augment: str = "none"
    # Per-round lr scale: "constant" (the reference's only mode) or
    # "cosine" (linear warmup over warmup_rounds, cosine decay to 0 at
    # num_rounds). Beyond-reference knob for long from-scratch runs.
    lr_schedule: str = "constant"
    warmup_rounds: int = 0
    # Cosine floor as a fraction of the base lr (0 = decay to zero; both
    # long CUB runs peaked ~70% through the horizon and drifted down as
    # lr -> 0 — see rounds/engine.py::make_lr_schedule).
    min_lr_frac: float = 0.0
    # Label smoothing on the local CE loss (0 = reference's plain CE).
    label_smoothing: float = 0.0
    # FedProx proximal coefficient on local training (0 = plain FedAvg,
    # the reference's only mode); see rounds/engine.py TrainSpec.
    fedprox_mu: float = 0.0
    # Server-side optimizer over the aggregated pseudo-gradient
    # ("none" = reference replace-update; fedavgm/fedadagrad/fedadam/
    # fedyogi per rounds/server_opt.py). Params: server_lr/beta1/beta2/tau.
    server_optimizer: str = "none"
    server_opt_params: Dict[str, Any] = field(default_factory=dict)
    partition: str = "iid"
    alpha: float = 0.5
    partition_seed: int = 42
    seed: int = 42

    # attack block (reference: run_experiments.py:45-52)
    attack_enabled: bool = False
    attack_type: str = "none"
    malicious_clients: List[int] = field(default_factory=list)
    poison_ratio: float = 0.1
    source_class: int = 7
    target_class: int = 0
    trigger_size: int = 3
    attack_params: Dict[str, Any] = field(default_factory=dict)

    # defense block (reference: run_experiments.py:54-58)
    defense_enabled: bool = False
    defense_type: str = "none"
    num_malicious_assumed: int = 1
    trim_ratio: float = 0.1
    defense_params: Dict[str, Any] = field(default_factory=dict)

    # secure aggregation (distributed TCP runtime only; runtime/secure_agg.py
    # — the server then sees only the masked weighted sum, so it composes
    # only with sum-based defenses)
    secure_aggregation: bool = False

    # execution
    eval_batch_size: int = 500
    # "float32" for strict parity; "bfloat16" runs conv/dense compute on the
    # MXU in bf16 (params and aggregation stay f32) — ~1.6x faster rounds
    # with matching loss curves on the small CNNs.
    compute_dtype: str = "float32"
    # Resident client-data layout (data/stacking.py): "flat" stores multi-dim
    # features as [C, N, 128-aligned D] — zero XLA tile padding (the NHWC
    # resident inflates up to 5.2x in HBM and OOMs at C=400) and ~9% faster
    # per-step gathers; the engine reshapes each batch back at the model
    # boundary. "nhwc" keeps the logical shapes resident (compat mode).
    # "s2d" additionally re-blocks the image modality to space-to-depth
    # (ops/s2d.py) so the SimpleCNN stem runs as a 2x2/stride-1 conv on
    # blocks — simple_cnn-family models only, and incompatible with
    # image-space augmentation. Numerically identical: the reshape /
    # re-blocking is exact.
    resident_layout: str = "flat"
    # Optional storage dtype for flat-resident features (e.g. "bfloat16"
    # when compute_dtype is bfloat16 — halves resident HBM + gather
    # traffic; inputs are quantized to bf16, a ~3-decimal perturbation).
    resident_dtype: Optional[str] = None
    data_dir: Optional[str] = None
    dataset_params: Dict[str, Any] = field(default_factory=dict)
    use_mesh: bool = False
    mesh_devices: Optional[int] = None
    checkpoint_every: int = 10
    checkpoint_dir: Optional[str] = None
    resume_from_checkpoint: bool = False
    # Personalized evaluation (rounds/personalization.py): each client
    # fine-tunes the final global on its own shard and is scored on a test
    # shard partitioned with the same strategy/seed. Results land in
    # extra_metrics["personalization"].
    personalized_eval: bool = False
    personalization_epochs: int = 1
    # Per-round observability (reference tracks ASR only at the end;
    # tracking.py-equivalent per-round logging is opt-in here).
    eval_asr_every_round: bool = False
    track: bool = False
    track_dir: str = "runs"

    def default_model(self) -> str:
        table = {
            "mnist": "simple_cnn",
            "synthetic": "simple_cnn",
            "synthetic_mnist": "simple_cnn",
            "cifar10": "cifar_cnn",
            "synthetic_cifar": "cifar_cnn",
            "cub200": "resnet50",
            "cub200_multimodal": "multimodal_cnn",
            "synthetic_multimodal": "multimodal_cnn",
            "synthetic_avmnist": "avmnist_fusion",
            "avmnist": "avmnist_fusion",
            "synthetic_clip": "clip_style",
            "synthetic_cremad": "cremad_fusion",
        }
        return self.model or table.get(self.dataset, "simple_cnn")

    def attack_config(self) -> Dict[str, Any]:
        """Merged attack hyperparameters (mirrors run_experiments.py:143-152)."""
        cfg = {
            "poison_ratio": self.poison_ratio,
            "source_class": self.source_class,
            "target_class": self.target_class,
            "trigger_size": self.trigger_size,
            "num_malicious": max(len(self.malicious_clients), 1),
            "seed": self.seed,
        }
        cfg.update(self.attack_params)
        return cfg

    def defense_config(self) -> Dict[str, Any]:
        """Merged defense hyperparameters (mirrors run_experiments.py:155-163)."""
        cfg = {
            "num_malicious": self.num_malicious_assumed,
            "trim_ratio": self.trim_ratio,
            "multi_k": max(self.num_clients // 2, 1),
            "learning_rate": self.learning_rate,
        }
        cfg.update(self.defense_params)
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass
class ExperimentResults:
    """Result record; JSON layout matches the reference artifacts
    (reference: experiments/run_experiments.py:63-80, 293-312)."""

    config: ExperimentConfig
    round_accuracies: List[float] = field(default_factory=list)
    round_losses: List[float] = field(default_factory=list)
    final_accuracy: float = 0.0
    final_loss: float = 0.0
    attack_success_rate: Optional[float] = None
    training_time_seconds: float = 0.0
    timestamp: str = ""
    extra_metrics: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        out = {
            "config": self.config.to_dict(),
            "round_accuracies": self.round_accuracies,
            "round_losses": self.round_losses,
            "final_accuracy": self.final_accuracy,
            "final_loss": self.final_loss,
            "attack_success_rate": self.attack_success_rate,
            "training_time_seconds": self.training_time_seconds,
            "timestamp": self.timestamp,
        }
        if self.extra_metrics:
            out["extra_metrics"] = self.extra_metrics
        return out

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=_json_default)


def _json_default(obj):
    try:
        return float(obj)
    except Exception:
        return str(obj)
