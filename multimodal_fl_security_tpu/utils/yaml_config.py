"""YAML configuration loading.

The reference has a two-tier config system (SURVEY.md §5): nested YAML files
(reference: configs/default.yaml:1-103 — experiment/server/client/data/
model/attack/defense/logging/evaluation sections) for the distributed
launcher, and the flat ExperimentConfig dataclass for the simulation path.
Here one loader accepts both layouts and produces the canonical
ExperimentConfig.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict

import yaml

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig

logger = logging.getLogger(__name__)

_FIELD_NAMES = {f.name for f in dataclasses.fields(ExperimentConfig)}

# nested-section key -> flat ExperimentConfig field
_NESTED_MAP = {
    ("experiment", "name"): "name",
    ("experiment", "seed"): "seed",
    ("server", "num_rounds"): "num_rounds",
    ("server", "num_clients"): "num_clients",
    ("server", "secure_aggregation"): "secure_aggregation",
    ("server", "optimizer"): "server_optimizer",
    ("server", "optimizer_params"): "server_opt_params",
    ("client", "fedprox_mu"): "fedprox_mu",
    ("client", "local_epochs"): "local_epochs",
    ("client", "batch_size"): "batch_size",
    ("client", "learning_rate"): "learning_rate",
    ("client", "momentum"): "momentum",
    ("data", "dataset"): "dataset",
    ("data", "data_dir"): "data_dir",
    ("data", "partition"): "partition",
    ("data", "alpha"): "alpha",
    ("model", "name"): "model",
    ("model", "pretrained_path"): "pretrained_path",
    ("model", "freeze_backbone"): "freeze_backbone",
    ("attack", "enabled"): "attack_enabled",
    ("attack", "type"): "attack_type",
    ("attack", "malicious_clients"): "malicious_clients",
    ("attack", "poison_ratio"): "poison_ratio",
    ("attack", "source_class"): "source_class",
    ("attack", "target_class"): "target_class",
    ("attack", "trigger_size"): "trigger_size",
    ("defense", "enabled"): "defense_enabled",
    ("defense", "type"): "defense_type",
    ("defense", "num_malicious"): "num_malicious_assumed",
    ("defense", "trim_ratio"): "trim_ratio",
}


_SECTIONS = {k for k, _ in _NESTED_MAP} | {"logging", "evaluation"}


def config_from_dict(data: Dict[str, Any],
                     extras: Dict[str, Any] = None) -> ExperimentConfig:
    """Dict (nested reference layout or flat field names) -> config.

    Keys that map to no ExperimentConfig field are collected into
    ``extras`` when a dict is passed (the distributed launcher's
    runtime-only keys: aggregation_mode, buffer_size, fit_timeout,
    compression, secagg_*, ...); with ``extras=None`` they are dropped
    with a WARNING — a typo'd key silently vanishing means the
    experiment runs with defaults while the results get attributed to
    the intended hyperparameters.
    """
    flat: Dict[str, Any] = {}
    extra_attack: Dict[str, Any] = {}
    extra_defense: Dict[str, Any] = {}
    extra_model: Dict[str, Any] = {}

    def unknown(name: str, value: Any) -> None:
        if extras is not None:
            extras[name] = value
        else:
            logger.warning(
                "config key %r is not recognized and has NO effect", name,
            )

    for key, value in data.items():
        # Section check FIRST: "model"/"attack"/"defense" are both nested
        # section names and flat field names — a dict value means section.
        if isinstance(value, dict) and key in _SECTIONS:
            for sub, v in value.items():
                mapped = _NESTED_MAP.get((key, sub))
                if mapped:
                    flat[mapped] = v
                elif key == "attack":
                    extra_attack[sub] = v
                elif key == "defense":
                    extra_defense[sub] = v
                elif key == "model":
                    # Unmapped model-section keys are model-factory kwargs
                    # (e.g. norm: batch for the reference-compat BN mode).
                    extra_model[sub] = v
                elif key not in ("logging", "evaluation"):
                    unknown(sub, v)
        elif key in _FIELD_NAMES:
            flat[key] = value
        elif isinstance(value, dict) and key in ("logging", "evaluation"):
            pass  # advisory sections
        else:
            unknown(key, value)
    if extra_attack:
        flat.setdefault("attack_params", {}).update(extra_attack)
    if extra_defense:
        flat.setdefault("defense_params", {}).update(extra_defense)
    if extra_model:
        flat.setdefault("model_params", {}).update(extra_model)
    return ExperimentConfig(**flat)


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return config_from_dict(data)


def load_config_dict(path: str) -> Dict[str, Any]:
    """Launcher-facing loader: the canonical ExperimentConfig fields PLUS
    every runtime-only key preserved verbatim (top-level or inside a
    section). ``load_config(...).to_dict()`` alone would drop keys like
    ``aggregation_mode``/``buffer_size``/``fit_timeout``/``compression``
    that the distributed runtime reads from the raw dict."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    extras: Dict[str, Any] = {}
    cfg = config_from_dict(data, extras=extras).to_dict()
    for k, v in extras.items():
        cfg.setdefault(k, v)
    return cfg


def save_config(config: ExperimentConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config.to_dict(), f, sort_keys=False)
