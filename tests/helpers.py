"""Shared tiny experiment configs.

Every end-to-end test draws from ONE shape family (16x16 images, 1024/200
samples, 4 clients, batch 16) so round-program compiles are small and the
persistent XLA cache hits across tests and runs.
"""

from multimodal_fl_security_tpu.experiments.config import ExperimentConfig

TINY_IMAGE = {
    "dataset": "synthetic",
    "num_clients": 4,
    "batch_size": 16,
    "local_epochs": 1,
    "learning_rate": 0.05,
    "eval_batch_size": 100,
    "dataset_params": {"num_train": 1024, "num_test": 200,
                       "image_shape": (16, 16, 1)},
}

TINY_MULTIMODAL = {
    "dataset": "synthetic_multimodal",
    "num_clients": 4,
    "batch_size": 16,
    "local_epochs": 1,
    "learning_rate": 0.05,
    "eval_batch_size": 100,
    "dataset_params": {"num_train": 512, "num_test": 200, "num_classes": 10,
                       "image_shape": (16, 16, 3)},
}


def tiny_config(name: str, base: dict = TINY_IMAGE, **overrides):
    cfg = dict(base)
    ds = dict(cfg["dataset_params"])
    ds.update(overrides.pop("dataset_params", {}))
    cfg.update(overrides)
    cfg["dataset_params"] = ds
    return ExperimentConfig(name=name, **cfg)
