"""Experiment orchestration: configs, simulation runner, matrix, analysis."""

from multimodal_fl_security_tpu.experiments.config import (  # noqa: F401
    ExperimentConfig,
    ExperimentResults,
)
from multimodal_fl_security_tpu.experiments.runner import (  # noqa: F401
    ExperimentRunner,
    run_simulation,
)
