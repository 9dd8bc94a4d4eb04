"""TPU-native multimodal federated-learning security framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
testbed ``Shashank8834/multimodal-fl-security`` (see SURVEY.md): simulated
FedAvg rounds across a client population with pluggable data-poisoning and
model-poisoning attacks, robust aggregation defenses, multimodal models, and
an attack x defense x distribution x seed experiment matrix.

Unlike the reference's sequential per-client Python loop
(reference: experiments/run_experiments.py:193), clients here are a leading
array axis: local training runs vmapped across the population inside a single
jitted round program, attacks are on-device transforms, and robust aggregation
rules are XLA/Pallas reductions — so a full round never leaves HBM.

Typical use::

    import multimodal_fl_security_tpu as mft
    cfg = mft.ExperimentConfig(dataset="synthetic", num_clients=10)
    results = mft.run_simulation(cfg)
"""

__version__ = "0.1.0"

from multimodal_fl_security_tpu.experiments.config import (  # noqa: F401
    ExperimentConfig,
    ExperimentResults,
)
from multimodal_fl_security_tpu.experiments.runner import (  # noqa: F401
    ExperimentRunner,
    run_simulation,
)
from multimodal_fl_security_tpu.attacks import get_attack  # noqa: F401
from multimodal_fl_security_tpu.defenses import get_defense  # noqa: F401
from multimodal_fl_security_tpu.models import create_model  # noqa: F401
