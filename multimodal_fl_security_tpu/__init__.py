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

# Platform override MUST land before any submodule touches jax: the jax
# backend is pinned at first initialization, and a later
# jax.config.update("jax_platforms", ...) silently does nothing — which
# had launcher roles asked to run on CPU computing against the TPU
# tunnel instead. (The tunnel's plugin registration overrides the
# JAX_PLATFORMS env var, so the config route is the only effective one.)
import os as _os

if _os.environ.get("MFT_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MFT_PLATFORM"])

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
