"""Round engine: the jitted FedAvg round program + server-side optimizers
and per-client personalization passes."""

from multimodal_fl_security_tpu.rounds.engine import (  # noqa: F401
    RoundEngine,
    TrainSpec,
    make_local_train_fn,
)
from multimodal_fl_security_tpu.rounds.personalization import (  # noqa: F401
    personalized_evaluation,
)
from multimodal_fl_security_tpu.rounds.server_opt import (  # noqa: F401
    ServerOptimizer,
    make_server_optimizer,
)
