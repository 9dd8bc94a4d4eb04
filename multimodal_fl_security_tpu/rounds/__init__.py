"""Round engine: the jitted FedAvg round program."""

from multimodal_fl_security_tpu.rounds.engine import RoundEngine  # noqa: F401
