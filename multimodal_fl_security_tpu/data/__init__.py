"""Data layer: dataset registry, partitioners, client stacking, preprocessing."""

from multimodal_fl_security_tpu.data.datasets import (  # noqa: F401
    DATASETS,
    load_dataset,
    Dataset,
)
from multimodal_fl_security_tpu.data.partition import (  # noqa: F401
    partition_data,
    analyze_partition,
)
from multimodal_fl_security_tpu.data.stacking import stack_clients, ClientData  # noqa: F401
from multimodal_fl_security_tpu.data import cub200  # noqa: F401  (registers)
