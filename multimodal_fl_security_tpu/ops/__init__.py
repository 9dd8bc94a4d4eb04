"""TPU compute ops: pairwise distances, robust reductions, Pallas kernels."""

from multimodal_fl_security_tpu.ops.pairwise import (  # noqa: F401
    pairwise_sq_dists,
    pairwise_dists,
)
from multimodal_fl_security_tpu.ops.reductions import (  # noqa: F401
    coordinate_median,
    trimmed_mean,
    weighted_mean,
    geometric_median,
    clip_rows,
)
