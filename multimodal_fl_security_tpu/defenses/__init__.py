"""Robust aggregation defenses.

Registry names match the reference factory
(reference: src/defenses/__init__.py:28-59): none, fedavg, krum, multi_krum,
trimmed_mean, median, geometric_median, fltrust, dp_sgd, gradient_clipping,
norm_bounding.

Every defense is a stateless-config object whose ``aggregate(updates [C, D],
weights [C], ctx)`` is pure jnp and jit/vmap/shard_map-safe: the whole
aggregation runs on device inside the round program instead of the
reference's host-side torch/numpy loops.
"""

from multimodal_fl_security_tpu.defenses.base import (  # noqa: F401
    DEFENSES,
    BaseDefense,
    NoDefense,
    get_defense,
)
from multimodal_fl_security_tpu.defenses import krum  # noqa: F401
from multimodal_fl_security_tpu.defenses import trimmed_mean  # noqa: F401
from multimodal_fl_security_tpu.defenses import differential_privacy  # noqa: F401
from multimodal_fl_security_tpu.defenses import fltrust  # noqa: F401
# Beyond-reference: Bulyan (El Mhamdi et al. ICML'18), FoolsGold
# (Fung et al. RAID'20, stateful sybil defense), centered clipping
# (Karimireddy et al. ICML'21, stateful momentum defense), and DnC
# (Shejwalkar & Houmansadr NDSS'21, spectral filtering).
from multimodal_fl_security_tpu.defenses import bulyan  # noqa: F401
from multimodal_fl_security_tpu.defenses import foolsgold  # noqa: F401
from multimodal_fl_security_tpu.defenses import centered_clip  # noqa: F401
from multimodal_fl_security_tpu.defenses import dnc  # noqa: F401
