"""Mesh construction and client-axis sharding.

The framework's scaling axis is the client population (SURVEY.md §2.8): the
reference trains clients one at a time in Python and sends full models over
gRPC per round (reference: run_experiments.py:193, fl_server.py:177-181).
Here the stacked client arrays are sharded along a ``clients`` mesh axis;
the vmapped local-training program partitions with them, and the robust
aggregation reductions become XLA collectives over ICI — no host traffic.

Model parameters are replicated (the reference's largest model, ResNet-50 at
~25M params, fits every chip); a ``model`` mesh axis is accepted for tensor
sharding of larger fusion encoders.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("clients",),
              devices=None,
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Mesh over the available devices.

    Default is 1-D over ``clients``. Pass ``shape`` for multi-axis layouts —
    e.g. ``make_mesh(axis_names=("dcn", "clients"), shape=(2, 4))`` models a
    two-slice topology: collectives over ``clients`` ride ICI within a
    slice, those over ``dcn`` cross slices (slowest axis first, matching
    how multislice device orders enumerate)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            # Put everything on the first axis by default.
            shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def client_sharding(mesh: Mesh, ndim: int, axis: str = "clients") -> NamedSharding:
    """Shard the leading (client) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_client_arrays(mesh: Mesh, arrays: Dict, mask, counts):
    """Place client-stacked arrays with the client axis sharded over the mesh.

    Pads the client axis up to a mesh-size multiple is NOT done here — the
    runner sizes C as a multiple of the mesh axis; this function only places.
    """
    arrays = {
        k: jax.device_put(v, client_sharding(mesh, v.ndim)) for k, v in arrays.items()
    }
    mask = jax.device_put(mask, client_sharding(mesh, mask.ndim))
    counts = jax.device_put(counts, client_sharding(mesh, counts.ndim))
    return arrays, mask, counts
