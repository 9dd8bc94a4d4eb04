"""Deterministic virtual-clock FedBuff simulation.

The TCP async server (runtime/async_server.py) is wall-clock: its
staleness behavior can only be observed at small scale and is timing-
dependent. This module replays the SAME protocol — continuous clients,
buffer of K updates, staleness-discounted aggregation — against a
simulated clock, so buffer-size/staleness semantics are property-testable
at 100+ clients in seconds, bit-reproducibly.

Event model
-----------
Every client trains continuously: it is dispatched the current global
the moment its previous update is consumed, and its task completes
``durations[c]`` virtual seconds later (per-client constant — the
deterministic analog of a slow/fast client mix; ties break by dispatch
order). When ``buffer_size`` updates have accumulated, the server
aggregates through EXACTLY the arithmetic of the live server
(runtime/fedbuff.py::staleness_weights / fedbuff_aggregate — shared
code, not a copy) and bumps the global version.

The local-training program is the engine's own jitted
``make_local_train_fn`` (one compile; every event reuses it), so the
simulation trains real models — e.g. to compare final accuracy across
buffer sizes — while staying fast enough for property tests.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from multimodal_fl_security_tpu.core.pytrees import flatten_tree, unflatten_tree
from multimodal_fl_security_tpu.data.stacking import (
    ClientData,
    make_batch_adapter,
)
from multimodal_fl_security_tpu.rounds.engine import (
    TrainSpec,
    make_local_train_fn,
)


@dataclass
class AsyncSimResult:
    final_params: Any
    #: per-aggregation records: version, buffer client ids, staleness
    history: List[Dict[str, Any]] = field(default_factory=list)
    #: total completed client tasks (consumed updates)
    num_updates: int = 0


def simulate_fedbuff(
    model,
    client_data: ClientData,
    spec: TrainSpec,
    durations: np.ndarray,
    num_aggregations: int,
    buffer_size: int = 10,
    server_lr: float = 1.0,
    staleness_exponent: float = 0.5,
    defense=None,
    init_params=None,
    seed: int = 0,
) -> AsyncSimResult:
    """Run FedBuff under a virtual clock; fully deterministic.

    ``durations[c]`` is client c's (constant) task duration in virtual
    seconds. ``defense`` defaults to weighted FedAvg over the buffer.
    """
    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.runtime.fedbuff import (
        fedbuff_aggregate,
        staleness_weights,
    )

    c = client_data.num_clients
    durations = np.asarray(durations, np.float64)
    assert durations.shape == (c,)
    defense = defense or get_defense("none", {})

    adapt = make_batch_adapter(client_data.feature_shapes)
    local_train = jax.jit(make_local_train_fn(
        model, spec, client_data.max_samples, adapt=adapt
    ))
    arrays = {k: jax.numpy.asarray(v) for k, v in client_data.arrays.items()}
    mask = jax.numpy.asarray(client_data.mask)
    counts = np.asarray(client_data.counts, np.float32)

    if init_params is None:
        sample = {k: v[0, : spec.batch_size] for k, v in arrays.items()}
        if adapt is not None:
            sample = adapt(sample)
        from multimodal_fl_security_tpu.models import init_model

        init_params = init_model(model, sample, seed=seed)["params"]
    params = init_params
    global_flat = np.asarray(flatten_tree(params), np.float32)
    version = 0

    # Dispatch everyone at t=0 on version 0. Heap entries:
    # (finish_time, seq, client, version_trained_on, dispatched_params).
    heap: list = []
    seq = 0
    for i in range(c):
        heapq.heappush(heap, (float(durations[i]), seq, i, 0, params))
        seq += 1

    key = jax.random.PRNGKey(seed)
    buffer: List[Dict[str, Any]] = []
    history: List[Dict[str, Any]] = []
    num_updates = 0

    while len(history) < num_aggregations:
        now, _, i, v_i, p_i = heapq.heappop(heap)
        # The client's task completes NOW: run its local training against
        # the params it was dispatched (version v_i).
        ckey = jax.random.fold_in(jax.random.fold_in(key, i), num_updates)
        new_params, _loss = local_train(
            p_i, {k: a[i] for k, a in arrays.items()}, mask[i], ckey
        )
        delta = (np.asarray(flatten_tree(new_params), np.float32)
                 - np.asarray(flatten_tree(p_i), np.float32))
        buffer.append({"client": i, "version": v_i, "delta": delta,
                       "n": counts[i]})
        num_updates += 1

        if len(buffer) >= buffer_size:
            versions = np.asarray([b["version"] for b in buffer], np.float32)
            n = np.asarray([b["n"] for b in buffer], np.float32)
            w, stale = staleness_weights(versions, version, n,
                                         staleness_exponent)
            deltas = np.stack([b["delta"] for b in buffer])
            global_flat = fedbuff_aggregate(global_flat, deltas, w,
                                            defense, server_lr,
                                            flush_idx=version)
            version += 1
            params = unflatten_tree(params, jax.numpy.asarray(global_flat))
            history.append({
                "version": version,
                "time": now,
                "clients": [b["client"] for b in buffer],
                "staleness": stale.tolist(),
                "weights": w.tolist(),
                "mean_staleness": float(stale.mean()),
                "max_staleness": float(stale.max()),
            })
            buffer = []

        # Immediately re-dispatch the client on the CURRENT global.
        heapq.heappush(
            heap, (now + float(durations[i]), seq, i, version, params)
        )
        seq += 1

    return AsyncSimResult(final_params=params, history=history,
                          num_updates=num_updates)
