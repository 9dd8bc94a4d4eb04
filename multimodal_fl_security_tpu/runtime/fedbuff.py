"""FedBuff aggregation math (Nguyen et al., AISTATS'22), shared between
the asynchronous TCP server (runtime/async_server.py) and the
deterministic virtual-clock simulator (rounds/async_sim.py) — the
simulator property-tests exactly the arithmetic the live server runs.
"""

from __future__ import annotations

import logging
from typing import Tuple

import numpy as np

logger = logging.getLogger(__name__)


def staleness_weights(
    versions: np.ndarray,
    current_version: int,
    num_examples: np.ndarray,
    staleness_exponent: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """FedBuff weights: w_i = n_i * (1 + s_i)^(-a), s_i = staleness.

    (a = 0.5 is the paper's 1/sqrt(1+s) discount.) Returns (weights,
    staleness) as float32 arrays.
    """
    stale = (float(current_version) - np.asarray(versions, np.float32))
    w = np.asarray(num_examples, np.float32) * np.power(
        1.0 + stale, -float(staleness_exponent)
    )
    return w, stale


def fedbuff_aggregate(
    params: np.ndarray,
    deltas: np.ndarray,
    weights: np.ndarray,
    defense,
    server_lr: float,
    flush_idx: int = 0,
) -> np.ndarray:
    """One buffer flush: params + server_lr * defense(deltas, weights).

    Falls back to the plain weighted mean when the defense raises (same
    contract as the sync server, reference: robust_server.py:120-122).

    ``flush_idx`` (the server's version counter) seeds ctx["key"]: a
    randomized defense (dp_sgd's Gaussian noise, DnC's coordinate draws)
    must see a FRESH key per flush — a constant fallback key would add
    the identical noise vector every time, voiding the DP guarantee.
    """
    import jax
    import jax.numpy as jnp

    deltas = np.asarray(deltas, np.float32)
    weights = np.asarray(weights, np.float32)
    try:
        agg = np.asarray(
            defense.aggregate(
                jnp.asarray(deltas), jnp.asarray(weights),
                {"global": jnp.zeros((deltas.shape[1],), jnp.float32),
                 "key": jax.random.fold_in(jax.random.PRNGKey(0xFEDB),
                                           int(flush_idx))},
            ),
            np.float32,
        )
    except Exception:
        logger.exception(
            "async defense %s failed; weighted-mean fallback", defense.name
        )
        agg = (weights[:, None] * deltas).sum(0) / max(
            float(weights.sum()), 1e-12
        )
    return (params + float(server_lr) * agg).astype(np.float32)
