"""Server-side optimizers: FedAvgM, FedAdagrad, FedAdam, FedYogi.

Adaptive federated optimization (Reddi et al., ICLR'21): treat the
round's aggregated model delta as a *pseudo-gradient* and apply a
server-side first/second-moment optimizer to the global model, instead
of replacing the global with the aggregate outright.

The reference has no server optimizer — its server always overwrites the
global with the aggregate (reference: experiments/run_experiments.py:256-259
and src/server/fl_server.py aggregate_fit). ``"none"`` reproduces that
behavior exactly; the adaptive rules are beyond-reference capability in
the same config surface.

TPU-native shape: the optimizer state is one or two [D] vectors resident
in HBM next to the update matrix; ``apply`` is a handful of fused
elementwise XLA ops inside the jitted round program, so enabling a
server optimizer adds no host round-trips and O(D) HBM traffic.

Update rules (paper eqs. — no bias correction, like the paper):
    delta = aggregate - global                      (pseudo-gradient)
    m     = beta1 * m + (1 - beta1) * delta         (FedAvgM uses plain
                                                     momentum: m = beta1*m
                                                     + delta)
    FedAdagrad: v = v + delta^2
    FedAdam:    v = beta2 * v + (1 - beta2) * delta^2
    FedYogi:    v = v - (1 - beta2) * delta^2 * sign(v - delta^2)
    new_global  = global + lr * m / (sqrt(v) + tau)   (adaptive rules)
    new_global  = global + lr * m                     (FedAvgM)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

SERVER_OPTIMIZERS = ("none", "fedavgm", "fedadagrad", "fedadam", "fedyogi")


class ServerOptimizer:
    """Pure-jnp server optimizer; state is a dict of [D] f32 vectors."""

    def __init__(self, name: str, config: Optional[Dict[str, Any]] = None):
        if name not in SERVER_OPTIMIZERS or name == "none":
            raise ValueError(
                f"unknown server optimizer {name!r} "
                f"(available: {SERVER_OPTIMIZERS})"
            )
        cfg = config or {}
        self.name = name
        self.lr = float(cfg.get("server_lr", 1.0 if name == "fedavgm" else 0.1))
        self.beta1 = float(cfg.get("beta1", 0.9))
        self.beta2 = float(cfg.get("beta2", 0.99))
        self.tau = float(cfg.get("tau", 1e-3))

    # -- state -------------------------------------------------------------
    def init_state(self, dim: int) -> Dict[str, jnp.ndarray]:
        state = {"m": jnp.zeros((dim,), jnp.float32)}
        if self.name != "fedavgm":
            # The paper initializes v to tau^2 so the first adaptive step
            # is well-scaled.
            state["v"] = jnp.full((dim,), self.tau**2, jnp.float32)
        return state

    # -- one server step (jit-safe) ----------------------------------------
    def apply(
        self,
        global_flat: jnp.ndarray,
        aggregate: jnp.ndarray,
        state: Dict[str, jnp.ndarray],
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """(new_global, new_state) from the round's aggregate [D]."""
        delta = (aggregate - global_flat).astype(jnp.float32)
        if self.name == "fedavgm":
            m = self.beta1 * state["m"] + delta
            return global_flat + self.lr * m, {"m": m}
        m = self.beta1 * state["m"] + (1.0 - self.beta1) * delta
        d2 = jnp.square(delta)
        if self.name == "fedadagrad":
            v = state["v"] + d2
        elif self.name == "fedadam":
            v = self.beta2 * state["v"] + (1.0 - self.beta2) * d2
        else:  # fedyogi
            v = state["v"] - (1.0 - self.beta2) * d2 * jnp.sign(state["v"] - d2)
        new_global = global_flat + self.lr * m / (jnp.sqrt(v) + self.tau)
        return new_global, {"m": m, "v": v}

    def get_metrics(self) -> Dict[str, Any]:
        return {"server_optimizer": self.name, "server_lr": self.lr,
                "beta1": self.beta1, "beta2": self.beta2, "tau": self.tau}


def make_server_optimizer(
    name: str, config: Optional[Dict[str, Any]] = None
) -> Optional[ServerOptimizer]:
    """Factory; ``"none"``/empty reproduces the reference's replace-update."""
    if not name or name == "none":
        return None
    return ServerOptimizer(name, config)
