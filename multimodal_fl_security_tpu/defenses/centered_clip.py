"""Centered clipping (Karimireddy, He, Jaggi — ICML'21, "Learning from
History for Byzantine Robust Optimization").

Not present in the reference; added because it is the modern
momentum-based robust rule that provably resists the time-coupled attacks
(ALIE, IPM) which defeat one-shot rules like coordinate median — exactly
the attack family this framework ships (attacks/alie.py,
attacks/model_poisoning.py).

Rule (paper eq. 4): starting from the previous round's aggregate v (the
STATE — "history"), run L clipping iterations

    v  <-  v + mean_i clip(u_i - v, tau),
    clip(x, tau) = x * min(1, tau / ||x||)

so each client moves the center by at most tau per iteration: a colluding
minority can bias the result by at most m/n * tau * L per round, while
honest updates (within tau of the center) pass through exactly.

TPU-native: each iteration is one row-norm reduction + one weighted mean
over the resident [C, D] matrix — a ``lax.fori_loop`` of fused XLA ops
inside the jitted round. State cost: one [D] vector.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.defenses.base import DEFENSES, BaseDefense


@DEFENSES.register("centered_clip")
class CenteredClipDefense(BaseDefense):
    name = "centered_clip"
    stateful = True

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        super().__init__(config)
        self.tau = float(self.config.get("tau", 10.0))
        self.iters = int(self.config.get("iters", 5))

    # -- state: previous round's aggregate [D] ------------------------------
    def init_state(self, num_clients: int, dim: int):
        return jnp.zeros((dim,), jnp.float32)

    def _clip_iterations(self, updates, weights, v0):
        w = weights.astype(jnp.float32)
        total = jnp.maximum(jnp.sum(w), 1e-12)
        tau = jnp.float32(self.tau)

        def body(_, v):
            diff = updates - v[None, :]
            norms = jnp.sqrt(
                jnp.maximum(jnp.sum(jnp.square(diff), axis=1), 1e-24)
            )
            scale = jnp.minimum(1.0, tau / norms)
            step = jnp.einsum("c,cd->d", w * scale, diff) / total
            return v + step

        return jax.lax.fori_loop(0, self.iters, body, v0)

    def aggregate_stateful(self, updates, weights, ctx, state):
        # First round: state is the zero vector, which is an arbitrary far
        # center — warm-start from the current global instead.
        global_flat = (ctx or {}).get("global")
        is_cold = jnp.all(state == 0.0)
        v0 = (jnp.where(is_cold, global_flat, state)
              if global_flat is not None else state)
        v = self._clip_iterations(updates, weights, v0)
        return v, {"cclip_center_norm": jnp.linalg.norm(v)}, v

    def aggregate_with_aux(self, updates, weights, ctx=None):
        """Stateless fallback: warm-start at the current global (or the
        weighted mean when no global is in ctx)."""
        ctx = ctx or {}
        v0 = ctx.get("global")
        if v0 is None:
            w = weights.astype(jnp.float32)
            v0 = jnp.einsum("c,cd->d", w, updates) / jnp.maximum(
                jnp.sum(w), 1e-12
            )
        v = self._clip_iterations(updates, weights, v0)
        return v, {"cclip_center_norm": jnp.linalg.norm(v)}

    def detect(self, updates, weights, ctx=None):
        """Clients clipped in the FINAL iteration are the suspects.

        When the caller threads the live momentum state (the previous
        round's aggregate) via ``ctx["defense_state"]``, detection is
        judged against the SAME center the stateful aggregation used;
        otherwise it falls back to the stateless warm start."""
        ctx = ctx or {}
        state = ctx.get("defense_state")
        if state is not None:
            agg, _, _ = self.aggregate_stateful(updates, weights, ctx, state)
        else:
            agg, _ = self.aggregate_with_aux(updates, weights, ctx)
        norms = jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.square(updates - agg[None, :]), axis=1),
                        0.0)
        )
        return (norms > self.tau).astype(jnp.float32)

    def get_metrics(self) -> Dict[str, Any]:
        return {"defense_type": self.name, "tau": self.tau,
                "iters": self.iters}
