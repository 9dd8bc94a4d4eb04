"""Explicit shard_map round: per-shard local training + ICI collectives.

The default engine (rounds/engine.py) relies on jit + NamedSharding and
lets XLA's SPMD partitioner derive the collectives. This module is the
explicit formulation for multi-chip topologies: the client axis is split
over the mesh with ``shard_map``, each shard trains its local clients, and
aggregation happens with hand-placed collectives —

  - weighted FedAvg: one ``psum`` of (sum_i w_i u_i, sum_i w_i) per shard
    — a reduce, not a gather, so the wire carries exactly one [D] vector
    per device (the minimum possible);
  - Krum / coordinate rules, ``param_sharded=False``: ``all_gather`` of
    the shard's [C/p, D] rows over the mesh axis, then the same pure
    reduction everywhere — simple, but replicates the full [C, D] matrix
    per device (10 GB at 100 clients x ResNet-50);
  - Krum / coordinate rules, ``param_sharded=True``: one ``all_to_all``
    re-tiles [C/p, D] -> [C, D/p] and the rule runs in its natural layout
    (coordinate rules fully local; Krum-family distances via a [C, C]
    Gram psum) — per-device memory O(C*D/p), wire cost O(D) total instead
    of O(C*D). See parallel/dshard.py.

On a v5p slice these collectives ride ICI; across slices the same code
works over a second ("dcn") mesh axis by summing over both axis names.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_fl_security_tpu.core.pytrees import (
    flatten_stacked,
    flatten_tree,
    unflatten_tree,
)
from multimodal_fl_security_tpu.parallel.dshard import (
    dshard_aggregate,
    supports_dshard,
)


def make_sharded_round(
    local_train_fn: Callable,
    defense,
    mesh: Mesh,
    num_clients: int,
    axis="clients",
    attack=None,
    param_sharded: bool = False,
) -> Callable:
    """Build round(params, key, arrays, mask, counts, malicious) -> params.

    ``arrays``/``mask``/``counts``/``malicious`` carry the stacked client
    axis; it must divide evenly over the mesh axis (or the product of mesh
    axes — pass ``axis=("dcn", "clients")`` for a multi-slice layout, where
    the reductions then span DCN and ICI).

    ``param_sharded=True`` keeps robust aggregation sharded along the
    parameter dimension (all_to_all to [C, D/p] + per-rule collectives,
    parallel/dshard.py) instead of row-replicating [C, D] per device;
    rules without a D-sharded formulation fall back to the all_gather path.
    """
    axes: Tuple[str, ...] = (axis,) if isinstance(axis, str) else tuple(axis)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    assert num_clients % n_shards == 0, (num_clients, n_shards)
    needs_matrix = defense.name not in ("fedavg", "none")
    use_dshard = param_sharded and supports_dshard(defense)
    if getattr(defense, "stateful", False):
        raise ValueError(
            f"defense {defense.name!r} carries cross-round state, which "
            "this explicit sharded round does not thread (its history "
            "would silently reset every round); use RoundEngine(mesh=...) "
            "for stateful defenses"
        )

    def shard_body(params, key, arrays, mask, counts, malicious):
        # Per-shard client training: vmap over the local C/p clients.
        # Flat shard index across all client axes (major -> minor).
        shard_idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            shard_idx = shard_idx * mesh.shape[a] + jax.lax.axis_index(a)
        local_c = mask.shape[0]
        ckeys = jax.vmap(
            lambda i: jax.random.fold_in(key, shard_idx * local_c + i)
        )(jnp.arange(local_c))
        new_stacked, losses = jax.vmap(
            local_train_fn, in_axes=(None, 0, 0, 0)
        )(params, arrays, mask, ckeys)
        updates = flatten_stacked(new_stacked)  # [C/p, D]
        global_flat = flatten_tree(params)

        # SAME key derivation as rounds/engine.py: randomized attacks and
        # defenses (gaussian/ALIE noise, DnC coordinate draws) then make
        # identical draws on both paths, so the engine-vs-sharded
        # equivalence tests hold beyond deterministic rules.
        akey, dkey, _ = jax.random.split(jax.random.fold_in(key, 0x5EC), 3)

        if attack is not None:
            # Apply the attack to the FULL [C, D] matrix, exactly like the
            # engine path (rounds/engine.py): statistics-based attacks
            # (ALIE, Min-Max/Min-Sum, IPM, adaptive-krum) compute benign
            # mean/std/pairwise thresholds over ALL clients, and colluders
            # must emit one shared crafted vector — per-shard application
            # would craft from each shard's local (possibly empty) benign
            # sample and draw shard-uncorrelated randomness. The gather is
            # replicated-deterministic (same key everywhere), so every
            # shard computes the identical poisoned matrix and slices its
            # own rows back. Costs one extra [C, D] gather in attack
            # rounds; robust-rule rounds gather that matrix anyway.
            all_updates = jax.lax.all_gather(updates, axes, tiled=True)
            all_mal = jax.lax.all_gather(malicious, axes, tiled=True)
            poisoned = attack.poison_updates(
                akey, all_updates, global_flat, all_mal, num_clients
            )
            updates = jax.lax.dynamic_slice_in_dim(
                poisoned, shard_idx * local_c, local_c, 0
            )

        if not needs_matrix:
            # Reduce, don't gather: psum of weighted partial sums.
            w = counts.astype(jnp.float32)
            part = jnp.einsum("c,cd->d", w, updates)
            total_w = jnp.sum(w)
            agg = jax.lax.psum(part, axes) / jnp.maximum(
                jax.lax.psum(total_w, axes), 1e-12
            )
        elif use_dshard:
            # Keep the matrix sharded along D: all_to_all to [C, D/p],
            # run the rule in its natural layout, gather only the [D/p]
            # aggregate slices at the end (parallel/dshard.py).
            d = updates.shape[1]
            pad = (-d) % n_shards
            upd_p = jnp.pad(updates, ((0, 0), (0, pad)))
            upd_ds = jax.lax.all_to_all(
                upd_p, axes, split_axis=1, concat_axis=0, tiled=True
            )  # [C, (D+pad)/p]
            all_counts = jax.lax.all_gather(counts, axes, tiled=True)
            agg_local = dshard_aggregate(
                defense, upd_ds, all_counts.astype(jnp.float32), axes
            )
            agg = jax.lax.all_gather(agg_local, axes, tiled=True)[:d]
        else:
            # Robust rules need the full [C, D] matrix: all_gather rows.
            all_updates = jax.lax.all_gather(updates, axes, tiled=True)
            all_counts = jax.lax.all_gather(counts, axes, tiled=True)
            ctx = {"global": global_flat, "key": dkey}
            agg, _ = defense.aggregate_with_aux(
                all_updates, all_counts.astype(jnp.float32), ctx
            )
        new_params = unflatten_tree(params, agg)
        # The aggregate is replicated by construction; the mean loss must be
        # explicitly reduced to be a valid replicated output.
        return new_params, jax.lax.pmean(jnp.mean(losses), axes)

    spec = P(axes if len(axes) > 1 else axes[0])
    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), spec, spec, spec, spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
