"""The jitted federated round program.

This replaces the reference's sequential per-client Python loop
(reference: experiments/run_experiments.py:186-279) with ONE compiled XLA
program per round:

    clients = leading array axis C
    local training  = vmap over C of (scan over epochs of (scan over batches))
    model poisoning = masked transform of the stacked [C, D] update matrix
    aggregation     = robust reduction over the client axis
    (FLTrust's root-dataset training is a nested jitted train step)

so a round never leaves HBM. The client axis can be sharded over a device
mesh (parallel/mesh.py); XLA inserts the ICI collectives implied by the
cross-client reductions.

Local-training parity choices (vs reference run_simulation:193-240):
  - a FRESH optimizer per client per round (the reference constructs a new
    torch.optim.SGD inside the loop, so momentum resets each round);
  - SGD momentum 0.9, global-norm gradient clipping at 1.0 applied before
    weight decay (torch clips grads, then SGD.step applies wd);
  - cross-entropy averaged over the real (unpadded) samples of each batch;
  - clients run ``local_epochs`` full passes over their shard in a fresh
    random order per epoch. Ragged Dirichlet shards are padded to N_max and
    masked; padded slots contribute nothing to loss or statistics.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_fl_security_tpu.core.pytrees import (
    flatten_stacked,
    flatten_tree,
    unflatten_tree,
)
from multimodal_fl_security_tpu.data.stacking import ClientData


def make_optimizer(learning_rate: float, momentum: float = 0.9,
                   weight_decay: float = 0.0, clip_norm: float = 1.0):
    """torch.optim.SGD-equivalent chain: clip -> weight decay -> momentum -> lr."""
    txs = []
    if clip_norm and clip_norm > 0:
        txs.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay and weight_decay > 0:
        txs.append(optax.add_decayed_weights(weight_decay))
    if momentum and momentum > 0:
        txs.append(optax.trace(decay=momentum))
    txs.append(optax.scale(-learning_rate))
    return optax.chain(*txs)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  mask: jnp.ndarray,
                  smoothing: float = 0.0) -> jnp.ndarray:
    """Mean CE over real samples (padding masked out).

    ``smoothing`` > 0 mixes the one-hot target with the uniform
    distribution (standard label smoothing): loss = (1-s)*NLL(y) +
    s*mean_k(-log p_k). The reference trains with plain CE only; the
    smoothing knob exists for the from-scratch CUB-200 baseline."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if smoothing and smoothing > 0.0:
        s = float(smoothing)
        nll = (1.0 - s) * nll + s * (-jnp.mean(logp, axis=-1))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


def make_lr_schedule(kind: str = "constant", total_rounds: int = 0,
                     warmup_rounds: int = 0, min_lr_frac: float = 0.0):
    """Per-ROUND learning-rate scale (multiplies the base lr).

    Returns None for "constant" (no scaling anywhere), or a jnp-traceable
    ``sched(round_idx) -> scale`` for "cosine": linear warmup over
    ``warmup_rounds`` then a cosine decay to ``min_lr_frac`` (default 0)
    at ``total_rounds``. The floor exists because both long CUB runs
    peaked ~70% through the horizon and then drifted DOWN as lr -> 0
    (artifacts/cub200/: 160px best@~140/200, 224px best 0.4427@169/240,
    final 0.4211) — a small floor keeps late rounds learning instead of
    freezing into the overfit. The reference trains at a constant lr; the
    schedule is a beyond-reference knob for long from-scratch runs
    (CUB-200)."""
    if kind in (None, "", "constant"):
        return None
    if kind == "cosine":
        w = float(max(int(warmup_rounds), 0))
        t = float(max(int(total_rounds), 1))
        f = float(min(max(min_lr_frac, 0.0), 1.0))

        def sched(r):
            r = jnp.asarray(r, jnp.float32)
            warm = (r + 1.0) / jnp.maximum(w, 1.0)
            prog = jnp.clip((r - w) / jnp.maximum(t - w, 1.0), 0.0, 1.0)
            cos = f + (1.0 - f) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
            return jnp.where(r < w, warm, cos)

        return sched
    raise ValueError(f"unknown lr_schedule: {kind!r}")


@dataclass
class TrainSpec:
    """Static hyperparameters of a local training run."""

    learning_rate: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 0.0
    clip_norm: float = 1.0
    local_epochs: int = 1
    batch_size: int = 32
    #: "none" | "flip" | "crop" | "crop_flip" — on-device train-time
    #: augmentation (data/preprocess.py::make_augment_fn)
    augment: str = "none"
    #: FedProx (Li et al., MLSys'20) proximal coefficient: adds
    #: mu/2 * ||w - w_global||^2 to every local step's loss, anchoring
    #: heterogeneous clients to the round-start global. 0 = plain FedAvg
    #: local training (the reference's only mode).
    fedprox_mu: float = 0.0
    #: top-level param subtrees to FREEZE during local training (transfer
    #: learning — reference: cub200_cnn.py:40-44 freeze_backbone). Frozen
    #: subtrees are masked out of the gradients (so they don't consume
    #: clip-norm budget, like requires_grad=False) and out of the final
    #: updates (so weight decay cannot move them either).
    frozen_prefixes: tuple = ()
    #: unroll factor for the per-batch training scan (XLA sees `unroll`
    #: steps per iteration — more fusion surface at the cost of compile
    #: time). 1 = plain scan.
    scan_unroll: int = 1
    #: label smoothing coefficient for the local CE loss (0 = the
    #: reference's plain CE).
    label_smoothing: float = 0.0
    #: per-round lr scale: "constant" | "cosine" (linear warmup over
    #: ``warmup_rounds`` rounds, cosine decay to ``min_lr_frac`` at
    #: ``schedule_rounds``).
    lr_schedule: str = "constant"
    warmup_rounds: int = 0
    schedule_rounds: int = 0
    #: cosine floor as a fraction of the base lr (0 = decay to zero).
    min_lr_frac: float = 0.0


def make_local_train_fn(model, spec: TrainSpec, n_samples: int,
                        adapt: Optional[Callable] = None) -> Callable:
    """Build local_train(params, data, mask, key) -> (new_params, mean_loss).

    ``data`` holds one client's stacked modality arrays [N_max, ...];
    ``mask`` is [N_max]. Shapes are static: N_max must be a multiple of the
    batch size (data/stacking.py pads to it).

    ``adapt`` (data/stacking.py::make_batch_adapter) restores flat-stored
    features to their logical shape per gathered batch — the model and the
    augmentations always see logical shapes regardless of resident layout.
    """
    bsz = spec.batch_size
    assert n_samples % bsz == 0, "pad N_max to a batch-size multiple"
    steps = n_samples // bsz
    opt = make_optimizer(spec.learning_rate, spec.momentum, spec.weight_decay,
                         spec.clip_norm)
    from multimodal_fl_security_tpu.data.preprocess import make_augment_fn

    augment = make_augment_fn(spec.augment)

    mu = float(spec.fedprox_mu)

    frozen = tuple(spec.frozen_prefixes)

    def freeze_mask(tree):
        if not frozen:
            return tree
        return {
            k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                if any(k.startswith(p) for p in frozen) else v)
            for k, v in tree.items()
        }

    def loss_fn(params, batch, bmask, step_key, anchor):
        if adapt is not None:
            batch = adapt(batch)
        if augment is not None:
            akey, dropout_key = jax.random.split(step_key)
            batch = augment(akey, batch)
        else:
            dropout_key = step_key
        logits = model.apply(
            {"params": params}, batch, train=True, rngs={"dropout": dropout_key}
        )
        loss = cross_entropy(logits, batch["label"], bmask,
                             smoothing=spec.label_smoothing)
        if mu > 0.0:
            # FedProx proximal term; ``anchor`` is the round-start global
            # (not differentiated — it enters as a plain argument).
            sq = sum(
                jnp.sum(jnp.square(p.astype(jnp.float32) - a.astype(jnp.float32)))
                for p, a in zip(
                    jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(anchor),
                )
            )
            loss = loss + 0.5 * mu * sq
        return loss

    def local_train(params, data, mask, key, lr_scale=1.0):
        # ``lr_scale`` multiplies the base learning rate for this whole
        # local run (the round engine passes the lr-schedule value; the
        # optimizer chain ends in scale(-lr), so scaling the emitted
        # update is exactly lr -> lr * lr_scale).
        anchor = params  # round-start global = the FedProx anchor
        opt_state = opt.init(params)

        def epoch_fn(carry, ekey):
            params, opt_state = carry
            # Per-step row gather from the resident client shard: measured
            # identical to a materialized epoch shuffle on v5e, and it does
            # not duplicate the shard in HBM (matters at CUB-200 scale).
            perm = jax.random.permutation(ekey, n_samples).reshape(steps, bsz)
            skeys = jax.random.split(jax.random.fold_in(ekey, 7), steps)

            def step_fn(carry, xs):
                params, opt_state = carry
                idx, skey = xs
                batch = {k: v[idx] for k, v in data.items()}
                bmask = mask[idx]
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, batch, bmask, skey, anchor
                )
                grads = freeze_mask(grads)
                updates, opt_state = opt.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(
                    lambda u: u * lr_scale, updates
                )
                updates = freeze_mask(updates)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step_fn, (params, opt_state), (perm, skeys),
                unroll=max(1, int(spec.scan_unroll)),
            )
            return (params, opt_state), jnp.mean(losses)

        ekeys = jax.random.split(key, spec.local_epochs)
        (params, _), epoch_losses = jax.lax.scan(
            epoch_fn, (params, opt_state), ekeys
        )
        return params, jnp.mean(epoch_losses)

    return local_train


class RoundEngine:
    """Compiles and runs federated rounds for one experiment."""

    def __init__(
        self,
        model,
        client_data: ClientData,
        spec: TrainSpec,
        attack=None,
        defense=None,
        malicious_clients: Optional[list] = None,
        root_data: Optional[Dict[str, np.ndarray]] = None,
        mesh=None,
        clients_per_round: Optional[int] = None,
        server_opt=None,
        client_chunk: Optional[int] = None,
    ):
        from multimodal_fl_security_tpu.attacks.base import NoAttack
        from multimodal_fl_security_tpu.defenses.base import NoDefense

        self.model = model
        self.spec = spec
        self.attack = attack or NoAttack()
        self.defense = defense or NoDefense()
        self.num_clients = client_data.num_clients
        self.mesh = mesh
        # Client sampling (the reference trains every client each round in
        # simulation; its Flower path samples via fraction_fit). None or
        # >= num_clients means full participation.
        self.clients_per_round = (
            None
            if not clients_per_round or clients_per_round >= self.num_clients
            else int(clients_per_round)
        )
        # Chunked client axis: vmap over `client_chunk` clients inside a
        # lax.map over chunks, so XLA compiles ONE chunk-sized body however
        # large C grows. Measured necessity: the axon service's compile of
        # the fully-vmapped round is minutes at C=100 but >28 min at C=200
        # (grouped-conv group count drives compile cost superlinearly);
        # a 100-client chunk already saturates the chip, so chunking costs
        # little runtime and bounds compile time.
        participants = self.clients_per_round or self.num_clients
        self.client_chunk = None
        if client_chunk and 0 < int(client_chunk) < participants:
            if participants % int(client_chunk) != 0:
                raise ValueError(
                    f"client_chunk={client_chunk} must divide the "
                    f"per-round participant count {participants}"
                )
            self.client_chunk = int(client_chunk)

        mal = np.zeros((self.num_clients,), np.float32)
        for i in malicious_clients or []:
            mal[i] = 1.0
        self.malicious_mask = jnp.asarray(mal)

        # Device placement (optionally sharded over the client mesh axis).
        self.arrays = {k: jnp.asarray(v) for k, v in client_data.arrays.items()}
        self.mask = jnp.asarray(client_data.mask)
        self.counts = jnp.asarray(client_data.counts.astype(np.float32))
        if mesh is not None:
            from multimodal_fl_security_tpu.parallel.mesh import shard_client_arrays

            self.arrays, self.mask, self.counts = shard_client_arrays(
                mesh, self.arrays, self.mask, self.counts
            )

        # Flat-resident layouts (data/stacking.py::to_flat_layout) carry
        # the logical feature shapes; the adapter restores them per batch
        # at the model boundary (fused into the gather under jit).
        from multimodal_fl_security_tpu.data.stacking import make_batch_adapter

        self._adapt = make_batch_adapter(client_data.feature_shapes)
        self._local_train = make_local_train_fn(
            model, spec, client_data.max_samples, adapt=self._adapt
        )

        # FLTrust root-dataset training program (reference: fltrust.py:93-150).
        self._server_train = None
        if getattr(self.defense, "needs_server_grad", False):
            if root_data is None:
                raise ValueError(
                    f"defense {self.defense.name} needs a root dataset"
                )
            self._server_train = self._make_server_train(root_data)

        # Stateful defenses (e.g. FoolsGold) thread a state pytree through
        # the jitted round; the engine owns it between dispatches. Lazily
        # initialized on the first run_round (needs the flat param dim).
        self._defense_stateful = bool(getattr(self.defense, "stateful", False))
        self._defense_state = None

        # Optional server-side optimizer (rounds/server_opt.py): the
        # aggregate becomes a pseudo-gradient; its [D]-vector moments are
        # threaded through the jitted round like defense state.
        self.server_opt = server_opt
        self._server_opt_state = None

        # Per-round lr scale (None = constant). run_round evaluates it
        # host-side from its round_idx argument; run_rounds evaluates it
        # inside the scan body.
        self._lr_schedule = make_lr_schedule(
            spec.lr_schedule, spec.schedule_rounds, spec.warmup_rounds,
            spec.min_lr_frac,
        )

        self._round_fn = jax.jit(self._build_round_fn())
        self._detect_fn = None  # built lazily, once, by detect_malicious
        self._multi_fn = None   # built lazily, once, by run_rounds

    # ------------------------------------------------------------------
    def _make_server_train(self, root_data: Dict[str, np.ndarray]) -> Callable:
        d = self.defense
        bsz = min(int(getattr(d, "batch_size", 32)),
                  len(root_data["label"]))
        n = (len(root_data["label"]) // bsz) * bsz
        data = {k: jnp.asarray(v[:n]) for k, v in root_data.items()}
        mask = jnp.ones((n,), jnp.float32)
        spec = TrainSpec(
            learning_rate=float(getattr(d, "learning_rate", 0.01)),
            momentum=0.9,
            weight_decay=0.0,
            clip_norm=0.0,  # the reference's server step does not clip
            local_epochs=int(getattr(d, "local_epochs", 1)),
            batch_size=bsz,
        )
        train = make_local_train_fn(self.model, spec, n)

        def server_train(params, key):
            new_params, _ = train(params, data, mask, key)
            return flatten_tree(new_params) - flatten_tree(params)

        return server_train

    # ------------------------------------------------------------------
    def _make_vtrain(self) -> Callable:
        """Client-axis local training, chunk-aware.

        Returns ``train_all(params, arrays, mask, ckeys) -> (stacked,
        losses)`` — a plain vmap over the leading client axis, or (when
        ``client_chunk`` is set and divides the row count) a vmap of one
        chunk inside a ``lax.map`` over chunks, so XLA compiles ONE
        chunk-sized body however large C grows (see __init__ for the
        measured compile-time necessity). Used by both the round program
        and :meth:`detect_malicious`; a row count the chunk does not
        divide (detection runs the FULL client axis even under
        subsampling) falls back to the plain vmap.
        """
        vtrain = jax.vmap(self._local_train, in_axes=(None, 0, 0, 0, None))
        ch = self.client_chunk

        def train_all(params, arrays, mask, ckeys, lr_scale=1.0):
            rows = mask.shape[0]
            if ch is None or rows <= ch or rows % ch != 0:
                return vtrain(params, arrays, mask, ckeys, lr_scale)
            n_chunks = rows // ch

            def chunk(xs):
                a, m, k = xs
                return vtrain(params, a, m, k, lr_scale)

            stacked, losses = jax.lax.map(chunk, (
                {k: v.reshape((n_chunks, ch) + v.shape[1:])
                 for k, v in arrays.items()},
                mask.reshape(n_chunks, ch, -1),
                ckeys.reshape((n_chunks, ch) + ckeys.shape[1:]),
            ))
            stacked = jax.tree_util.tree_map(
                lambda x: x.reshape((n_chunks * ch,) + x.shape[2:]), stacked
            )
            return stacked, losses.reshape(-1)

        return train_all

    # ------------------------------------------------------------------
    def _build_round_fn(self) -> Callable:
        attack, defense = self.attack, self.defense
        num_clients = self.num_clients

        k_sample = self.clients_per_round

        stateful = self._defense_stateful

        server_opt = self.server_opt

        train_all = self._make_vtrain()

        def round_fn(params, key, arrays, mask, counts, malicious_mask,
                     defense_state, server_opt_state, lr_scale=1.0):
            global_flat = flatten_tree(params)
            if k_sample is not None:
                # Sample a participant subset (without replacement) and
                # gather their rows; shapes stay static at k_sample.
                sample_idx = jax.random.permutation(
                    jax.random.fold_in(key, 0x5A3), num_clients
                )[:k_sample]
                arrays = {k: v[sample_idx] for k, v in arrays.items()}
                mask = mask[sample_idx]
                counts = counts[sample_idx]
                malicious_mask = malicious_mask[sample_idx]
                client_ids = sample_idx
            else:
                client_ids = jnp.arange(num_clients)
            ckeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(client_ids)
            new_stacked, client_losses = train_all(
                params, arrays, mask, ckeys, lr_scale
            )

            updates = flatten_stacked(new_stacked)  # [C, D]

            key_attack, key_defense, key_server = jax.random.split(
                jax.random.fold_in(key, 0x5EC), 3
            )
            updates = attack.poison_updates(
                key_attack, updates, global_flat, malicious_mask,
                k_sample or num_clients,
            )

            ctx: Dict[str, Any] = {"global": global_flat, "key": key_defense}
            if self._server_train is not None:
                ctx["server_grad"] = self._server_train(params, key_server)

            if stateful:
                per_client = getattr(defense, "state_per_client", False)
                if k_sample is not None and per_client:
                    # Per-client state rows live on the FULL client axis;
                    # hand the defense only the sampled rows and scatter
                    # the updated rows back — history accumulates across
                    # the rounds each client participates in.
                    rows = jax.tree_util.tree_map(
                        lambda s: s[client_ids], defense_state
                    )
                    agg, aux, new_rows = defense.aggregate_stateful(
                        updates, counts, ctx, rows
                    )
                    new_state = jax.tree_util.tree_map(
                        lambda s, r: s.at[client_ids].set(r),
                        defense_state, new_rows,
                    )
                else:
                    agg, aux, new_state = defense.aggregate_stateful(
                        updates, counts, ctx, defense_state
                    )
            else:
                agg, aux, new_state = *defense.aggregate_with_aux(
                    updates, counts, ctx
                ), defense_state
            if server_opt is not None:
                agg, server_opt_state = server_opt.apply(
                    global_flat, agg, server_opt_state
                )
            new_params = unflatten_tree(params, agg)

            metrics = {
                "client_loss_mean": jnp.mean(client_losses),
                "update_norm_mean": jnp.mean(
                    jnp.sqrt(jnp.sum(jnp.square(updates - global_flat), axis=1))
                ),
                **aux,
            }
            return new_params, metrics, new_state, server_opt_state

        return round_fn

    # ------------------------------------------------------------------
    def _ensure_defense_state(self, params) -> None:
        if self._defense_stateful and self._defense_state is None:
            # Per-client state (state_per_client=True) is allocated on the
            # FULL client axis even under subsampling; the round program
            # gathers/scatters the sampled rows.
            dim = int(flatten_tree(params).shape[0])
            self._defense_state = self.defense.init_state(
                self.num_clients, dim
            )
        if self.server_opt is not None and self._server_opt_state is None:
            dim = int(flatten_tree(params).shape[0])
            self._server_opt_state = self.server_opt.init_state(dim)

    def run_round(self, params, key, round_idx: int = 0
                  ) -> Tuple[Any, Dict[str, jnp.ndarray]]:
        self._ensure_defense_state(params)
        scale = (jnp.float32(1.0) if self._lr_schedule is None
                 else jnp.float32(self._lr_schedule(round_idx)))
        new_params, metrics, new_state, so_state = self._round_fn(
            params, key, self.arrays, self.mask, self.counts,
            self.malicious_mask, self._defense_state, self._server_opt_state,
            scale,
        )
        if self._defense_stateful:
            self._defense_state = new_state
        if self.server_opt is not None:
            self._server_opt_state = so_state
        return new_params, metrics

    def run_rounds(self, params, key, num_rounds: int
                   ) -> Tuple[Any, Dict[str, jnp.ndarray]]:
        """Run ``num_rounds`` rounds as ONE device program (scan over rounds).

        The per-round host dispatch of :meth:`run_round` disappears; params
        and every intermediate live in HBM for the whole horizon. Metrics
        come back stacked with a leading round axis.

        Privacy accounting: because callers cannot observe the individual
        rounds, this method steps the defense's host-side accountant by
        ``num_rounds`` itself — callers must NOT also call
        ``account_round`` for these rounds (the per-round
        :meth:`run_round` path leaves accounting to its caller, as the
        runner does).
        """
        self._ensure_defense_state(params)
        if self._multi_fn is None:
            # Built ONCE: a fresh jitted closure per call would retrace
            # and recompile the whole scan-over-rounds program (minutes
            # at C=100) on every invocation. jit's own cache handles
            # distinct static n values.
            round_fn = self._build_round_fn()
            schedule = self._lr_schedule

            @partial(jax.jit, static_argnames=("n",))
            def multi(params, key, arrays, mask, counts, malicious, dstate,
                      sostate, n):
                def body(carry, r):
                    p, st, so = carry
                    rkey = jax.random.fold_in(key, r)
                    scale = 1.0 if schedule is None else schedule(r)
                    new_p, metrics, new_st, new_so = round_fn(
                        p, rkey, arrays, mask, counts, malicious, st, so,
                        scale,
                    )
                    return (new_p, new_st, new_so), metrics

                (p, st, so), metrics = jax.lax.scan(
                    body, (params, dstate, sostate), jnp.arange(n)
                )
                return p, metrics, st, so

            self._multi_fn = multi

        p, metrics, st, so = self._multi_fn(
            params, key, self.arrays, self.mask,
            self.counts, self.malicious_mask,
            self._defense_state,
            self._server_opt_state, n=num_rounds)
        if self._defense_stateful:
            self._defense_state = st
        if self.server_opt is not None:
            self._server_opt_state = so
        if hasattr(self.defense, "account_round"):
            self.defense.account_round(num_rounds)
        return p, metrics

    def detect_malicious(self, params, key):
        """Host-callable detection pass (reference: base_defense.py:49-64).

        The defense judges the SAME update matrix a round would hand it:
        the attack's update transform is applied (a model-poisoning
        attacker poisons its update before the server ever sees it —
        detection against the benign matrix would be blind to exactly
        the clients it exists to flag), with the round's key-derivation
        scheme, and a stateful defense sees its live state via
        ctx["defense_state"]."""
        self._ensure_defense_state(params)
        if self._detect_fn is None:
            train_all = self._make_vtrain()

            def _detect(params, key, arrays, mask, counts, malicious,
                        dstate):
                ckeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.arange(self.num_clients)
                )
                new_stacked, _ = train_all(params, arrays, mask, ckeys)
                updates = flatten_stacked(new_stacked)
                global_flat = flatten_tree(params)
                key_attack, key_defense, key_server = jax.random.split(
                    jax.random.fold_in(key, 0x5EC), 3
                )
                updates = self.attack.poison_updates(
                    key_attack, updates, global_flat, malicious,
                    self.num_clients,
                )
                ctx = {"global": global_flat, "key": key_defense}
                if self._server_train is not None:
                    ctx["server_grad"] = self._server_train(params,
                                                            key_server)
                if dstate is not None:
                    ctx["defense_state"] = dstate
                return self.defense.detect(updates, counts, ctx)

            self._detect_fn = jax.jit(_detect)

        return self._detect_fn(
            params, key, self.arrays, self.mask, self.counts,
            self.malicious_mask,
            self._defense_state if self._defense_stateful else None,
        )
