"""FL clients: honest worker + malicious (attack-injecting) worker.

Role parity with the reference's clients (reference: src/client/
fl_client.py:62-282, src/client/malicious_client.py:39-126):
  - params exchanged as flat float32 vectors (the reference used ndarray
    lists; same information, one buffer);
  - ``fit`` = set params -> jitted local SGD for E epochs -> reply
    (params, num_examples, metrics);
  - the malicious client poisons its shard once at startup (data poisoning)
    and/or its update after training (model poisoning), and self-reports
    ``attack_type`` in metrics exactly as the reference's does
    (malicious_client.py:122-124).
"""

from __future__ import annotations

import logging
import socket
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.attacks import get_attack
from multimodal_fl_security_tpu.core.pytrees import flatten_tree, unflatten_tree
from multimodal_fl_security_tpu.data.datasets import load_dataset
from multimodal_fl_security_tpu.data.partition import partition_data
from multimodal_fl_security_tpu.models import create_model, init_model
from multimodal_fl_security_tpu.rounds.engine import TrainSpec, make_local_train_fn
from multimodal_fl_security_tpu.runtime.transport import recv_msg, send_msg

logger = logging.getLogger(__name__)


def _connect_with_retry(host: str, port: int,
                        deadline_s: float = 180.0) -> socket.socket:
    """Connect, retrying while the server is still booting.

    The launcher staggers the server start by a fixed sleep (reference:
    run_experiment.py:103); on a loaded machine the server's import +
    first jit compile can exceed it, so a refused connection here must
    retry, not crash the client process.
    """
    import time

    t0 = time.monotonic()
    delay = 0.2
    while True:
        try:
            return socket.create_connection((host, port), timeout=600)
        except (ConnectionRefusedError, OSError):
            if time.monotonic() - t0 > deadline_s:
                raise
            time.sleep(delay)
            delay = min(delay * 1.5, 5.0)


class FLClient:
    """Honest client: local shard + jitted local training."""

    def __init__(self, client_id: int, config: Dict[str, Any]):
        self.client_id = client_id
        self.config = config
        if not hasattr(self, "attack"):  # MaliciousFLClient sets it first
            self.attack = None

        dataset = load_dataset(
            config.get("dataset", "synthetic"), "train",
            config.get("data_dir"), **config.get("dataset_params", {})
        )
        parts = partition_data(
            dataset.labels, config["num_clients"],
            config.get("partition", "iid"), alpha=config.get("alpha", 0.5),
            seed=config.get("partition_seed", 42),
        )
        shard = dataset.subset(parts[client_id])
        shard = self._maybe_poison_data(shard)

        self.batch_size = int(config.get("batch_size", 32))
        n = (len(shard) // self.batch_size) * self.batch_size
        n = max(n, self.batch_size)
        pad = max(n - len(shard), 0)
        self.num_examples = len(shard)
        self.data = {
            k: jnp.asarray(np.concatenate([v, v[:pad]])[:n])
            for k, v in shard.arrays.items()
        }
        self.mask = jnp.ones((n,), jnp.float32)

        self.model = create_model(
            config.get("model") or "simple_cnn",
            num_classes=dataset.num_classes,
        )
        sample = {k: v[: self.batch_size] for k, v in self.data.items()}
        self.template_params = init_model(self.model, sample,
                                          seed=0)["params"]
        spec = TrainSpec(
            learning_rate=float(config.get("learning_rate", 0.01)),
            momentum=float(config.get("momentum", 0.9)),
            weight_decay=float(config.get("weight_decay", 0.0)),
            clip_norm=float(config.get("clip_norm", 1.0)),
            local_epochs=int(config.get("local_epochs", 1)),
            batch_size=self.batch_size,
        )
        self._train = jax.jit(make_local_train_fn(self.model, spec, n))

        # Optional uplink compression with error feedback
        # (runtime/compression.py; beyond-reference): "int8", "topk",
        # or "topk8" (top-k indices + int8 values).
        from multimodal_fl_security_tpu.runtime.compression import (
            make_compressor,
        )

        self._compressor = make_compressor(
            config.get("compression"), config
        )

        # Optional secure aggregation (runtime/secure_agg.py): pairwise
        # masks hide this client's update from the server.
        self._secagg = None
        if config.get("secure_aggregation"):
            if self._compressor is not None:
                raise ValueError(
                    "secure_aggregation and compression are mutually "
                    "exclusive: masking operates on the fixed-point-encoded "
                    "delta, so a quantized/sparsified uplink cannot also be "
                    "masked"
                )
            from multimodal_fl_security_tpu.runtime.secure_agg import (
                SecAggClient,
            )

            self._secagg = SecAggClient(
                client_id,
                scale=float(config.get("secagg_scale", 1 << 16)),
                clip=float(config.get("secagg_clip", 32.0)),
            )

    # -- hooks overridden by MaliciousFLClient ---------------------------
    def _maybe_poison_data(self, shard):
        return shard

    def _maybe_poison_update(self, flat_update: np.ndarray,
                             global_flat: np.ndarray,
                             round_idx: int) -> np.ndarray:
        return flat_update

    def _extra_metrics(self) -> Dict[str, Any]:
        return {}

    # ---------------------------------------------------------------------
    def fit(self, global_flat: np.ndarray, round_idx: int):
        params = unflatten_tree(self.template_params,
                                jnp.asarray(global_flat))
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.config.get("seed", 42) + self.client_id),
            round_idx,
        )
        new_params, loss = self._train(params, self.data, self.mask, key)
        flat = np.asarray(flatten_tree(new_params), np.float32)
        flat = self._maybe_poison_update(flat, global_flat, round_idx)
        metrics = {"loss": float(loss), **self._extra_metrics()}
        return flat, self.num_examples, metrics

    # ---------------------------------------------------------------------
    def run(self, host: str = "127.0.0.1", port: int = 8080) -> None:
        sock = _connect_with_retry(host, port,
                                   float(self.config.get(
                                       "connect_timeout", 180.0)))
        try:
            hello = {"type": "hello", "client_id": self.client_id}
            if self._secagg is not None:
                hello["secagg_pub"] = self._secagg.public_key_hex()
                # The server verifies this against its own decode scale —
                # a mismatch would silently mis-scale every aggregate.
                hello["secagg_scale"] = self._secagg.scale
            send_msg(sock, hello)
            while True:
                msg = recv_msg(sock)
                if msg.get("type") == "done":
                    logger.info("client %d done", self.client_id)
                    return
                if msg.get("type") == "secagg_keys":
                    # Install the directory and send back this client's
                    # encrypted Shamir shares of its DH key (dropout
                    # recovery; the server relays but cannot read them).
                    send_msg(sock, self._secagg.handshake(
                        msg["pubs"], msg["threshold"]
                    ))
                elif msg.get("type") == "unmask":
                    # Return plaintext shares: contributors' self-mask
                    # seeds + dropped clients' DH keys (never both for
                    # one owner — enforced inside unmask_reply).
                    send_msg(sock, self._secagg.unmask_reply(msg))
                elif msg.get("type") == "fit_async":
                    # Async/buffered protocol (runtime/async_server.py):
                    # reply with the DELTA plus the global version it was
                    # computed against, so the server can staleness-weight.
                    version = int(msg.get("version", 0))
                    # Per-task nonce (falls back to version): distinct
                    # tasks at the same global version must not reuse the
                    # training key, or a fast client resends identical
                    # deltas until the next flush.
                    nonce = int(msg.get("task", version))
                    flat, n, metrics = self.fit(msg["params"], nonce)
                    send_msg(sock, {
                        "type": "update",
                        "client_id": self.client_id,
                        "version": version,
                        "num_examples": n,
                        "metrics": metrics,
                        "delta": flat - np.asarray(msg["params"], np.float32),
                    })
                elif msg.get("type") == "fit":
                    if self._secagg is not None and msg.get("pubs"):
                        # Install the round's key directory (promotes the
                        # announced next-round keypair — per-round key
                        # rotation, secure_agg.py module docstring §4).
                        self._secagg.begin_round(msg["pubs"])
                    flat, n, metrics = self.fit(msg["params"], msg["round"])
                    reply = {"num_examples": n,
                             "client_id": self.client_id,
                             "metrics": metrics}
                    if self._secagg is not None:
                        delta = flat - np.asarray(msg["params"], np.float32)
                        reply.update(self._secagg.round_payload(
                            delta, n, msg["round"], msg["participants"]
                        ))
                    elif self._compressor is not None:
                        reply.update(
                            self._compressor.compress(flat, msg["params"])
                        )
                    else:
                        reply["params"] = flat
                    send_msg(sock, reply)
        finally:
            sock.close()


class MaliciousFLClient(FLClient):
    """Attack-injecting client (reference: malicious_client.py:39-126)."""

    def __init__(self, client_id: int, config: Dict[str, Any]):
        attack_cfg = dict(config.get("attack_params", {}))
        attack_cfg.setdefault("seed", config.get("seed", 42))
        self.attack = get_attack(config.get("attack_type", "none"), attack_cfg)
        self._num_clients = int(config["num_clients"])
        super().__init__(client_id, config)

    def _maybe_poison_data(self, shard):
        if self.attack.is_data_poisoning():
            # Once, at startup (reference: malicious_client.py:62-77).
            return self.attack.poison_dataset(shard)
        return shard

    def _maybe_poison_update(self, flat_update, global_flat, round_idx):
        if not self.attack.is_model_poisoning():
            return flat_update
        # Single-row call of the vectorized transform
        # (reference: malicious_client.py:102-115). Benign statistics are
        # unknown to a lone attacker here, matching the reference's
        # standalone behavior.
        key = jax.random.fold_in(jax.random.PRNGKey(1234), round_idx)
        updates = jnp.asarray(flat_update)[None, :]
        mal = jnp.ones((1,), jnp.float32)
        out = self.attack.poison_updates(
            key, updates, jnp.asarray(global_flat), mal, self._num_clients
        )
        return np.asarray(out[0], np.float32)

    def _extra_metrics(self) -> Dict[str, Any]:
        # Self-report, as the reference's malicious client does
        # (malicious_client.py:122-124); the server logs/flags it.
        return {"attack_type": self.attack.name}


def start_client(client_id: int, config: Dict[str, Any],
                 host: str = "127.0.0.1", port: int = 8080,
                 malicious: bool = False) -> None:
    cls = MaliciousFLClient if malicious else FLClient
    cls(client_id, config).run(host, port)
