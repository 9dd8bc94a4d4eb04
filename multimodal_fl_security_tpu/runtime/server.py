"""FL server: gathers client updates, applies a robust defense, broadcasts.

Role parity with the reference's servers (reference: src/server/
fl_server.py:76-186 FedAvgStrategy + start_server; src/server/
robust_server.py:56-128 RobustFedAvg):
  - example-count-weighted FedAvg baseline;
  - pluggable defense applied to the gathered [C, D] update matrix
    ON THE SERVER'S ACCELERATOR (one jnp reduction, not a host loop);
  - **falls back to plain FedAvg if the defense raises**
    (reference: robust_server.py:120-122);
  - flags clients that self-report an attack_type in metrics
    (reference: robust_server.py:84-89);
  - per-round history saved to .npz (reference: fl_server.py:129-137).
"""

from __future__ import annotations

import logging
import socket
import threading
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.defenses import get_defense
from multimodal_fl_security_tpu.runtime.transport import recv_msg, send_msg

logger = logging.getLogger(__name__)


class FLServer:
    def __init__(
        self,
        initial_params: np.ndarray,          # flat float32 vector
        num_clients: int,
        num_rounds: int,
        defense_type: str = "none",
        defense_config: Optional[Dict[str, Any]] = None,
        host: str = "0.0.0.0",
        port: int = 8080,
        fit_timeout: float = 600.0,
    ):
        self.params = np.asarray(initial_params, np.float32)
        self.num_clients = num_clients
        self.num_rounds = num_rounds
        self.defense = get_defense(defense_type, defense_config or {})
        self.host, self.port = host, port
        #: per-round deadline for a client's fit reply; a client that dies or
        #: straggles past it is dropped from the round (and, on a dead
        #: socket, from the experiment). The reference accepted Flower's
        #: failures list but ignored it (reference: robust_server.py:75-79).
        self.fit_timeout = fit_timeout
        self.history: List[Dict[str, Any]] = []
        self.flagged_clients: List[int] = []
        self._round_key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    def serve(self) -> np.ndarray:
        """Run the full FL protocol; returns the final global params."""
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(self.num_clients)
        logger.info("server listening on %s:%d", self.host, self.port)

        conns: List[socket.socket] = []
        try:
            while len(conns) < self.num_clients:
                conn, addr = srv.accept()
                hello = recv_msg(conn)
                logger.info("client %s connected from %s",
                            hello.get("client_id"), addr)
                conns.append(conn)

            for r in range(1, self.num_rounds + 1):
                self._run_round(r, conns)

            for conn in conns:
                send_msg(conn, {"type": "done"})
        finally:
            for conn in conns:
                conn.close()
            srv.close()
        return self.params

    # ------------------------------------------------------------------
    def _run_round(self, round_idx: int, conns: List[socket.socket]) -> None:
        alive = []
        for conn in conns:
            try:
                send_msg(conn, {"type": "fit", "round": round_idx,
                                "params": self.params})
                alive.append(conn)
            except OSError:
                logger.warning("round %d: client socket dead at send, "
                               "dropping", round_idx)
        dead: List[socket.socket] = [c for c in conns if c not in alive]

        updates, weights, metrics = [], [], []
        lock = threading.Lock()

        def gather(conn):
            try:
                conn.settimeout(self.fit_timeout)
                reply = recv_msg(conn)
            except (OSError, ConnectionError, ValueError) as e:
                logger.warning("round %d: dropping client (%s)", round_idx,
                               type(e).__name__)
                with lock:
                    dead.append(conn)
                return
            from multimodal_fl_security_tpu.runtime.compression import (
                decompress_reply,
            )

            with lock:
                updates.append(decompress_reply(reply, self.params))
                weights.append(float(reply.get("num_examples", 1)))
                m = dict(reply.get("metrics", {}))
                m.setdefault("client_id", reply.get("client_id"))
                metrics.append(m)

        threads = [threading.Thread(target=gather, args=(c,)) for c in alive]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # Permanently forget dead sockets so later rounds don't wait on them.
        for c in dead:
            if c in conns:
                conns.remove(c)
            try:
                c.close()
            except OSError:
                pass
        if not updates:
            raise RuntimeError(
                f"round {round_idx}: every client failed before replying"
            )

        # Flag self-reported attackers (reference: robust_server.py:84-89).
        for i, m in enumerate(metrics):
            cid = m.get("client_id")
            cid = i if cid is None else int(cid)
            if m.get("attack_type") and cid not in self.flagged_clients:
                logger.warning("client %d self-reports attack: %s",
                               cid, m["attack_type"])
                self.flagged_clients.append(cid)

        stacked = jnp.asarray(np.stack(updates))
        w = jnp.asarray(np.array(weights, np.float32))
        self._round_key, dkey = jax.random.split(self._round_key)
        ctx = {"global": jnp.asarray(self.params), "key": dkey}
        try:
            agg, aux = self.defense.aggregate_with_aux(stacked, w, ctx)
            detected = self.defense.detect(stacked, w, ctx)
            num_rejected = int(np.asarray(detected).sum())
        except Exception:
            # Defense failure -> plain FedAvg (reference: robust_server.py:120-122).
            logger.exception("defense %s failed; falling back to FedAvg",
                             self.defense.name)
            from multimodal_fl_security_tpu.ops.reductions import weighted_mean

            agg, aux, num_rejected = weighted_mean(stacked, w), {}, 0

        self.params = np.asarray(agg, np.float32)
        # Example-count-weighted metric reduction
        # (reference: fl_server.py:26-40 weighted_average).
        pairs = [(m["loss"], wt) for m, wt in zip(metrics, weights)
                 if "loss" in m]
        mean_loss = (
            float(sum(v * wt for v, wt in pairs) / sum(wt for _, wt in pairs))
            if pairs else None
        )
        entry = {
            "round": round_idx,
            "mean_client_loss": mean_loss,
            "num_rejected": num_rejected,
            "num_failures": len(dead),
            "num_participants": len(updates),
            "defense": self.defense.name,
        }
        # Privacy accounting per applied round (same contract as the
        # simulation loop; SURVEY.md §2.9-6).
        if hasattr(self.defense, "account_round"):
            self.defense.account_round()
            entry["privacy_epsilon"] = self.defense.privacy_spent()["epsilon"]
        self.history.append(entry)
        logger.info("round %d aggregated (%s, rejected=%d)",
                    round_idx, self.defense.name, num_rejected)

    # ------------------------------------------------------------------
    def save_results(self, path: str) -> None:
        """History -> .npz (reference: fl_server.py:129-137)."""
        np.savez(
            path,
            rounds=np.array([h["round"] for h in self.history]),
            mean_client_loss=np.array(
                [h["mean_client_loss"] or np.nan for h in self.history]
            ),
            num_rejected=np.array([h["num_rejected"] for h in self.history]),
        )


def start_server(initial_params: np.ndarray, num_clients: int,
                 num_rounds: int, defense_type: str = "none",
                 defense_config: Optional[Dict[str, Any]] = None,
                 host: str = "0.0.0.0", port: int = 8080) -> np.ndarray:
    server = FLServer(initial_params, num_clients, num_rounds, defense_type,
                      defense_config, host, port)
    return server.serve()
