"""Asynchronous buffered FL server (FedBuff — Nguyen et al., AISTATS'22).

Beyond-reference capability: the reference's runtime (and this repo's
``FLServer``) is fully synchronous — every round blocks on the slowest
client (reference: src/server/fl_server.py round loop via Flower). Here
clients train CONTINUOUSLY: each one gets a new task the moment its
previous update arrives, and the server aggregates whenever ``buffer_size``
updates have accumulated — so one straggler delays nothing and fast
clients contribute proportionally more.

Protocol
--------
* Server -> client: ``{"type": "fit_async", "version": v, "params": ...}``
  immediately after hello, and again right after every update the client
  sends (with whatever the CURRENT global is).
* Client -> server: ``{"type": "update", "delta": new - received,
  "version": v_received, "num_examples": n, "metrics": ...}``.
* When the buffer holds ``buffer_size`` deltas the server aggregates:

      staleness  s_i = current_version - v_i
      weight     w_i = n_i * (1 + s_i)^(-staleness_exponent)
      global    += server_lr * defense.aggregate(buffer deltas, w)

  (staleness_exponent 0.5 is the paper's 1/sqrt(1+s) discount). The
  buffered [K, D] delta matrix passes through the same pluggable defense
  surface as the sync server, so robust rules (trimmed-mean, norm
  bounding, ...) compose with async aggregation — with the caveat that
  distance-based rules now compare mixed-staleness deltas.
* After ``num_aggregations`` buffer flushes the server sends ``done`` to
  every client as its next task and returns the final global.

Fault tolerance: a dead client's reader thread just stops producing
updates; aggregation continues with the rest. The run only fails if every
client dies before the target number of aggregations.
"""

from __future__ import annotations

import logging
import queue
import socket
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np

from multimodal_fl_security_tpu.defenses import get_defense
from multimodal_fl_security_tpu.runtime.transport import recv_msg, send_msg

logger = logging.getLogger(__name__)


class AsyncFLServer:
    def __init__(
        self,
        initial_params: np.ndarray,       # flat float32 vector
        num_clients: int,
        num_aggregations: int,
        buffer_size: int = 2,
        server_lr: float = 1.0,
        staleness_exponent: float = 0.5,
        defense_type: str = "none",
        defense_config: Optional[Dict[str, Any]] = None,
        host: str = "0.0.0.0",
        port: int = 8080,
        drain_timeout: float = 600.0,
    ):
        self.drain_timeout = float(drain_timeout)
        self.params = np.asarray(initial_params, np.float32)
        self.num_clients = int(num_clients)
        self.num_aggregations = int(num_aggregations)
        self.buffer_size = max(1, int(buffer_size))
        self.server_lr = float(server_lr)
        self.staleness_exponent = float(staleness_exponent)
        self.defense = get_defense(defense_type, defense_config or {})
        self.host, self.port = host, int(port)
        self.version = 0
        self._tasks_sent = 0
        self.history: List[Dict[str, Any]] = []

    # ------------------------------------------------------------------
    def serve(self) -> np.ndarray:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(self.num_clients)
        logger.info("async server listening on %s:%d", self.host, self.port)

        updates: "queue.Queue[Dict[str, Any]]" = queue.Queue()
        conns: Dict[int, socket.socket] = {}
        send_locks: Dict[int, threading.Lock] = {}
        readers: List[threading.Thread] = []

        def reader(cid: int, conn: socket.socket) -> None:
            try:
                while True:
                    msg = recv_msg(conn)
                    if msg.get("type") == "update":
                        updates.put(msg)
            except (OSError, ConnectionError, ValueError):
                logger.warning("async client %d disconnected", cid)
                updates.put({"type": "client_dead", "client_id": cid})

        try:
            while len(conns) < self.num_clients:
                conn, addr = srv.accept()
                try:
                    hello = recv_msg(conn)
                except (OSError, ConnectionError, ValueError):
                    conn.close()  # launcher liveness probe
                    continue
                cid = int(hello.get("client_id", len(conns)))
                if cid in conns:
                    # A duplicate id (stale client from a previous run on
                    # this port) would silently replace the live socket and
                    # stall the accept loop short of num_clients forever.
                    logger.warning(
                        "async client id %d already connected; rejecting "
                        "duplicate from %s", cid, addr)
                    conn.close()
                    continue
                conns[cid] = conn
                send_locks[cid] = threading.Lock()
                logger.info("async client %d connected from %s", cid, addr)

            # Kick everyone off, then start the readers.
            for cid, conn in conns.items():
                self._send_task(conn, send_locks[cid])
            for cid, conn in conns.items():
                t = threading.Thread(target=reader, args=(cid, conn),
                                     daemon=True)
                t.start()
                readers.append(t)

            buffer: List[Dict[str, Any]] = []
            dead: set = set()
            done = 0
            while done < self.num_aggregations:
                if len(dead) >= self.num_clients:
                    raise RuntimeError(
                        f"all clients died after {done}/"
                        f"{self.num_aggregations} aggregations"
                    )
                msg = updates.get()
                if msg.get("type") == "client_dead":
                    dead.add(int(msg["client_id"]))
                    continue
                buffer.append(msg)
                if len(buffer) >= self.buffer_size:
                    self._aggregate(buffer)
                    buffer = []
                    done += 1
                # Hand the sender a fresh task on the (possibly new) global.
                cid = int(msg["client_id"])
                if cid in conns and cid not in dead:
                    try:
                        self._send_task(conns[cid], send_locks[cid])
                    except OSError:
                        dead.add(cid)

            # Shutdown drain: every live client has exactly ONE in-flight
            # task (tasks are handed out 1:1 with received updates), so
            # wait for that last update and answer it with 'done'. Closing
            # the sockets immediately instead would have mid-training
            # clients write into a reset connection and die without ever
            # reading 'done'.
            pending = set(conns) - dead
            deadline = time.monotonic() + self.drain_timeout
            while pending:
                try:
                    msg = updates.get(
                        timeout=max(0.1, deadline - time.monotonic())
                    )
                except queue.Empty:
                    logger.warning(
                        "shutdown drain timed out; %d clients still "
                        "pending", len(pending)
                    )
                    break
                cid = int(msg.get("client_id", -1))
                if msg.get("type") == "client_dead":
                    pending.discard(cid)
                    dead.add(cid)
                    continue
                if cid in pending:
                    pending.discard(cid)
                    try:
                        with send_locks[cid]:
                            send_msg(conns[cid], {"type": "done"})
                    except OSError:
                        pass
                if time.monotonic() > deadline:
                    logger.warning(
                        "shutdown drain deadline passed; %d clients still "
                        "pending", len(pending)
                    )
                    break
            return self.params
        finally:
            for conn in conns.values():
                try:
                    conn.close()
                except OSError:
                    pass
            srv.close()

    # ------------------------------------------------------------------
    def _send_task(self, conn: socket.socket, lock: threading.Lock) -> None:
        with lock:
            # ``task`` is a unique per-task nonce: the client folds it into
            # its training PRNG key, so two consecutive tasks at the SAME
            # global version still train with different batch order/dropout
            # (keying on version alone made a fast client resend
            # byte-identical deltas until the next flush).
            self._tasks_sent += 1
            send_msg(conn, {"type": "fit_async", "version": self.version,
                            "task": self._tasks_sent,
                            "params": self.params})

    def _aggregate(self, buffer: List[Dict[str, Any]]) -> None:
        from multimodal_fl_security_tpu.runtime.fedbuff import (
            fedbuff_aggregate,
            staleness_weights,
        )

        deltas = np.stack(
            [np.asarray(m["delta"], np.float32) for m in buffer]
        )
        versions = np.asarray(
            [int(m.get("version", 0)) for m in buffer], np.float32
        )
        n = np.asarray(
            [float(m.get("num_examples", 1)) for m in buffer], np.float32
        )
        w, stale = staleness_weights(versions, self.version, n,
                                     self.staleness_exponent)
        self.params = fedbuff_aggregate(self.params, deltas, w,
                                        self.defense, self.server_lr,
                                        flush_idx=self.version)
        self.version += 1
        mean_loss = float(np.mean(
            [m.get("metrics", {}).get("loss", np.nan) for m in buffer]
        ))
        self.history.append({
            "version": self.version,
            "buffer_size": len(buffer),
            "mean_staleness": float(stale.mean()),
            "max_staleness": float(stale.max()),
            "mean_client_loss": mean_loss,
            "defense": self.defense.name,
        })
        logger.info(
            "async aggregation %d: buffer=%d mean_staleness=%.2f",
            self.version, len(buffer), float(stale.mean()),
        )


def start_async_server(
    initial_params: np.ndarray,
    num_clients: int,
    num_aggregations: int,
    buffer_size: int = 2,
    server_lr: float = 1.0,
    staleness_exponent: float = 0.5,
    defense_type: str = "none",
    defense_config: Optional[Dict[str, Any]] = None,
    host: str = "0.0.0.0",
    port: int = 8080,
    drain_timeout: float = 600.0,
) -> np.ndarray:
    server = AsyncFLServer(
        initial_params, num_clients, num_aggregations, buffer_size,
        server_lr, staleness_exponent, defense_type, defense_config,
        host, port, drain_timeout,
    )
    return server.serve()
