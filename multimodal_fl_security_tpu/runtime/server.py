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
        secure_aggregation: bool = False,
        secagg_scale: Optional[float] = None,
        secagg_min_contributors: int = 2,
        secagg_threshold: Optional[int] = None,
    ):
        self.params = np.asarray(initial_params, np.float32)
        self.num_clients = num_clients
        self.num_rounds = num_rounds
        self.defense = get_defense(defense_type, defense_config or {})
        self.host, self.port = host, port
        #: Bonawitz-style pairwise masking (runtime/secure_agg.py): the
        #: server learns only the weighted sum, so only sum-based defenses
        #: compose with it.
        self.secure_aggregation = bool(secure_aggregation)
        if self.secure_aggregation:
            from multimodal_fl_security_tpu.runtime.secure_agg import (
                SECAGG_COMPATIBLE_DEFENSES,
            )

            if self.defense.name not in SECAGG_COMPATIBLE_DEFENSES:
                raise ValueError(
                    f"secure aggregation hides per-client updates; defense "
                    f"{self.defense.name!r} needs them (compatible: "
                    f"{sorted(SECAGG_COMPATIBLE_DEFENSES)})"
                )
        #: fixed-point scale the masked sum is decoded with. Clients report
        #: their scale in hello and the server REJECTS a mismatch — a client
        #: encoding at a different scale would silently corrupt every
        #: decoded aggregate otherwise.
        if secagg_scale is None:
            from multimodal_fl_security_tpu.runtime.secure_agg import (
                DEFAULT_SCALE,
            )

            secagg_scale = DEFAULT_SCALE
        self.secagg_scale = float(secagg_scale)
        #: privacy floor: below this many contributors the decoded "sum"
        #: narrows to few enough updates that unmasking defeats the point
        #: (Bonawitz et al. enforce a threshold t for this reason). The
        #: round is aborted (params unchanged) instead of decoded.
        self.secagg_min_contributors = max(2, int(secagg_min_contributors))
        #: Shamir t-of-n threshold for share reconstruction; None ->
        #: max(2, n//2 + 1) once n is known. Bonawitz et al. require
        #: t > n/2 so no colluding minority can reconstruct.
        self.secagg_threshold = (int(secagg_threshold)
                                 if secagg_threshold else None)
        #: relayed encrypted x-shares for the CURRENT round's keys:
        #: owner -> {holder: enc_hex}. Rotated every round (clients use
        #: fresh DH keys per round — secure_agg.py module docstring §4).
        self._xshares: Dict[int, Dict[str, str]] = {}
        #: current round's public keys as ints (dropped-key pairwise-seed
        #: recompute) and as the hex directory relayed in fit messages
        self._pubs_int: Dict[int, int] = {}
        self._pubs_hex: Dict[str, str] = {}
        self._conn_ids: Dict[Any, int] = {}
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
        pubs: Dict[str, str] = {}
        try:
            while len(conns) < self.num_clients:
                conn, addr = srv.accept()
                try:
                    hello = recv_msg(conn)
                except (OSError, ConnectionError, ValueError):
                    # Liveness probe (launcher port poll) or a client that
                    # died during hello: ignore, keep accepting.
                    conn.close()
                    continue
                cid = hello.get("client_id")
                logger.info("client %s connected from %s", cid, addr)
                conns.append(conn)
                self._conn_ids[conn] = int(cid if cid is not None
                                           else len(conns) - 1)
                if "secagg_pub" in hello:
                    pubs[str(self._conn_ids[conn])] = hello["secagg_pub"]
                    if "secagg_scale" not in hello:
                        # Defaulting here would vacuously pass the very
                        # mismatch this guard exists to reject.
                        raise RuntimeError(
                            f"client {cid} sent secagg_pub but no "
                            "secagg_scale in hello; refusing — the server "
                            "cannot verify the client's fixed-point "
                            "encoding matches its decode scale"
                        )
                    client_scale = float(hello["secagg_scale"])
                    if client_scale != self.secagg_scale:
                        raise RuntimeError(
                            f"client {cid} encodes at secagg_scale="
                            f"{client_scale} but the server decodes at "
                            f"{self.secagg_scale}; the aggregate would be "
                            "silently mis-scaled. Pass the same "
                            "'secagg_scale' to both."
                        )

            if self.secure_aggregation:
                if len(pubs) < self.num_clients:
                    raise RuntimeError(
                        "secure aggregation enabled but some clients sent "
                        "no secagg_pub in hello"
                    )
                self._pubs_int = {int(c): int(p, 16) for c, p in pubs.items()}
                self._pubs_hex = dict(pubs)
                if self.secagg_threshold is None:
                    self.secagg_threshold = max(2, self.num_clients // 2 + 1)
                # Relay the public-key directory + threshold (SecAgg
                # round 0), then collect each client's encrypted Shamir
                # shares of its DH private key (dropout recovery).
                for conn in conns:
                    send_msg(conn, {"type": "secagg_keys", "pubs": pubs,
                                    "threshold": self.secagg_threshold})
                setup_dead: List[socket.socket] = []
                for rep in self._gather_replies(conns, 0, setup_dead):
                    rep.pop("_conn", None)
                    self._xshares[int(rep["client_id"])] = dict(
                        rep.get("shares", {})
                    )
                if setup_dead:
                    raise RuntimeError(
                        "secure aggregation setup failed: a client died "
                        "before sharing its key"
                    )

            for r in range(1, self.num_rounds + 1):
                if self._run_round(r, conns) is False:
                    # The run can no longer proceed safely (e.g. live
                    # clients fell below the Shamir threshold): keep the
                    # current params and release the survivors cleanly.
                    logger.error("ending run early after round %d", r)
                    break

            for conn in conns:
                send_msg(conn, {"type": "done"})
        finally:
            for conn in conns:
                conn.close()
            srv.close()
        return self.params

    # ------------------------------------------------------------------
    def _run_round(self, round_idx: int, conns: List[socket.socket]) -> None:
        if self.secure_aggregation:
            return self._run_round_secagg(round_idx, conns)
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
    def _gather_replies(self, conns: List[socket.socket], round_idx: int,
                        dead: List[socket.socket]) -> List[Dict[str, Any]]:
        """Threaded reply gather; dead sockets appended to ``dead``."""
        replies: List[Dict[str, Any]] = []
        lock = threading.Lock()

        def gather(conn):
            try:
                conn.settimeout(self.fit_timeout)
                reply = recv_msg(conn)
            except (OSError, ConnectionError, ValueError) as e:
                logger.warning("round %d: dropping client %s (%s)", round_idx,
                               self._conn_ids.get(conn), type(e).__name__)
                with lock:
                    dead.append(conn)
                return
            reply["_conn"] = conn
            with lock:
                replies.append(reply)

        threads = [threading.Thread(target=gather, args=(c,)) for c in conns]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return replies

    def _forget_dead(self, conns: List[socket.socket],
                     dead: List[socket.socket]) -> None:
        for c in dead:
            if c in conns:
                conns.remove(c)
            try:
                # Best-effort farewell: a retired-but-alive client (rekey
                # failure, straggler) exits cleanly on 'done' instead of
                # crashing on a reset connection. Genuinely dead sockets
                # just raise into the except.
                send_msg(c, {"type": "done"})
            except OSError:
                pass
            try:
                c.close()
            except OSError:
                pass

    def _run_round_secagg(self, round_idx: int,
                          conns: List[socket.socket]) -> Optional[bool]:
        """One round under double-masked aggregation (secure_agg.py).

        The server sums self+pairwise-masked uint64 vectors, then runs
        the unmask round EVERY round: surviving contributors return
        Shamir shares of (a) every contributor's per-round self-mask seed
        and (b) every dropped client's DH key. With >= t share replies
        the round completes even when a contributor dies AFTER submitting
        but BEFORE unmasking (Bonawitz et al. CCS'17 §4); with fewer, the
        round aborts (params unchanged).

        Per-round key rotation (secure_agg.py module docstring §4): the
        fit message relays the round's public-key directory, fit replies
        announce next-round keys, and unmask replies distribute the
        next-round key shares — so a dropped client's reconstructed key
        never unlocks any other round's masks.

        Returns False when the run cannot continue (live clients below
        the Shamir threshold: no future round could ever be unmasked).
        """
        from multimodal_fl_security_tpu.runtime.secure_agg import (
            SecAggServerRound,
            reconstruct_secrets,
        )

        if len(conns) < self.secagg_threshold:
            logger.error(
                "round %d: %d live clients < Shamir threshold %d — no "
                "round can be unmasked any more; ending the run with the "
                "current params", round_idx, len(conns),
                self.secagg_threshold,
            )
            self.history.append({
                "round": round_idx, "mean_client_loss": None,
                "num_rejected": 0, "num_failures": 0,
                "num_participants": len(conns),
                "defense": self.defense.name,
                "secure_aggregation": True, "aborted": True,
                "abort_reason": "below_shamir_threshold",
            })
            return False

        participants = [self._conn_ids[c] for c in conns]
        alive: List[socket.socket] = []
        dead: List[socket.socket] = []
        for conn in conns:
            try:
                send_msg(conn, {"type": "fit", "round": round_idx,
                                "params": self.params,
                                "participants": participants,
                                "pubs": self._pubs_hex})
                alive.append(conn)
            except OSError:
                logger.warning("round %d: client socket dead at send, "
                               "dropping", round_idx)
                dead.append(conn)

        rd = SecAggServerRound(self.params.shape[0], scale=self.secagg_scale)
        metrics: List[Dict[str, Any]] = []
        loss_pairs: List[tuple] = []
        #: owner -> {holder: enc_share} of this round's self-mask seeds
        b_enc: Dict[int, Dict[str, str]] = {}
        #: next-round public keys announced in fit replies (key rotation)
        next_pubs: Dict[str, str] = {}
        replies = self._gather_replies(alive, round_idx, dead)
        for reply in replies:
            cid = self._conn_ids[reply.pop("_conn")]
            w = float(reply.get("num_examples", 1))
            rd.add(cid, reply["masked"], w)
            b_enc[cid] = dict(reply.get("b_shares", {}))
            if reply.get("next_pub"):
                next_pubs[str(cid)] = reply["next_pub"]
            m = dict(reply.get("metrics", {}))
            m.setdefault("client_id", cid)
            metrics.append(m)
            if "loss" in m:
                loss_pairs.append((m["loss"], w))

        dropped = sorted(set(participants) - set(rd.contributors))
        contributors = sorted(rd.contributors)
        aborted = False
        if len(rd.contributors) < self.secagg_min_contributors:
            # Privacy floor: decoding a round with this few contributors
            # would reveal (nearly) individual updates.
            logger.error(
                "round %d: only %d secagg contributors (< min %d); "
                "aborting round", round_idx, len(rd.contributors),
                self.secagg_min_contributors,
            )
            aborted = True

        # Unmask round — ALWAYS runs, even for an aborted round: it also
        # carries the key-rotation pipeline (next-round directory out,
        # next-round key shares back). An aborted round reveals NOTHING
        # (empty contributor/dropped lists, so no b or x share leaves any
        # client) — it is a rekey-only exchange.
        reveal_contributors = [] if aborted else contributors
        reveal_dropped = [] if aborted else dropped
        survivors: List[socket.socket] = []
        unmask_dead: List[socket.socket] = []
        for conn in conns:
            if conn in dead:
                continue
            holder = self._conn_ids[conn]
            msg = {
                "type": "unmask", "round": round_idx,
                "contributors": reveal_contributors,
                "dropped": reveal_dropped,
                "enc_b": {
                    str(o): b_enc[o][str(holder)]
                    for o in reveal_contributors
                    if o != holder and str(holder) in b_enc.get(o, {})
                },
                "enc_x": {
                    str(d): self._xshares[d][str(holder)]
                    for d in reveal_dropped
                    if str(holder) in self._xshares.get(d, {})
                },
                "next_pubs": next_pubs,
            }
            try:
                send_msg(conn, msg)
                survivors.append(conn)
            except OSError:
                logger.warning(
                    "round %d: survivor socket dead at unmask send",
                    round_idx,
                )
                unmask_dead.append(conn)
        share_replies: List[Dict[str, Any]] = []
        next_xshares: Dict[int, Dict[str, str]] = {}
        rekey_failed: List[socket.socket] = []
        for r_ in self._gather_replies(survivors, round_idx, unmask_dead):
            conn = r_.pop("_conn")
            cid = self._conn_ids[conn]
            nxt = r_.get("next_x_shares")
            if isinstance(nxt, dict) and nxt:
                next_xshares[cid] = dict(nxt)
            elif round_idx < self.num_rounds:
                # Without next-round key shares this client's dropout
                # could never be recovered — retire it now.
                logger.warning(
                    "round %d: client %d sent no next-round key shares; "
                    "dropping it from the run", round_idx, cid,
                )
                rekey_failed.append(conn)
            share_replies.append(r_)
        dead.extend(unmask_dead)
        if not aborted:
            try:
                b_seeds = reconstruct_secrets(
                    share_replies, "b", contributors, self.secagg_threshold
                )
                rd.subtract_self_masks(b_seeds)
                if dropped:
                    x_keys = reconstruct_secrets(
                        share_replies, "x", dropped, self.secagg_threshold
                    )
                    rd.strip_dropped_with_keys(
                        x_keys, self._pubs_int, round_idx
                    )
            except ValueError as e:
                logger.error("round %d: unmask failed (%s); aborting round",
                             round_idx, e)
                aborted = True

        # Rotate to the next round's keys/shares (this round's keys are
        # never used again — a future dropout reconstruction cannot touch
        # this round's masks).
        self._pubs_hex = dict(next_pubs)
        self._pubs_int = {int(c): int(p, 16) for c, p in next_pubs.items()}
        self._xshares = next_xshares
        dead.extend(rekey_failed)

        self._forget_dead(conns, dead)
        if not rd.contributors:
            raise RuntimeError(
                f"round {round_idx}: every client failed before replying"
            )
        if not aborted:
            self.params = (
                self.params + rd.weighted_mean_delta()
            ).astype(np.float32)

        mean_loss = (
            float(sum(v * w for v, w in loss_pairs)
                  / sum(w for _, w in loss_pairs))
            if loss_pairs else None
        )
        self.history.append({
            "round": round_idx,
            "mean_client_loss": mean_loss,
            "num_rejected": 0,
            "num_failures": len(dropped),
            "num_participants": len(rd.contributors),
            "defense": self.defense.name,
            "secure_aggregation": True,
            "aborted": aborted,
        })
        logger.info("round %d secure-aggregated (%d contributors, "
                    "%d dropped%s)", round_idx, len(rd.contributors),
                    len(dropped), ", ABORTED" if aborted else "")

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
                 host: str = "0.0.0.0", port: int = 8080,
                 secure_aggregation: bool = False) -> np.ndarray:
    server = FLServer(initial_params, num_clients, num_rounds, defense_type,
                      defense_config, host, port,
                      secure_aggregation=secure_aggregation)
    return server.serve()
