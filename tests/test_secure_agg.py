"""Secure aggregation: primitives (mask cancellation, dropout recovery,
fixed-point precision) + the full TCP protocol (masked run must equal the
cleartext FedAvg run; mid-run dropout must be unmasked and survived)."""

import socket as sk
import threading
import time

import numpy as np
import pytest

from multimodal_fl_security_tpu.runtime.secure_agg import (
    SECAGG_COMPATIBLE_DEFENSES,
    SecAggClient,
    SecAggServerRound,
    decode_fixed,
    encode_fixed,
    expand_mask,
    generate_keypair,
    shared_seed,
)


def _connected_clients(n, **kw):
    clients = [SecAggClient(i, **kw) for i in range(n)]
    pubs = {str(c.client_id): c.public_key_hex() for c in clients}
    for c in clients:
        c.set_peer_keys(pubs)
    return clients


def test_shared_seed_symmetric_and_round_bound():
    xa, ya = generate_keypair()
    xb, yb = generate_keypair()
    assert shared_seed(xa, yb, 1) == shared_seed(xb, ya, 1)
    assert shared_seed(xa, yb, 1) != shared_seed(xa, yb, 2)


def test_fixed_point_roundtrip_with_negatives():
    v = np.array([-3.25, 0.0, 1.5, -31.9, 31.9])
    np.testing.assert_allclose(decode_fixed(encode_fixed(v)), v, atol=1e-4)


def test_masks_cancel_exactly_in_the_sum():
    clients = _connected_clients(5)
    dim = 257
    rng = np.random.default_rng(1)
    deltas = [rng.normal(0, 0.2, dim) for _ in range(5)]
    parts = list(range(5))
    masked = [c.mask_update(deltas[i], 1.0, 7, parts)
              for i, c in enumerate(clients)]
    plain = [encode_fixed(d) for d in deltas]
    # Bitwise equality: the pairwise masks cancel EXACTLY mod 2**64.
    np.testing.assert_array_equal(sum(masked), sum(plain))


def test_single_masked_vector_hides_the_plaintext():
    clients = _connected_clients(3)
    d = np.full(512, 0.125)
    m = clients[0].mask_update(d, 1.0, 1, [0, 1, 2])
    plain = encode_fixed(d)
    assert np.mean(m == plain) < 0.01  # one-time-pad-like


def _handshaken_clients(n, threshold=None, **kw):
    """Clients + the server-relayed x-share table {owner: {holder: enc}}."""
    clients = [SecAggClient(i, **kw) for i in range(n)]
    pubs = {str(c.client_id): c.public_key_hex() for c in clients}
    t = threshold if threshold is not None else max(2, n // 2 + 1)
    xshares = {}
    for c in clients:
        msg = c.handshake(pubs, t)
        xshares[c.client_id] = msg["shares"]
    return clients, xshares, t


def _server_unmask(rd, clients, xshares, contributors, dropped, repliers,
                   round_idx, threshold):
    """Drive the unmask round server-side with only ``repliers`` alive."""
    from multimodal_fl_security_tpu.runtime.secure_agg import (
        reconstruct_secrets,
    )

    replies = []
    for c in clients:
        if c.client_id not in repliers:
            continue
        msg = {
            "round": round_idx,
            "contributors": contributors,
            "dropped": dropped,
            "enc_b": {
                str(o): clients[o]._last_b_shares[str(c.client_id)]
                for o in contributors
                if o != c.client_id
                and str(c.client_id) in clients[o]._last_b_shares
            },
            "enc_x": {
                str(d): xshares[d][str(c.client_id)]
                for d in dropped
                if str(c.client_id) in xshares[d]
            },
        }
        replies.append(c.unmask_reply(msg))
    b = reconstruct_secrets(replies, "b", contributors, threshold)
    rd.subtract_self_masks(b)
    if dropped:
        x = reconstruct_secrets(replies, "x", dropped, threshold)
        rd.strip_dropped_with_keys(
            x, {c.client_id: c.public for c in clients}, round_idx
        )


def _round_payloads(clients, deltas, weights, round_idx, parts):
    payloads = {}
    for c in clients:
        if c.client_id not in parts:
            continue
        p = c.round_payload(deltas[c.client_id], weights[c.client_id],
                            round_idx, parts)
        c._last_b_shares = p["b_shares"]
        payloads[c.client_id] = p
    return payloads


def test_weighted_mean_decode_full_protocol():
    """All 4 clients contribute and answer unmask: self masks come off
    via share reconstruction, pairwise masks cancel, decode is exact."""
    clients, xshares, t = _handshaken_clients(4)
    dim = 1000
    rng = np.random.default_rng(0)
    deltas = [rng.normal(0, 0.1, dim) for _ in range(4)]
    weights = [100.0, 200.0, 50.0, 300.0]
    parts = [0, 1, 2, 3]

    rd = SecAggServerRound(dim)
    payloads = _round_payloads(clients, deltas, weights, 1, parts)
    for cid, p in payloads.items():
        rd.add(cid, p["masked"], weights[cid])
    _server_unmask(rd, clients, xshares, parts, [], repliers=parts,
                   round_idx=1, threshold=t)
    want = sum(w * d for w, d in zip(weights, deltas)) / sum(weights)
    np.testing.assert_allclose(rd.weighted_mean_delta(), want, atol=1e-4)


def test_dropout_before_submit_recovered_via_x_shares():
    """Client 2 is announced but never submits: survivors' shares of its
    DH key let the server strip its uncancelled pairwise masks."""
    clients, xshares, t = _handshaken_clients(4)
    dim = 600
    rng = np.random.default_rng(1)
    deltas = [rng.normal(0, 0.1, dim) for _ in range(4)]
    weights = [100.0, 200.0, 50.0, 300.0]
    parts = [0, 1, 2, 3]
    alive = [0, 1, 3]

    rd = SecAggServerRound(dim)
    payloads = _round_payloads(clients, deltas, weights, 2, parts)
    for cid in alive:
        rd.add(cid, payloads[cid]["masked"], weights[cid])
    _server_unmask(rd, clients, xshares, alive, [2], repliers=alive,
                   round_idx=2, threshold=t)
    want = (sum(weights[i] * deltas[i] for i in alive)
            / sum(weights[i] for i in alive))
    np.testing.assert_allclose(rd.weighted_mean_delta(), want, atol=1e-4)


def test_contributor_dying_before_unmask_is_survived():
    """THE double-fault that aborted the old protocol: with 5 clients,
    client 4 drops before submitting AND client 2 dies after submitting
    its masked vector but before the unmask reply. The remaining 3
    repliers (>= t = 3) reconstruct client 2's self-mask seed and client
    4's key from shares — the round still decodes the correct weighted
    sum of ALL contributors (2 included)."""
    clients, xshares, t = _handshaken_clients(5)
    assert t == 3
    dim = 600
    rng = np.random.default_rng(2)
    deltas = [rng.normal(0, 0.1, dim) for _ in range(5)]
    weights = [10.0, 20.0, 30.0, 40.0, 50.0]
    parts = [0, 1, 2, 3, 4]
    contributors = [0, 1, 2, 3]   # 4 never submits
    repliers = [0, 1, 3]          # 2 dies before unmask

    rd = SecAggServerRound(dim)
    payloads = _round_payloads(clients, deltas, weights, 3, parts)
    for cid in contributors:
        rd.add(cid, payloads[cid]["masked"], weights[cid])
    _server_unmask(rd, clients, xshares, contributors, [4],
                   repliers=repliers, round_idx=3, threshold=t)
    want = (sum(weights[i] * deltas[i] for i in contributors)
            / sum(weights[i] for i in contributors))
    np.testing.assert_allclose(rd.weighted_mean_delta(), want, atol=1e-4)


def test_too_few_share_replies_raises():
    """Below-threshold share availability must be an error, never a
    silent garbage reconstruction."""
    from multimodal_fl_security_tpu.runtime.secure_agg import (
        reconstruct_secrets,
    )

    clients, xshares, t = _handshaken_clients(5)
    dim = 64
    deltas = [np.zeros(dim) for _ in range(5)]
    weights = [1.0] * 5
    parts = [0, 1, 2, 3, 4]
    payloads = _round_payloads(clients, deltas, weights, 1, parts)
    replies = []
    for cid in [0, 1]:  # only 2 repliers < t=3
        c = clients[cid]
        replies.append(c.unmask_reply({
            "round": 1, "contributors": parts, "dropped": [],
            "enc_b": {
                str(o): clients[o]._last_b_shares[str(cid)]
                for o in parts if o != cid
            },
            "enc_x": {},
        }))
    with pytest.raises(ValueError, match="shares"):
        reconstruct_secrets(replies, "b", parts, t)


def test_client_refuses_contributor_and_dropped_overlap():
    """An owner listed as both contributor and dropped would have both
    b and x revealed — the client must refuse the whole request."""
    clients, xshares, t = _handshaken_clients(3)
    deltas = [np.zeros(16) for _ in range(3)]
    _round_payloads(clients, deltas, [1.0] * 3, 1, [0, 1, 2])
    with pytest.raises(ValueError, match="both"):
        clients[0].unmask_reply({
            "round": 1, "contributors": [0, 1, 2], "dropped": [1],
            "enc_b": {}, "enc_x": {},
        })


def test_per_round_key_rotation_two_rounds_with_dropout():
    """Multi-round protocol with per-round DH key rotation: round 1
    completes and pipelines fresh keys/shares; client 2 then drops in
    round 2, and its RECONSTRUCTED round-2 key (a) unmasks round 2
    correctly and (b) is NOT its round-1 key — so a server holding
    round-1 transcripts cannot retroactively strip round-1 masks."""
    from multimodal_fl_security_tpu.runtime.secure_agg import (
        reconstruct_secrets,
    )

    clients, xshares, t = _handshaken_clients(4)
    dim = 128
    rng = np.random.default_rng(7)
    parts = [0, 1, 2, 3]
    round1_privates = {c.client_id: c._private for c in clients}

    # ---- round 1: everyone contributes; unmask relays next_pubs.
    deltas1 = [rng.normal(0, 0.1, dim) for _ in range(4)]
    rd1 = SecAggServerRound(dim)
    next_pubs = {}
    for c in clients:
        p = c.round_payload(deltas1[c.client_id], 1.0, 1, parts)
        c._last_b_shares = p["b_shares"]
        next_pubs[str(c.client_id)] = p["next_pub"]
        rd1.add(c.client_id, p["masked"], 1.0)
    replies1 = []
    for c in clients:
        replies1.append(c.unmask_reply({
            "round": 1, "contributors": parts, "dropped": [],
            "enc_b": {
                str(o): clients[o]._last_b_shares[str(c.client_id)]
                for o in parts if o != c.client_id
            },
            "enc_x": {},
            "next_pubs": next_pubs,
        }))
        assert "next_x_shares" in replies1[-1]
    rd1.subtract_self_masks(
        reconstruct_secrets(replies1, "b", parts, t))
    np.testing.assert_allclose(
        rd1.weighted_mean_delta(),
        sum(deltas1) / 4, atol=1e-4)

    # ---- server-side rotation.
    next_xshares = {r["client_id"]: r["next_x_shares"] for r in replies1}
    pubs2_int = {int(k): int(v, 16) for k, v in next_pubs.items()}
    for c in clients:
        c.begin_round(next_pubs)
        assert c._private != round1_privates[c.client_id]  # promoted

    # ---- round 2: client 2 never submits.
    deltas2 = [rng.normal(0, 0.1, dim) for _ in range(4)]
    alive = [0, 1, 3]
    rd2 = SecAggServerRound(dim)
    for cid in alive:
        p = clients[cid].round_payload(deltas2[cid], 1.0, 2, parts)
        clients[cid]._last_b_shares = p["b_shares"]
        rd2.add(cid, p["masked"], 1.0)
    replies2 = []
    for cid in alive:
        c = clients[cid]
        replies2.append(c.unmask_reply({
            "round": 2, "contributors": alive, "dropped": [2],
            "enc_b": {
                str(o): clients[o]._last_b_shares[str(cid)]
                for o in alive if o != cid
            },
            "enc_x": {"2": next_xshares[2][str(cid)]},
        }))
    rd2.subtract_self_masks(
        reconstruct_secrets(replies2, "b", alive, t))
    x2 = reconstruct_secrets(replies2, "x", [2], t)
    rd2.strip_dropped_with_keys(x2, pubs2_int, 2)
    np.testing.assert_allclose(
        rd2.weighted_mean_delta(),
        sum(deltas2[i] for i in alive) / 3, atol=1e-4)
    # The crux of the fix: the revealed key is the ROUND-2 key only.
    assert x2[2] == clients[2]._private
    assert x2[2] != round1_privates[2]


def test_strip_rejects_key_not_matching_directory():
    """A wrong share makes Shamir reconstruction succeed arithmetically
    with a garbage key; the server must verify g^x == pub and abort
    instead of silently corrupting the aggregate."""
    clients, xshares, t = _handshaken_clients(3)
    rd = SecAggServerRound(16)
    good = {c.client_id: c.public for c in clients}
    acc_before = rd.acc.copy()
    with pytest.raises(ValueError, match="public key"):
        rd.strip_dropped_with_keys(
            {2: clients[2]._private + 1}, good, 1)
    # Verification happens BEFORE any mask application.
    np.testing.assert_array_equal(rd.acc, acc_before)


def test_shamir_split_combine_roundtrip():
    from multimodal_fl_security_tpu.runtime import shamir

    secret = int.from_bytes(b"\x07" * 32, "big")
    shares = shamir.split_secret(secret, [0, 1, 2, 3, 4], 3)
    # Any 3 of 5 reconstruct.
    assert shamir.combine_shares({k: shares[k] for k in (0, 2, 4)}) == secret
    assert shamir.combine_shares({k: shares[k] for k in (1, 2, 3)}) == secret
    # 2 of 5 give a (different) wrong value — no information.
    assert shamir.combine_shares({k: shares[k] for k in (0, 1)}) != secret


def test_expand_mask_deterministic_and_seed_sensitive():
    s1, s2 = b"a" * 32, b"b" * 32
    np.testing.assert_array_equal(expand_mask(s1, 64), expand_mask(s1, 64))
    assert np.mean(expand_mask(s1, 64) == expand_mask(s2, 64)) < 0.1


def test_server_rejects_update_inspecting_defense():
    from multimodal_fl_security_tpu.runtime.server import FLServer

    assert "krum" not in SECAGG_COMPATIBLE_DEFENSES
    with pytest.raises(ValueError, match="secure aggregation"):
        FLServer(np.zeros(10, np.float32), num_clients=3, num_rounds=1,
                 defense_type="krum", secure_aggregation=True)


# ---------------------------------------------------------------------------
# Full-protocol integration over localhost TCP
# ---------------------------------------------------------------------------

def _free_port():
    s = sk.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_secagg_run_matches_cleartext_fedavg():
    """The server must end at the same global model whether it saw the
    updates in the clear or only their masked sum (up to the fixed-point
    quantization, < 2**-16 per coordinate per client)."""
    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.runtime.server import FLServer

    base = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 256, "num_test": 100},
        "num_clients": 3, "batch_size": 16, "local_epochs": 1,
        "learning_rate": 0.05, "partition": "iid",
    }
    ds = load_dataset("synthetic", "train", **base["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    finals = {}
    for mode in ("clear", "secagg"):
        cfg = dict(base, secure_aggregation=(mode == "secagg"))
        port = _free_port()
        server = FLServer(flat0, num_clients=3, num_rounds=2,
                          host="127.0.0.1", port=port,
                          secure_aggregation=(mode == "secagg"))
        clients = [FLClient(i, cfg) for i in range(3)]
        for c in clients:
            c.fit(flat0, 0)  # warm the jit sequentially
        st = threading.Thread(
            target=lambda: finals.__setitem__(mode, server.serve()))
        st.start()
        time.sleep(0.3)
        cts = [threading.Thread(target=c.run, kwargs={"port": port})
               for c in clients]
        for t in cts:
            t.start()
        st.join(timeout=300)
        for t in cts:
            t.join(timeout=60)
        assert mode in finals, f"{mode} server did not finish"
        if mode == "secagg":
            assert all(h.get("secure_aggregation") for h in server.history)
            assert all(not h["aborted"] for h in server.history)

    # Client training is deterministic (seeded keys), so the only
    # difference is the fixed-point quantization of 3 clients x 2 rounds.
    np.testing.assert_allclose(finals["secagg"], finals["clear"], atol=5e-4)


@pytest.mark.slow
def test_secagg_dropout_is_unmasked_and_survived():
    """A participant that dies before replying in round 2 leaves
    uncancelled masks; the server runs the unmask round with the
    survivors and the global model stays clean (finite, near the
    cleartext result of the survivors)."""
    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.runtime.transport import recv_msg, send_msg

    base = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 256, "num_test": 100},
        "num_clients": 3, "batch_size": 16, "local_epochs": 1,
        "learning_rate": 0.05, "partition": "iid",
        "secure_aggregation": True,
    }
    ds = load_dataset("synthetic", "train", **base["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    port = _free_port()
    server = FLServer(flat0, num_clients=3, num_rounds=2,
                      host="127.0.0.1", port=port, fit_timeout=120.0,
                      secure_aggregation=True)
    result = {}
    st = threading.Thread(target=lambda: result.update(f=server.serve()))
    st.start()
    time.sleep(0.3)

    clients = [FLClient(i, base) for i in range(2)]
    for c in clients:
        c.fit(flat0, 0)
    cts = [threading.Thread(target=c.run, kwargs={"port": port})
           for c in clients]
    for t in cts:
        t.start()

    # Flaky third participant: real keys + real masks in round 1, then
    # dies before replying to round 2's fit.
    def flaky():
        sec = SecAggClient(2)
        sock = sk.create_connection(("127.0.0.1", port), timeout=120)
        send_msg(sock, {"type": "hello", "client_id": 2,
                        "secagg_pub": sec.public_key_hex(),
                        "secagg_scale": sec.scale})
        while True:
            msg = recv_msg(sock)
            if msg.get("type") == "secagg_keys":
                send_msg(sock, sec.handshake(msg["pubs"], msg["threshold"]))
            elif msg.get("type") == "unmask":
                send_msg(sock, sec.unmask_reply(msg))
            elif msg.get("type") == "fit":
                if msg["round"] >= 2:
                    sock.close()  # die with masks outstanding
                    return
                delta = np.zeros_like(flat0, dtype=np.float64)
                reply = {"client_id": 2, "num_examples": 1,
                         "metrics": {"loss": 0.0}}
                reply.update(sec.round_payload(delta, 1, msg["round"],
                                               msg["participants"]))
                send_msg(sock, reply)

    ft = threading.Thread(target=flaky)
    ft.start()
    st.join(timeout=300)
    ft.join(timeout=60)
    for t in cts:
        t.join(timeout=60)

    assert "f" in result, "server did not finish"
    assert len(server.history) == 2
    assert server.history[0]["num_failures"] == 0
    assert server.history[1]["num_failures"] == 1
    assert not server.history[1]["aborted"]
    assert server.history[1]["num_participants"] == 2
    assert np.all(np.isfinite(result["f"]))
    # Unmasking worked: params moved by a sane amount, not by leftover
    # 2**64-scale mask garbage.
    assert np.max(np.abs(result["f"] - flat0)) < 50.0


@pytest.mark.slow
def test_below_threshold_run_ends_cleanly_over_tcp():
    """With t=3 of 3 clients, one death makes every future round
    un-unmaskable: the aborted round must not crash the survivors, and
    the server must retire them with 'done' and end the run with the
    current params — the full graceful path over real sockets."""
    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.runtime.transport import recv_msg, send_msg

    base = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 256, "num_test": 100},
        "num_clients": 3, "batch_size": 16, "local_epochs": 1,
        "learning_rate": 0.05, "partition": "iid",
        "secure_aggregation": True,
    }
    ds = load_dataset("synthetic", "train", **base["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    port = _free_port()
    server = FLServer(flat0, num_clients=3, num_rounds=3,
                      host="127.0.0.1", port=port, fit_timeout=120.0,
                      secure_aggregation=True, secagg_threshold=3)
    result = {}
    st = threading.Thread(target=lambda: result.update(f=server.serve()))
    st.start()
    time.sleep(0.3)

    client_errors = []

    def run_client(c):
        try:
            c.run(port=port)
        except Exception as e:  # clean exit is part of what we test
            client_errors.append((c.client_id, e))

    clients = [FLClient(i, base) for i in range(2)]
    for c in clients:
        c.fit(flat0, 0)
    cts = [threading.Thread(target=run_client, args=(c,)) for c in clients]
    for t in cts:
        t.start()

    def flaky():
        sec = SecAggClient(2)
        sock = sk.create_connection(("127.0.0.1", port), timeout=120)
        send_msg(sock, {"type": "hello", "client_id": 2,
                        "secagg_pub": sec.public_key_hex(),
                        "secagg_scale": sec.scale})
        while True:
            msg = recv_msg(sock)
            if msg.get("type") == "secagg_keys":
                send_msg(sock, sec.handshake(msg["pubs"], msg["threshold"]))
            elif msg.get("type") == "unmask":
                send_msg(sock, sec.unmask_reply(msg))
            elif msg.get("type") == "fit":
                if msg["round"] >= 2:
                    sock.close()
                    return
                if msg.get("pubs"):
                    sec.begin_round(msg["pubs"])
                delta = np.zeros_like(flat0, dtype=np.float64)
                reply = {"client_id": 2, "num_examples": 1,
                         "metrics": {"loss": 0.0}}
                reply.update(sec.round_payload(delta, 1, msg["round"],
                                               msg["participants"]))
                send_msg(sock, reply)

    ft = threading.Thread(target=flaky)
    ft.start()
    st.join(timeout=300)
    ft.join(timeout=60)
    for t in cts:
        t.join(timeout=60)

    assert "f" in result, "server did not finish"
    assert not client_errors, f"survivors crashed: {client_errors}"
    # Round 1 applied; round 2 aborted (2 < t=3 share replies); round 3
    # never unmaskable -> run ended.
    assert [h["aborted"] for h in server.history] == [False, True, True]
    assert server.history[2]["abort_reason"] == "below_shamir_threshold"
    assert np.all(np.isfinite(result["f"]))


def test_server_rejects_mismatched_secagg_scale():
    """A client encoding at a different fixed-point scale than the server
    decodes at would silently corrupt every aggregate; the server must
    refuse it at hello instead."""
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.runtime.transport import send_msg

    port = _free_port()
    server = FLServer(np.zeros(10, np.float32), num_clients=2, num_rounds=1,
                      host="127.0.0.1", port=port, secure_aggregation=True)
    err = {}

    def run():
        try:
            server.serve()
        except RuntimeError as e:
            err["e"] = e

    st = threading.Thread(target=run)
    st.start()
    time.sleep(0.2)
    sec = SecAggClient(0, scale=1024.0)
    sock = sk.create_connection(("127.0.0.1", port), timeout=30)
    send_msg(sock, {"type": "hello", "client_id": 0,
                    "secagg_pub": sec.public_key_hex(),
                    "secagg_scale": sec.scale})
    st.join(timeout=30)
    sock.close()
    assert "e" in err and "secagg_scale" in str(err["e"])


@pytest.mark.slow
def test_two_dropouts_across_key_generations_over_tcp():
    """Membership churn across rotations: with 5 clients and t=3, one
    client dies in round 2 (its round-2 key reconstructed from the
    shares distributed at round 1's unmask) and another dies in round 4
    (its round-4 key from round-3's unmask — two generations later).
    Every round must complete unaborted and the run must finish clean."""
    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.runtime.transport import recv_msg, send_msg

    base = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 256, "num_test": 100},
        "num_clients": 5, "batch_size": 16, "local_epochs": 1,
        "learning_rate": 0.05, "partition": "iid",
        "secure_aggregation": True,
    }
    ds = load_dataset("synthetic", "train", **base["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    port = _free_port()
    server = FLServer(flat0, num_clients=5, num_rounds=5,
                      host="127.0.0.1", port=port, fit_timeout=180.0,
                      secure_aggregation=True)  # t = 5//2+1 = 3
    result = {}
    st = threading.Thread(target=lambda: result.update(f=server.serve()))
    st.start()
    time.sleep(0.3)

    clients = [FLClient(i, base) for i in range(3)]
    for c in clients:
        c.fit(flat0, 0)
    cts = [threading.Thread(target=c.run, kwargs={"port": port})
           for c in clients]
    for t_ in cts:
        t_.start()

    def flaky(cid, die_round):
        sec = SecAggClient(cid)
        sock = sk.create_connection(("127.0.0.1", port), timeout=120)
        send_msg(sock, {"type": "hello", "client_id": cid,
                        "secagg_pub": sec.public_key_hex(),
                        "secagg_scale": sec.scale})
        while True:
            msg = recv_msg(sock)
            if msg.get("type") == "done":
                return
            if msg.get("type") == "secagg_keys":
                send_msg(sock, sec.handshake(msg["pubs"], msg["threshold"]))
            elif msg.get("type") == "unmask":
                send_msg(sock, sec.unmask_reply(msg))
            elif msg.get("type") == "fit":
                if msg["round"] >= die_round:
                    sock.close()
                    return
                if msg.get("pubs"):
                    sec.begin_round(msg["pubs"])
                delta = np.zeros_like(flat0, dtype=np.float64)
                reply = {"client_id": cid, "num_examples": 1,
                         "metrics": {"loss": 0.0}}
                reply.update(sec.round_payload(delta, 1, msg["round"],
                                               msg["participants"]))
                send_msg(sock, reply)

    fts = [threading.Thread(target=flaky, args=(3, 2)),
           threading.Thread(target=flaky, args=(4, 4))]
    for t_ in fts:
        t_.start()
    st.join(timeout=420)
    for t_ in fts + cts:
        t_.join(timeout=60)

    assert "f" in result, "server did not finish"
    assert len(server.history) == 5
    assert [h["aborted"] for h in server.history] == [False] * 5
    assert [h["num_failures"] for h in server.history] == [0, 1, 0, 1, 0]
    assert server.history[-1]["num_participants"] == 3
    assert np.all(np.isfinite(result["f"]))
    assert np.max(np.abs(result["f"] - flat0)) < 50.0  # no mask garbage


def test_server_rejects_hello_without_scale():
    """secagg_pub with no secagg_scale must be refused, not defaulted —
    defaulting would vacuously pass the mismatch guard."""
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.runtime.transport import send_msg

    port = _free_port()
    server = FLServer(np.zeros(10, np.float32), num_clients=2, num_rounds=1,
                      host="127.0.0.1", port=port, secure_aggregation=True)
    err = {}

    def run():
        try:
            server.serve()
        except RuntimeError as e:
            err["e"] = e

    st = threading.Thread(target=run)
    st.start()
    time.sleep(0.2)
    sec = SecAggClient(0)
    sock = sk.create_connection(("127.0.0.1", port), timeout=30)
    send_msg(sock, {"type": "hello", "client_id": 0,
                    "secagg_pub": sec.public_key_hex()})
    st.join(timeout=30)
    sock.close()
    assert "e" in err and "secagg_scale" in str(err["e"])


def test_below_shamir_threshold_ends_run_gracefully():
    """Once live clients fall below t, no future round can be unmasked:
    the round loop must end the run (params kept), not crash the
    survivors with share-splitting errors."""
    from multimodal_fl_security_tpu.runtime.server import FLServer

    server = FLServer(np.zeros(8, np.float32), num_clients=5, num_rounds=3,
                      secure_aggregation=True)
    server.secagg_threshold = 3
    out = server._run_round_secagg(2, conns=[object(), object()])
    assert out is False
    assert server.history[-1]["aborted"]
    assert server.history[-1]["abort_reason"] == "below_shamir_threshold"


def test_client_rejects_secagg_plus_compression():
    from multimodal_fl_security_tpu.runtime.client import FLClient

    cfg = {"dataset": "synthetic", "num_clients": 2,
           "dataset_params": {"num_train": 64, "num_test": 16},
           "batch_size": 16, "secure_aggregation": True,
           "compression": "int8"}
    with pytest.raises(ValueError, match="mutually"):
        FLClient(0, cfg)
