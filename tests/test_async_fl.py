"""Asynchronous buffered FL (runtime/async_server.py — FedBuff-style).

The reference has no asynchronous path at all (its Flower round loop and
this repo's sync FLServer both barrier on every client per round), so
these tests define the contract: staleness-weighted buffered aggregation,
clients re-tasked immediately, stragglers never block the run, and a dead
client is tolerated.
"""

import socket as sk
import threading
import time

import numpy as np
import pytest

from multimodal_fl_security_tpu.runtime.async_server import AsyncFLServer


def _free_port():
    s = sk.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# unit: staleness weighting math (no sockets)
# ---------------------------------------------------------------------------
def test_staleness_discount_weights_aggregation():
    srv = AsyncFLServer(np.zeros(4, np.float32), num_clients=2,
                        num_aggregations=1, buffer_size=2, server_lr=1.0,
                        staleness_exponent=0.5, port=0)
    srv.version = 2
    fresh = {"delta": np.ones(4, np.float32), "version": 2,
             "num_examples": 10, "client_id": 0, "metrics": {}}
    stale = {"delta": -np.ones(4, np.float32), "version": 0,
             "num_examples": 10, "client_id": 1, "metrics": {}}
    srv._aggregate([fresh, stale])
    # weights: fresh 10*(1+0)^-.5 = 10, stale 10*(1+2)^-.5 = 5.77
    w_s = 10 / np.sqrt(3.0)
    expected = (10.0 * 1.0 + w_s * (-1.0)) / (10.0 + w_s)
    np.testing.assert_allclose(srv.params, expected, rtol=1e-6)
    h = srv.history[-1]
    assert h["version"] == 3 and h["max_staleness"] == 2.0
    assert h["mean_staleness"] == 1.0


def test_buffer_of_one_is_pure_async():
    srv = AsyncFLServer(np.zeros(3, np.float32), num_clients=1,
                        num_aggregations=2, buffer_size=1, server_lr=0.5,
                        port=0)
    srv._aggregate([{"delta": np.ones(3, np.float32), "version": 0,
                     "num_examples": 1, "client_id": 0, "metrics": {}}])
    np.testing.assert_allclose(srv.params, 0.5)
    srv._aggregate([{"delta": np.ones(3, np.float32), "version": 1,
                     "num_examples": 1, "client_id": 0, "metrics": {}}])
    np.testing.assert_allclose(srv.params, 1.0)


def test_defense_composes_with_async_buffer():
    """A robust rule runs over the buffered [K, D] delta matrix: one
    huge outlier delta must not dominate a trimmed-mean aggregate."""
    srv = AsyncFLServer(np.zeros(8, np.float32), num_clients=3,
                        num_aggregations=1, buffer_size=3, server_lr=1.0,
                        defense_type="median", port=0)
    good1 = {"delta": np.full(8, 0.1, np.float32), "version": 0,
             "num_examples": 1, "client_id": 0, "metrics": {}}
    good2 = {"delta": np.full(8, 0.2, np.float32), "version": 0,
             "num_examples": 1, "client_id": 1, "metrics": {}}
    evil = {"delta": np.full(8, 100.0, np.float32), "version": 0,
            "num_examples": 1, "client_id": 2, "metrics": {}}
    srv._aggregate([good1, good2, evil])
    assert np.abs(srv.params).max() <= 0.2 + 1e-6


# ---------------------------------------------------------------------------
# integration: full protocol over localhost TCP, uneven client speeds
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_async_run_with_straggler_and_death():
    """3 clients, one artificially slow, one killed mid-run: the server
    still reaches its aggregation target, fast clients contribute more
    updates, staleness appears in history, and the model still learns."""
    from multimodal_fl_security_tpu.core.pytrees import (
        flatten_tree,
        unflatten_tree,
    )
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.utils.metrics import evaluate_model

    cfg = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 512, "num_test": 200},
        "num_clients": 3, "batch_size": 16, "local_epochs": 1,
        "learning_rate": 0.05, "partition": "iid",
    }
    ds = load_dataset("synthetic", "train", **cfg["dataset_params"])
    test = load_dataset("synthetic", "test", **cfg["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    port = _free_port()
    server = AsyncFLServer(flat0, num_clients=3, num_aggregations=6,
                           buffer_size=2, host="127.0.0.1", port=port)

    clients = [FLClient(i, cfg) for i in range(3)]
    for c in clients:
        c.fit(flat0, 0)  # compile sequentially before the clock matters

    slow_fit = clients[1].fit

    def delayed_fit(params, version):
        time.sleep(1.5)
        return slow_fit(params, version)

    clients[1].fit = delayed_fit

    kill_after = [2]  # client 2 dies after 2 updates
    real_fit2 = clients[2].fit

    def dying_fit(params, version):
        if kill_after[0] <= 0:
            raise SystemExit  # thread exits -> socket closes -> client_dead
        kill_after[0] -= 1
        return real_fit2(params, version)

    clients[2].fit = dying_fit

    out = {}
    st = threading.Thread(target=lambda: out.__setitem__("p", server.serve()))
    st.start()
    time.sleep(0.3)

    def run_quietly(c):
        try:
            c.run(port=port)
        except SystemExit:
            pass  # the planned mid-run death of client 2

    cts = [threading.Thread(target=run_quietly, args=(c,), daemon=True)
           for c in clients]
    for t in cts:
        t.start()
    st.join(timeout=300)
    assert "p" in out, "async server did not finish"

    assert len(server.history) == 6
    assert server.version == 6
    # The straggler's updates arrive against older versions eventually.
    assert max(h["max_staleness"] for h in server.history) > 0
    stats = evaluate_model(
        model, unflatten_tree(template, np.asarray(out["p"])), test
    )
    assert stats["accuracy"] > 0.3, stats
