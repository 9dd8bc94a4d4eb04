"""Distributed-runtime tests: transport framing + a real server/client FL
round over localhost TCP (threads, one process). The reference had NO
integration tests for its distributed path (SURVEY.md §4) — these close
that gap."""

import os
import socket
import threading

import numpy as np
import pytest

from multimodal_fl_security_tpu.runtime.transport import (
    _decode,
    _encode,
    recv_msg,
    send_msg,
)


def test_transport_roundtrip_arrays_and_meta():
    msg = {
        "type": "fit",
        "round": 3,
        "params": np.arange(10, dtype=np.float32),
        "mask": np.ones((2, 3), dtype=np.int32),
    }
    out = _decode(_encode(msg))
    assert out["type"] == "fit" and out["round"] == 3
    np.testing.assert_array_equal(out["params"], msg["params"])
    np.testing.assert_array_equal(out["mask"], msg["mask"])
    assert out["mask"].dtype == np.int32


def test_transport_over_socket():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    payload = {"x": np.random.rand(1000).astype(np.float32), "tag": "hi"}
    received = {}

    def server():
        conn, _ = srv.accept()
        received.update(recv_msg(conn))
        send_msg(conn, {"ok": True})
        conn.close()

    t = threading.Thread(target=server)
    t.start()
    cli = socket.create_connection(("127.0.0.1", port))
    send_msg(cli, payload)
    reply = recv_msg(cli)
    t.join()
    cli.close()
    srv.close()
    assert reply["ok"] is True
    np.testing.assert_array_equal(received["x"], payload["x"])


@pytest.mark.slow
def test_distributed_fl_round_over_tcp():
    """3 honest clients + 1 malicious (scaling attack) against a
    norm-bounding server, full protocol over localhost."""
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.core.pytrees import (
        flatten_tree,
        unflatten_tree,
    )
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import (
        FLClient,
        MaliciousFLClient,
    )
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.utils.metrics import evaluate_model

    config = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 512, "num_test": 200},
        "num_clients": 4,
        "batch_size": 16,
        "local_epochs": 1,
        "learning_rate": 0.05,
        "partition": "iid",
        "attack_type": "scaling",
        "attack_params": {"scale": 100.0},
        "malicious_clients": [3],
    }
    ds = load_dataset("synthetic", "train", **config["dataset_params"])
    test = load_dataset("synthetic", "test", **config["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    sample = {k: v[:16] for k, v in ds.arrays.items()}
    template = init_model(model, sample, seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    server = FLServer(flat0, num_clients=4, num_rounds=2,
                      defense_type="norm_bounding",
                      defense_config={"max_norm": 100.0},
                      host="127.0.0.1", port=0)
    # Bind an ephemeral port first so clients know where to connect.
    import socket as sk

    s = sk.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    server.port = port

    # Construct + warm clients sequentially so the first jit compile seeds
    # the persistent cache and the rest start hot (concurrent cold compiles
    # on CPU would dominate the test).
    clients = [
        (MaliciousFLClient if i == 3 else FLClient)(i, config)
        for i in range(4)
    ]
    for c in clients:
        c.fit(flat0, 0)

    result = {}

    def run_server():
        result["final"] = server.serve()

    st = threading.Thread(target=run_server)
    st.start()
    import time

    time.sleep(0.5)
    cts = []
    for c in clients:
        cts.append(threading.Thread(target=c.run,
                                    kwargs={"port": port}))
        cts[-1].start()
    st.join(timeout=300)
    for t in cts:
        t.join(timeout=60)
    assert "final" in result, "server did not finish"

    assert len(server.history) == 2
    # The malicious client self-reported and was flagged.
    assert len(server.flagged_clients) == 1
    # Global model evaluates finitely and above chance-ish after 2 rounds.
    final_params = unflatten_tree(template, jnp.asarray(result["final"]))
    stats = evaluate_model(model, final_params, test)
    assert np.isfinite(stats["loss"])
    assert stats["accuracy"] > 0.08


@pytest.mark.slow
def test_server_survives_client_death():
    """A client that dies mid-experiment is dropped; the round completes
    with the survivors (the reference ignored Flower's failures list)."""
    import time

    import jax.numpy as jnp

    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.runtime.transport import recv_msg, send_msg

    config = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 512, "num_test": 200},
        "num_clients": 3, "batch_size": 16, "local_epochs": 1,
        "learning_rate": 0.05, "partition": "iid",
    }
    ds = load_dataset("synthetic", "train", **config["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    import socket as sk

    s = sk.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]
    s.close()
    server = FLServer(flat0, num_clients=3, num_rounds=2,
                      host="127.0.0.1", port=port, fit_timeout=120.0)
    result = {}
    st = threading.Thread(target=lambda: result.update(
        final=server.serve()))
    st.start()
    time.sleep(0.3)

    # Two honest clients, pre-warmed sequentially.
    clients = [FLClient(i, config) for i in range(2)]
    for c in clients:
        c.fit(flat0, 0)
    threads = [threading.Thread(target=c.run, kwargs={"port": port})
               for c in clients]
    for t in threads:
        t.start()

    # Third "client" connects, then dies before ever replying to fit.
    ghost = socket.create_connection(("127.0.0.1", port))
    send_msg(ghost, {"type": "hello", "client_id": 2})
    recv_msg(ghost)  # receive the round-1 fit request...
    ghost.close()    # ...and die.

    st.join(timeout=240)
    for t in threads:
        t.join(timeout=60)
    assert "final" in result, "server hung on the dead client"
    assert len(server.history) == 2
    assert server.history[0]["num_failures"] == 1
    assert server.history[0]["num_participants"] == 2
    assert server.history[1]["num_participants"] == 2


@pytest.mark.slow
def test_launcher_spawns_real_processes(tmp_path):
    """The subprocess launcher end-to-end: 1 server + 2 client OS processes
    over TCP (reference: run_experiment.py:79-127)."""
    import json
    import subprocess
    import sys

    config = {
        "name": "launcher_smoke",
        "dataset": "synthetic",
        "dataset_params": {"num_train": 256, "num_test": 120,
                           "image_shape": [16, 16, 1]},
        "num_clients": 2, "num_rounds": 1, "batch_size": 16,
        "local_epochs": 1, "learning_rate": 0.05, "partition": "iid",
        "eval_batch_size": 60,
    }
    import socket as sk

    s = sk.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]
    s.close()
    env = dict(os.environ, MFT_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    proc = subprocess.run(
        [sys.executable, "-m",
         "multimodal_fl_security_tpu.runtime.launcher",
         "--config-json", json.dumps(config), "--port", str(port),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # The server process prints a final-evaluation JSON line.
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["rounds"] == 1
    assert 0.0 <= out["final_accuracy"] <= 1.0


@pytest.mark.slow
def test_multiprocess_soak_kill_one_mid_run(tmp_path):
    """True multi-process soak: 1 server + 4 client OS processes over TCP,
    4 rounds; one client is SIGKILLed after round 2 completes. The server
    must drop it (runtime/server.py fault path) and finish all rounds with
    3 survivors. (Sized to the CI box: each client process boot — jax
    import + compile — takes MINUTES serialized on its single throttled
    core, so larger fleets never all connect inside any sane deadline; the
    same test ran at 20 clients x 10 rounds on a faster host.)"""
    import json
    import signal
    import subprocess
    import sys
    import time

    num_clients, num_rounds = 4, 4
    history_path = str(tmp_path / "history.json")
    config = {
        "name": "soak",
        "dataset": "synthetic",
        "dataset_params": {"num_train": 640, "num_test": 120,
                           "image_shape": [16, 16, 1]},
        "num_clients": num_clients, "num_rounds": num_rounds,
        "batch_size": 16, "local_epochs": 1, "learning_rate": 0.05,
        "partition": "iid", "history_path": history_path,
        # Healthy clients contending for ONE core straggle far past the
        # default 600 s fit deadline; only the SIGKILLed client should be
        # dropped, so the straggler deadline must exceed worst-case boot.
        "fit_timeout": 1500.0,
        # Unlike run_experiment (which polls the port before spawning
        # clients), this test spawns the roles directly, so the clients'
        # connect-retry budget must cover the server's multi-minute boot.
        "connect_timeout": 1200.0,
    }
    import socket as sk

    s = sk.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]
    s.close()
    env = dict(os.environ, MFT_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def spawn(role, stderr=None):
        return subprocess.Popen(
            [sys.executable, "-m",
             "multimodal_fl_security_tpu.runtime.launcher",
             "--config-json", json.dumps(config), "--port", str(port),
             "--platform", "cpu"] + role,
            stdout=subprocess.PIPE, stderr=stderr, text=True,
            env=env, cwd=root,
        )

    stderr_path = tmp_path / "server_err.log"
    procs = []
    try:
        with open(stderr_path, "w") as errf:
            server = spawn(["--server-only"], stderr=errf)
            procs.append(server)
            time.sleep(2.0)
            clients = [spawn(["--client", str(i)],
                             stderr=subprocess.DEVNULL)
                       for i in range(num_clients)]
            procs.extend(clients)
            victim = clients[-1]

            # Kill the victim once the server has aggregated round 2 (so
            # the death is genuinely mid-experiment, not before or after).
            # Generous deadline: sequential jax-import boots alone take
            # many minutes on this box.
            deadline = time.time() + 1500
            killed = False
            while time.time() < deadline:
                if server.poll() is not None:
                    break
                log = open(stderr_path).read()
                if not killed and "round 2 aggregated" in log:
                    victim.send_signal(signal.SIGKILL)
                    killed = True
                if "round %d aggregated" % num_rounds in log:
                    break
                time.sleep(0.5)
            assert killed, "never saw round 2 complete:\n" + open(
                stderr_path).read()[-2000:]

            out, _ = server.communicate(timeout=900)
            for c in clients:
                if c.poll() is None:
                    try:
                        c.wait(timeout=60)
                    except subprocess.TimeoutExpired:
                        c.kill()
    finally:
        # Never leak subprocesses on failure: leaked clients poison every
        # later test/bench on this single-core host.
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert server.returncode == 0, open(stderr_path).read()[-2000:]

    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    result = json.loads(line)
    assert result["rounds"] == num_rounds
    assert result["total_failures"] >= 1          # the victim was dropped
    assert result["final_participants"] == num_clients - 1

    with open(history_path) as f:
        history = json.load(f)
    assert len(history) == num_rounds
    # Every round after the kill ran with the survivors only.
    post = [h for h in history if h["num_failures"] > 0]
    assert post, "no round recorded the failure"
    first_fail = post[0]["round"]
    for h in history:
        if h["round"] > first_fail:
            assert h["num_participants"] == num_clients - 1
            assert h["num_failures"] == 0

def test_server_round_steps_privacy_accounting():
    """The TCP server's round loop steps the DP accountant per applied
    round (in-process: drive _run_round with stub sockets replaced by a
    direct call path is overkill — use one threaded round)."""
    import time

    import jax.numpy as jnp  # noqa: F401

    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.runtime.server import FLServer

    config = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 256, "num_test": 100},
        "num_clients": 2, "batch_size": 16, "local_epochs": 1,
        "learning_rate": 0.05, "partition": "iid",
    }
    ds = load_dataset("synthetic", "train", **config["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    import socket as sk

    s = sk.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]
    s.close()
    server = FLServer(flat0, num_clients=2, num_rounds=2,
                      defense_type="dp_sgd",
                      defense_config={"clip_norm": 50.0,
                                      "noise_multiplier": 1.0},
                      host="127.0.0.1", port=port)
    result = {}
    st = threading.Thread(target=lambda: result.update(f=server.serve()))
    st.start()
    time.sleep(0.3)
    clients = [FLClient(i, config) for i in range(2)]
    for c in clients:
        c.fit(flat0, 0)
    threads = [threading.Thread(target=c.run, kwargs={"port": port})
               for c in clients]
    for t in threads:
        t.start()
    st.join(timeout=240)
    for t in threads:
        t.join(timeout=60)
    assert "f" in result
    eps = [h["privacy_epsilon"] for h in server.history]
    assert len(eps) == 2 and 0 < eps[0] < eps[1]
    assert server.defense.rounds_applied == 2
