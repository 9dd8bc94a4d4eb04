"""Distributed experiment launcher: spawn a server + N client processes.

Parity with the reference launcher (reference: run_experiment.py:79-169):
loads a YAML config, starts the server process, staggers client process
starts, waits for completion, and tears everything down on interrupt;
``--server-only`` / ``--client i`` modes for manual multi-host runs.

Usage:
    python -m multimodal_fl_security_tpu.runtime.launcher --config cfg.yaml
    python -m multimodal_fl_security_tpu.runtime.launcher --server-only ...
    python -m multimodal_fl_security_tpu.runtime.launcher --client 2 ...
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import subprocess
import sys
import time
from typing import Any, Dict, List

logger = logging.getLogger(__name__)


def _server_main(config: Dict[str, Any], port: int) -> None:
    import numpy as np

    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.utils.metrics import evaluate_model

    dataset = load_dataset(config.get("dataset", "synthetic"), "train",
                           config.get("data_dir"),
                           **config.get("dataset_params", {}))
    test = load_dataset(config.get("dataset", "synthetic"), "test",
                        config.get("data_dir"),
                        **config.get("dataset_params", {}))
    model = create_model(config.get("model") or "simple_cnn",
                         num_classes=dataset.num_classes)
    sample = {k: v[:8] for k, v in dataset.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    flat = np.asarray(flatten_tree(params), np.float32)

    # The canonical merged defense hyperparameters: the YAML loader maps
    # defense.num_malicious/trim_ratio into TOP-LEVEL ExperimentConfig
    # fields, so passing only config['defense_params'] to the server would
    # silently run krum with the default f=1 (etc.). Rebuild through the
    # dataclass so the distributed path and the simulation path
    # parameterize defenses identically.
    import dataclasses as _dc

    from multimodal_fl_security_tpu.experiments.config import (
        ExperimentConfig,
    )

    _fields = {f.name for f in _dc.fields(ExperimentConfig)}
    defense_cfg = ExperimentConfig(
        **{k: v for k, v in config.items() if k in _fields}
    ).defense_config()

    if config.get("aggregation_mode", "sync") == "async":
        # Buffered asynchronous aggregation (runtime/async_server.py).
        from multimodal_fl_security_tpu.runtime.async_server import (
            AsyncFLServer,
        )

        server = AsyncFLServer(
            flat,
            num_clients=int(config["num_clients"]),
            num_aggregations=int(config.get("num_aggregations",
                                            config.get("num_rounds", 3))),
            buffer_size=int(config.get("buffer_size", 2)),
            server_lr=float(config.get("server_lr", 1.0)),
            staleness_exponent=float(config.get("staleness_exponent", 0.5)),
            defense_type=config.get("defense_type", "none"),
            defense_config=defense_cfg,
            port=port,
        )
    else:
        server = FLServer(
            flat,
            num_clients=int(config["num_clients"]),
            num_rounds=int(config.get("num_rounds", 3)),
            defense_type=config.get("defense_type", "none"),
            defense_config=defense_cfg,
            port=port,
            fit_timeout=float(config.get("fit_timeout", 600.0)),
            secure_aggregation=bool(config.get("secure_aggregation", False)),
            secagg_scale=(float(config["secagg_scale"])
                          if "secagg_scale" in config else None),
            secagg_min_contributors=int(
                config.get("secagg_min_contributors", 2)
            ),
            secagg_threshold=(int(config["secagg_threshold"])
                              if "secagg_threshold" in config else None),
        )
    final = server.serve()

    from multimodal_fl_security_tpu.core.pytrees import unflatten_tree
    import jax.numpy as jnp

    final_params = unflatten_tree(params, jnp.asarray(final))
    stats = evaluate_model(model, final_params, test)
    if config.get("history_path"):
        with open(config["history_path"], "w") as f:
            json.dump(server.history, f, indent=2)
    print(json.dumps({
        "final_accuracy": stats["accuracy"],
        "final_loss": stats["loss"],
        "rounds": len(server.history),
        "total_failures": sum(
            h.get("num_failures", 0) for h in server.history
        ),
        "final_participants": (
            server.history[-1].get("num_participants",
                                   server.history[-1].get("buffer_size", 0))
            if server.history else 0
        ),
    }))


def _client_main(config: Dict[str, Any], client_id: int, port: int) -> None:
    from multimodal_fl_security_tpu.runtime.client import start_client

    malicious = client_id in set(config.get("malicious_clients", []))
    start_client(client_id, config, port=port, malicious=malicious)


def _wait_for_port(host: str, port: int, proc: "subprocess.Popen",
                   timeout: float = 900.0) -> None:
    """Poll until the server socket accepts (or the server process dies)."""
    import socket as sk

    t0 = time.monotonic()
    while True:
        if proc.poll() is not None:
            raise RuntimeError(
                f"server process exited rc={proc.returncode} before "
                "accepting connections"
            )
        try:
            sk.create_connection((host, port), timeout=2.0).close()
            return
        except OSError:
            if time.monotonic() - t0 > timeout:
                raise TimeoutError(
                    f"server did not accept on {host}:{port} "
                    f"within {timeout}s"
                )
            time.sleep(0.5)


def run_experiment(config: Dict[str, Any], port: int = 8080,
                   python: str = sys.executable) -> int:
    """Spawn server + clients as subprocesses (reference:
    run_experiment.py:79-127)."""
    cfg_json = json.dumps(config)
    env = dict(os.environ)
    procs: List[subprocess.Popen] = []

    def spawn(role_args: List[str]) -> subprocess.Popen:
        return subprocess.Popen(
            [python, "-m", "multimodal_fl_security_tpu.runtime.launcher",
             "--config-json", cfg_json, "--port", str(port)] + role_args,
            env=env,
        )

    try:
        server = spawn(["--server-only"])
        procs.append(server)
        # Wait until the server actually accepts, not a blind sleep (the
        # reference sleeps 3 s, run_experiment.py:103 — on a loaded 1-core
        # host the server's first jit compile alone can exceed that). The
        # probe connection closes before hello; the server ignores it.
        _wait_for_port("127.0.0.1", port, server,
                       timeout=float(config.get("server_boot_timeout", 900)))
        for i in range(int(config["num_clients"])):
            procs.append(spawn(["--client", str(i)]))
            time.sleep(0.3)
        rc = server.wait()
        for p in procs[1:]:
            try:
                p.wait(timeout=60)
            except subprocess.TimeoutExpired:
                # A client that never saw 'done' (e.g. its socket died with
                # the server) must not hang the launcher.
                logger.warning("client pid %d still alive after server "
                               "exit; killing", p.pid)
                p.kill()
                p.wait()
        return rc
    except KeyboardInterrupt:
        logger.info("interrupt: terminating %d processes", len(procs))
        for p in procs:
            p.send_signal(signal.SIGTERM)
        return 130
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="YAML config path")
    ap.add_argument("--config-json", help="inline JSON config (internal)")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--server-only", action="store_true")
    ap.add_argument("--client", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) in this process; "
                    "propagated to spawned roles via MFT_PLATFORM")
    args = ap.parse_args(argv)

    platform = args.platform or os.environ.get("MFT_PLATFORM")
    if platform:
        if os.environ.get("MFT_PLATFORM") != platform:
            # The jax backend is pinned at FIRST initialization, and
            # `python -m ...launcher` imports the package __init__ (which
            # touches jax) before this function runs — a config.update
            # here is too late, and the role would silently compute on
            # the default platform (observed: "cpu" roles running against
            # the TPU tunnel). The package __init__ applies MFT_PLATFORM
            # before any jax-touching import, so re-exec once with it
            # set; spawned roles inherit it via os.environ.
            os.environ["MFT_PLATFORM"] = platform
            os.execv(sys.executable,
                     [sys.executable, "-m",
                      "multimodal_fl_security_tpu.runtime.launcher"]
                     + list(argv if argv is not None else sys.argv[1:]))
        import jax

        # Already applied by the package __init__ (same value) — kept as
        # a guard for embedders calling main() directly.
        jax.config.update("jax_platforms", platform)

    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if args.config_json:
        config = json.loads(args.config_json)
    elif args.config:
        from multimodal_fl_security_tpu.utils.yaml_config import (
            load_config_dict,
        )

        config = load_config_dict(args.config)
    else:
        ap.error("--config or --config-json required")

    if args.server_only:
        _server_main(config, args.port)
        return 0
    if args.client is not None:
        _client_main(config, args.client, args.port)
        return 0
    return run_experiment(config, args.port)


if __name__ == "__main__":
    sys.exit(main())
