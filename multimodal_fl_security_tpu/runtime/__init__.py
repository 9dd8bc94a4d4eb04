"""Distributed FL runtime: real server/client processes over TCP.

The reference's second execution path runs one OS process per participant
with Flower's gRPC protocol (reference: src/server/fl_server.py,
src/client/fl_client.py, run_experiment.py; SURVEY.md §3.3). This package
is the equivalent here: a dependency-free length-prefixed TCP transport
carrying the framework's canonical flat-float32 parameter vectors, a server
that applies any registered defense to the gathered [C, D] update matrix on
its own accelerator, honest/malicious client processes running the same
jitted local-training program as the simulation, and a subprocess launcher.

The simulation path (rounds/engine.py) remains the fast path — in it the
"network" is an array axis. This path exists for protocol parity and for
actually-distributed deployments.
"""

from multimodal_fl_security_tpu.runtime.server import FLServer  # noqa: F401
from multimodal_fl_security_tpu.runtime.client import FLClient  # noqa: F401
