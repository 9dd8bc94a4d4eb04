#!/usr/bin/env python
"""Distributed experiment launcher (reference: run_experiment.py).

Spawns a server + N client processes over the TCP runtime:

    python run_experiment.py --config configs/default.yaml
    python run_experiment.py --config cfg.yaml --server-only
    python run_experiment.py --config cfg.yaml --client 2
"""

import sys

from multimodal_fl_security_tpu.runtime.launcher import main

if __name__ == "__main__":
    sys.exit(main())
