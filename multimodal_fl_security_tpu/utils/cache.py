"""Persistent XLA compilation cache helper.

Round programs and Pallas kernels can take minutes to compile through a
remote-attached TPU; enabling the on-disk cache makes every later process
start hot. Call early (before the first jit execution).
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get(
        "MFT_COMPILE_CACHE", os.path.expanduser("~/.cache/mft_xla_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
