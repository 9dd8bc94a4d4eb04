"""Persistent-compile-cache helper (utils/cache.py) unit tests."""

import os

import jax

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache


def test_enable_compile_cache_creates_dir_and_sets_config(tmp_path, monkeypatch):
    target = str(tmp_path / "xla_cache")
    monkeypatch.delenv("MFT_COMPILE_CACHE", raising=False)
    enable_compile_cache(target)
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_enable_compile_cache_env_override(tmp_path, monkeypatch):
    target = str(tmp_path / "from_env")
    monkeypatch.setenv("MFT_COMPILE_CACHE", target)
    enable_compile_cache()
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
