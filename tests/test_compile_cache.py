"""Persistent compile cache wiring (jenga_tpu/utils/compile_cache.py)."""

import os

import jax

from jenga_tpu.utils.compile_cache import (default_cache_dir,
                                           enable_compile_cache)


def test_enable_points_jax_at_directory(tmp_path, monkeypatch):
    monkeypatch.delenv("JENGA_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "cache")
    got = enable_compile_cache(d)
    assert got == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0


def test_env_var_overrides_default(tmp_path, monkeypatch):
    d = str(tmp_path / "env_cache")
    monkeypatch.setenv("JENGA_COMPILE_CACHE", d)
    assert enable_compile_cache() == d
    assert jax.config.jax_compilation_cache_dir == d


def test_env_var_disables(monkeypatch):
    before = jax.config.jax_compilation_cache_dir
    for val in ("", "0", "off"):
        monkeypatch.setenv("JENGA_COMPILE_CACHE", val)
        assert enable_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def test_explicit_dir_beats_disabling_env(tmp_path, monkeypatch):
    # CLI --compile-cache-dir wins over a disabling env var
    monkeypatch.setenv("JENGA_COMPILE_CACHE", "off")
    d = str(tmp_path / "explicit")
    assert enable_compile_cache(d) == d


def test_default_dir_under_cache_home(monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", "/tmp/xdg")
    assert default_cache_dir() == "/tmp/xdg/jenga_tpu/xla"


def test_cli_backend_plumbs_cache_flags(tmp_path, monkeypatch):
    """_apply_backend honors --compile-cache-dir and --no-compile-cache."""
    import argparse

    from jenga_tpu.cli import _apply_backend

    monkeypatch.delenv("JENGA_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "cli_cache")
    ns = argparse.Namespace(cpu=False, compile_cache_dir=d,
                            no_compile_cache=False)
    _apply_backend(ns)
    assert jax.config.jax_compilation_cache_dir == d

    before = jax.config.jax_compilation_cache_dir
    ns2 = argparse.Namespace(cpu=False, compile_cache_dir=None,
                             no_compile_cache=True)
    _apply_backend(ns2)
    assert jax.config.jax_compilation_cache_dir == before  # untouched
