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


def test_sampler_ensure_respects_cli_decision(tmp_path, monkeypatch):
    """ensure_compile_cache (sampler hook) must not override an explicit
    CLI decision — the review finding that made --no-compile-cache /
    --compile-cache-dir silent no-ops."""
    import jenga_tpu.utils.compile_cache as cc

    monkeypatch.delenv("JENGA_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_decided", False)

    d = str(tmp_path / "cli_choice")
    cc.enable_compile_cache(d)
    cc.ensure_compile_cache()          # sampler constructor
    assert jax.config.jax_compilation_cache_dir == d   # not re-pointed

    # --no-compile-cache: disable pins the decision
    monkeypatch.setattr(cc, "_decided", False)
    before = jax.config.jax_compilation_cache_dir
    cc.disable_compile_cache()
    assert cc.ensure_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == before

    # no prior decision: ensure enables the default
    monkeypatch.setattr(cc, "_decided", False)
    monkeypatch.setenv("JENGA_COMPILE_CACHE", str(tmp_path / "dflt"))
    assert cc.ensure_compile_cache() == str(tmp_path / "dflt")


def test_enable_repo_cache_policy(tmp_path, monkeypatch):
    """Tools policy: env (incl. disable values) wins; else <root>/.jax_cache.
    The review finding: 'off' must DISABLE, not become a directory."""
    import jenga_tpu.utils.compile_cache as cc

    monkeypatch.delenv("JENGA_COMPILE_CACHE", raising=False)
    root = str(tmp_path / "repo")
    os.makedirs(root)
    assert cc.enable_repo_cache(root) == os.path.join(root, ".jax_cache")

    monkeypatch.setenv("JENGA_COMPILE_CACHE", "off")
    assert cc.enable_repo_cache(root) is None
    assert not os.path.exists("off")

    d = str(tmp_path / "envdir")
    monkeypatch.setenv("JENGA_COMPILE_CACHE", d)
    assert cc.enable_repo_cache(root) == d
