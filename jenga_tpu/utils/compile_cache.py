"""Persistent XLA compilation cache wiring (the cold-start story).

The reference pays a few seconds of Triton JIT per kernel config and
caches it on disk automatically
(`/root/reference/hyvideo/modules/attention_block_triton_diffres.py:13-14`);
this framework instead compiles one XLA program per ProRes stage — up to
115k tokens for the flagship HY config — which costs minutes cold. JAX
ships a persistent compilation cache that makes the second process start
in seconds; this module is the single switch that turns it on for every
production entry point (runtime samplers, CLI, bench). Cold/warm numbers
per production program are committed in COMPILE.json
(tools/compile_profile.py) and the operational guidance lives in
RUNBOOK.md ("Cold start").

Resolution order for the cache directory:
  1. explicit ``cache_dir`` argument (CLI ``--compile-cache-dir``),
  2. ``JENGA_COMPILE_CACHE`` env var (empty string disables),
  3. ``~/.cache/jenga_tpu/xla`` (XDG_CACHE_HOME honored).

Call it as early as possible — before the first ``jit`` runs, ideally
before the backend initializes. Calling after compiles have happened is
safe (later compiles still cache) but the early ones are the expensive
ones.
"""

from __future__ import annotations

import os

_DISABLED = ("0", "off", "none", "disabled")


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "jenga_tpu", "xla")


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_secs: float = 2.0) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in effect, or None when disabled (explicit
    ``JENGA_COMPILE_CACHE=0``/``off``/empty). Idempotent; a second call
    with a different directory re-points the cache.

    ``min_compile_secs`` skips caching sub-2s compiles (tiny test
    programs) so the cache holds only the programs worth persisting.
    """
    env = os.environ.get("JENGA_COMPILE_CACHE")
    if cache_dir is None:
        if env is not None and env.strip().lower() in _DISABLED + ("",):
            return None
        cache_dir = env or default_cache_dir()
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
