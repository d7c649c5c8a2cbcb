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

# process-wide: has any enable/disable decision been made? The CLI and
# bench decide first; sampler constructors only provide the DEFAULT via
# ensure_compile_cache(), never override an explicit decision (a
# sampler re-pointing the cache after --compile-cache-dir /
# --no-compile-cache would make both flags silent no-ops).
_decided = False


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
    global _decided
    _decided = True
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


def disable_compile_cache() -> None:
    """Record an explicit DON'T-cache decision (CLI --no-compile-cache)
    so later ensure_compile_cache() calls stay no-ops."""
    global _decided
    _decided = True


def ensure_compile_cache() -> str | None:
    """Enable the cache with default resolution UNLESS an explicit
    enable/disable decision was already made this process — the hook for
    library entry points (sampler constructors) that must not override
    the CLI's flags."""
    if _decided:
        return None
    return enable_compile_cache()


def enable_repo_cache(repo_root: str) -> str | None:
    """bench/tools policy: honor ``JENGA_COMPILE_CACHE`` (including its
    disable values) when set; otherwise use ``<repo_root>/.jax_cache`` —
    the repo-local cache every measurement tool shares so a bench chain
    stays warm across tools. The one home of this policy (bench.py and
    tools/ call this instead of hand-rolling jax.config updates)."""
    if os.environ.get("JENGA_COMPILE_CACHE") is not None:
        return enable_compile_cache()
    return enable_compile_cache(os.path.join(repo_root, ".jax_cache"))
