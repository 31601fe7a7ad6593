"""Persistent XLA compilation cache.

Compiles through the axon TPU tunnel cost 1-10 MINUTES per executable;
every fresh process used to pay them again. jax's persistent cache
(jax_compilation_cache_dir) works through the axon backend (verified
2026-08-20: second-process compile of a cached executable is ~instant),
so every entry point opts in via this helper. The cache key covers the
HLO + compile options + backend version, so stale hits are not a risk.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> bool:
    """Best-effort enable; returns True if the config took."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path or DEFAULT_DIR)
        # Cache everything that took >2s to compile (default 1s is fine
        # too, but tiny executables churn the directory).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception:
        return False
