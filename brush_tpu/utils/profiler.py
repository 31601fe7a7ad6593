"""Profiling hooks (reference: tracing spans + tracy + sync-span crate).

- `trace(dir)`: jax.profiler trace context (TensorBoard/Perfetto viewable).
- `span(name)`: named scope appearing in profiles (reference: trace_span!).
- `sync_mode`: when enabled, `span` blocks on device completion at scope
  close so wall times reflect device time — the sync-span crate's trick
  (sync-span/src/lib.rs:29-42), implemented with block_until_ready.
"""

from __future__ import annotations

import contextlib
import time

import jax

_SYNC = {"enabled": False}
_TIMINGS: dict[str, list] = {}


def set_sync_mode(enabled: bool) -> None:
    """(reference: sync-span global toggle, lib.rs:45-49)."""
    _SYNC["enabled"] = enabled


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def span(name: str, *sync_arrays):
    """Named profiler scope; in sync mode also records device wall time."""
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    if _SYNC["enabled"]:
        for arr in sync_arrays:
            jax.block_until_ready(arr)
        _TIMINGS.setdefault(name, []).append(time.perf_counter() - t0)


def timings() -> dict[str, float]:
    """Mean seconds per span recorded while sync mode was on."""
    return {k: sum(v) / len(v) for k, v in _TIMINGS.items() if v}


def reset_timings() -> None:
    _TIMINGS.clear()
