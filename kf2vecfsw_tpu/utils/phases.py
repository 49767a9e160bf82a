"""Serving phase accounting: per-phase wall time + dispatch counts.

The round-3 serving regression hid inside an unaccounted "device dispatch"
bucket; this collector makes the e2e number auditable — classify/query wrap
their parse / host->device transfer / device fetch / text-format sections in
`phase(...)` and count jit dispatches, and the bench emits a breakdown whose
parts must sum to ~the e2e wall clock. Zero overhead when no collector is
active (module-level None check). Thread-safe: the prefetch thread parses
blocks while the main thread formats.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

_lock = threading.Lock()
_active: dict[str, float] | None = None


@contextmanager
def collect():
    """Activate collection; yields the dict of phase -> seconds (and
    'dispatches' -> count). Nested collects are not supported (serving
    entry points don't nest)."""
    global _active
    stats: dict[str, float] = {}
    with _lock:
        _active = stats
    try:
        yield stats
    finally:
        with _lock:
            _active = None


@contextmanager
def phase(name: str):
    if _active is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            if _active is not None:
                _active[name] = _active.get(name, 0.0) + dt


def count(name: str, n: int = 1) -> None:
    if _active is None:
        return
    with _lock:
        if _active is not None:
            _active[name] = _active.get(name, 0.0) + n
