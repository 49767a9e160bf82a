"""Profiling hooks (SURVEY.md §5: the reference has wall-clock logging only).

Setting KF2VEC_PROFILE_DIR captures a jax.profiler trace (XLA op-level,
viewable in TensorBoard/Perfetto) around the wrapped region; otherwise the
context is free. Trainers wrap their first profiled epochs with this.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def maybe_trace(tag: str):
    profile_dir = os.environ.get("KF2VEC_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    target = os.path.join(profile_dir, tag)
    os.makedirs(target, exist_ok=True)
    with jax.profiler.trace(target):
        yield


class StepTimer:
    """Lightweight running step-time stats for throughput logs."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
