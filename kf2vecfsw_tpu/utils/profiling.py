"""Profiling hooks (SURVEY.md §5: the reference has wall-clock logging only).

Setting KF2VEC_PROFILE_DIR captures a jax.profiler trace (XLA op-level,
viewable in TensorBoard/Perfetto) around the wrapped region; otherwise the
context is free. Trainers wrap their first profiled epochs with this.
"""

from __future__ import annotations

import contextlib
import os


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
