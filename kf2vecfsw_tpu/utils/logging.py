"""Per-run file+stream loggers, mirroring the reference's operator experience
(timestamped log file in the output dir, message-only format; e.g.
train_model_set.py:114-130)."""

from __future__ import annotations

import itertools
import logging
import os
import time

_counter = itertools.count()


def make_run_logger(out_dir: str, filename: str) -> logging.Logger:
    log = logging.getLogger(f"kf2vec.run{next(_counter)}")
    log.setLevel(logging.INFO)
    log.propagate = False
    fmt = logging.Formatter("%(message)s")
    os.makedirs(out_dir, exist_ok=True)
    if _is_write_owner():
        # coordinator-only file handler: on a shared filesystem every
        # process would otherwise truncate ('w+') and interleave the SAME
        # log file; other processes keep the stream handler below
        fh = logging.FileHandler(os.path.join(out_dir, filename), "w+")
        fh.setFormatter(fmt)
        log.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    log.addHandler(sh)
    return log


def close_logger(log: logging.Logger) -> None:
    for h in list(log.handlers):
        log.removeHandler(h)
        h.close()


def timestamp() -> str:
    return time.strftime("%Y%m%d_%H%M%S")


def _is_write_owner() -> bool:
    """process 0 owns log-file writes (mirrors train.resume.is_coordinator
    without importing jax at module import time)."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True
