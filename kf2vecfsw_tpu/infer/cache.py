"""Device-resident serving cache for checkpoints and backbone anchors.

The serving loop (reference: classify.py:83-90 + query.py:118-134 reload the
model from disk on every invocation) is dominated on PCIe/tunneled rigs not
by compute but by re-transferring the same parameters host->device on every
call: the flagship classifier is 67 MB and each subtree distance model is
~76 MB, so at a measured ~37 MB/s link one classify+query pass moves ~5.8 s
of bytes that never change. A deployed serving process keeps hot models
device-resident; this module is that cache.

Entries are keyed by the checkpoint's real path and invalidated by
(mtime_ns, size), so retraining a subtree model is picked up on the next
call. Eviction is byte-aware LRU under a per-device HBM fraction (1/4 by
default, env-overridable via KF2VEC_HBM_BYTES like every other budget), so
serving a library with hundreds of subtrees cannot accumulate params past
the budget.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Any, Callable

import jax
import numpy as np


def serving_cache_budget_bytes() -> int:
    from ..utils.membudget import hbm_fraction

    return hbm_fraction(1, 4)


def _tree_device_bytes(value: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(value):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
    return total


class DeviceFileCache:
    """Byte-budget LRU of device-resident values derived from files."""

    def __init__(self, budget_bytes: Callable[[], int] = serving_cache_budget_bytes):
        self._budget_bytes = budget_bytes
        self._lock = threading.Lock()
        self._entries: OrderedDict[str, tuple[tuple[int, int], int, Any]] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, path: str, build: Callable[[], Any]) -> Any:
        key = os.path.realpath(path)
        st = os.stat(key)
        sig = (st.st_mtime_ns, st.st_size)
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None and hit[0] == sig:
                self._entries.move_to_end(key)
                self.hits += 1
                return hit[2]
        # build outside the lock: device_put of a 76 MB model must not
        # serialize unrelated lookups behind a slow link
        value = build()
        nbytes = _tree_device_bytes(value)
        with self._lock:
            old = self._entries.pop(key, None)
            if old is not None:
                self._bytes -= old[1]
            self.misses += 1
            budget = self._budget_bytes()
            if nbytes <= budget:
                self._entries[key] = (sig, nbytes, value)
                self._bytes += nbytes
                while self._bytes > budget and len(self._entries) > 1:
                    _, (_, old_bytes, _) = self._entries.popitem(last=False)
                    self._bytes -= old_bytes
        return value

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._bytes = 0

    @property
    def nbytes(self) -> int:
        return self._bytes

    def __len__(self) -> int:
        return len(self._entries)


_checkpoints = DeviceFileCache()
_anchors = DeviceFileCache()


def cached_checkpoint(path: str) -> tuple[str, dict, Any]:
    """load_checkpoint with device-resident params, LRU-cached by file."""

    def build():
        from ..train.checkpoint import load_checkpoint

        model_name, meta, params = load_checkpoint(path)
        return model_name, meta, jax.device_put(params)

    return _checkpoints.get(path, build)


def cached_embeddings(path: str) -> tuple[list[str], jax.Array]:
    """Backbone embeddings CSV -> (names, device array), LRU-cached.

    The anchor ROW COUNT is padded to the geometric item bucket (zeros):
    every clade's backbone size then maps to one of a handful of shapes, so
    the fused query step (forward + cdist to anchors) compiles once per
    bucket instead of once per subtree — on compile-bound rigs the
    per-subtree distinct anchor counts were 9 fresh ~15-30 s XLA compiles
    per serving process. Callers crop distance columns to len(names)."""

    def build():
        from ..train.step import bucket_items
        from .query import read_embeddings_csv

        names, emb = read_embeddings_csv(path)
        nb = bucket_items(emb.shape[0])
        if nb > emb.shape[0]:
            emb = np.pad(emb, ((0, nb - emb.shape[0]), (0, 0)))
        return names, jax.device_put(np.ascontiguousarray(emb))

    return _anchors.get(path, build)


def _kf_cache_budget() -> int:
    return int(os.environ.get("KF2VEC_KF_CACHE_BYTES", 512 << 20))


_kf_rows = DeviceFileCache(budget_bytes=_kf_cache_budget)


def read_kf_files_cached(paths: list[str], dtype=np.float32):
    """read_kf_files with a host-RAM LRU of parsed rows (512 MB default,
    KF2VEC_KF_CACHE_BYTES to override). The serving pipeline parses the same
    query `.kf` files twice per pass (classify, then query) — parsed f32
    rows are ~6x smaller than their text and the second pass becomes a
    stat+vstack."""
    from ..io.kf import read_kf

    all_names: list[str] = []
    mats: list[np.ndarray] = []
    for p in paths:
        names, mat = _kf_rows.get(p, lambda p=p: read_kf(p, dtype=np.float32))
        all_names.extend(names)
        if mat.size:
            mats.append(mat)
    if not mats:
        return all_names, np.zeros((0, 0), dtype=dtype)
    return all_names, np.vstack(mats).astype(dtype, copy=False)


# -- shared device-resident query feature matrix --------------------------------
#
# classify and query each ship the SAME query feature block host->device
# (classify once, query once per clade partition) — on a 37 MB/s tunneled
# link the duplicate 17 MB transfer is ~35% of the 512-query e2e wall clock.
# Cache the whole scaled (rows, V) matrix on device once per query-file set;
# classify slices row blocks from it and query gathers per-clade row subsets
# by index, so only tiny int32 index vectors cross the link after the first
# pass. Keyed by the ordered (realpath, mtime_ns, size) of every file so a
# re-written query file invalidates the set.


class QueryMatrixCache:
    """Tiny LRU (few entries — serving processes handle one query set at a
    time) of (row_names, {file_stem: (start, stop)}, device matrix)."""

    def __init__(self, max_entries: int = 2):
        self._max = max_entries
        self._lock = threading.Lock()
        self._entries: OrderedDict[tuple, tuple] = OrderedDict()

    def get(self, paths: list[str]):
        """None when disabled, over budget, or the set is not cacheable."""
        if os.environ.get("KF2VEC_NO_QUERY_MATRIX"):
            return None
        try:
            key = tuple(
                (os.path.realpath(p), st.st_mtime_ns, st.st_size)
                for p, st in ((p, os.stat(p)) for p in paths)
            )
        except OSError:
            return None
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None:
                self._entries.move_to_end(key)
                return hit
        value = self._build(paths, key)
        if value is None:
            return None
        with self._lock:
            self._entries[key] = value
            while len(self._entries) > self._max:
                self._entries.popitem(last=False)
        return value

    def _build(self, paths: list[str], key: tuple):
        from .. import defaults
        from ..io.kf import read_kf
        from ..utils import phases
        from ..utils.membudget import hbm_fraction

        total_bytes = sum(sig[2] for sig in key)
        # text is ~2.4x the f32 it parses to; cheap pre-gate before parsing
        if total_bytes * 2 > hbm_fraction(1, 8):
            return None
        names: list[str] = []
        spans: dict[str, tuple[int, int]] = {}
        mats: list[np.ndarray] = []
        row = 0
        with phases.phase("parse"):
            for p in paths:
                stem = os.path.basename(p).removesuffix(".kf")
                f_names, mat = read_kf(p, dtype=np.float32)
                if mat.size and mats and mat.shape[1] != mats[0].shape[1]:
                    return None  # mixed widths: legacy path reports the error
                names.extend(f_names)
                spans[stem] = (row, row + len(f_names))
                row += len(f_names)
                if mat.size:
                    mats.append(mat)
        if not mats:
            return None
        full = np.vstack(mats)
        if full.shape[0] != row:
            return None  # a file with names but no rows would desync spans
        if full.nbytes > hbm_fraction(1, 8):
            return None
        with phases.phase("transfer"):
            dev = jax.device_put(full * np.float32(defaults.FEATURES_SCALER))
        return names, spans, dev

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()


_query_mats = QueryMatrixCache()


def cached_query_matrix(paths: list[str]):
    """(row_names, {stem: (start, stop)}, device (rows, V) f32 matrix
    already scaled by FEATURES_SCALER) — or None (fall back per-block)."""
    return _query_mats.get([p for p in paths if p.endswith(".kf")])


def clear_query_data() -> None:
    """Drop parsed/transferred QUERY data (fresh-queries simulation / tests);
    model checkpoints and anchors stay resident like a real serving process."""
    _kf_rows.clear()
    _query_mats.clear()


def clear_all() -> None:
    _checkpoints.clear()
    _anchors.clear()
    _kf_rows.clear()
    _query_mats.clear()


def cache_stats() -> dict:
    """Hit/miss/residency counters for the serving caches (surfaced by the
    `serve` daemon's `stats` command so operators can see whether requests
    are riding warm device-resident models or re-shipping bytes)."""
    return {
        "checkpoints": {
            "hits": _checkpoints.hits,
            "misses": _checkpoints.misses,
            "entries": len(_checkpoints),
            "device_bytes": _checkpoints.nbytes,
        },
        "anchors": {
            "hits": _anchors.hits,
            "misses": _anchors.misses,
            "entries": len(_anchors),
            "device_bytes": _anchors.nbytes,
        },
        "kf_rows": {
            "hits": _kf_rows.hits,
            "misses": _kf_rows.misses,
            "entries": len(_kf_rows),
            "host_bytes": _kf_rows.nbytes,
        },
    }
