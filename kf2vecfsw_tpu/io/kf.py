""".kf feature-file reader/writer, byte-compatible with the reference.

A `.kf` file holds one CSV line per sample: ``name,v1,...,vV`` where V is the
canonical vocab size and values are float64 rendered with Python float repr
(the reference builds them via pandas ``astype(str)`` + ``",".join`` at
main.py:344-357). Chunked `.kf` files hold one line per 10 kb window.
"""

from __future__ import annotations

import numpy as np

from .native import lib as native_lib


def float_repr(v: float) -> str:
    """Shortest-repr rendering of a float64, matching str(float) used by the
    reference's pandas astype(str) (main.py:344)."""
    return repr(float(v))


def write_kf(path: str, rows: list[tuple[str, np.ndarray]]) -> None:
    """Write (name, values) rows. Values must already be float64 counts or
    frequencies; formatting matches main.py:344-357 byte for byte."""
    with open(path, "w") as f:
        for name, values in rows:
            append_kf(f, name, values)


def append_kf(f, name: str, values: np.ndarray) -> None:
    f.write(name)
    f.write(",")
    values = np.asarray(values, dtype=np.float64)
    # fast path for integral rows (raw chunk counts): repr of an integral
    # float64 below 1e16 is always "<int>.0", and str(int) is ~10x cheaper
    # than repr(float) — this is 90% of get_chunks wall time otherwise
    if values.size and np.abs(values).max() < 1e15 and not np.any(values % 1.0):
        native = native_lib.try_load()
        if native is not None:
            line = native.format_counts(values.astype(np.int64))
            if line is not None:
                f.write(line)
                return
        f.write(".0,".join(map(str, values.astype(np.int64).tolist())))
        f.write(".0\n")
    else:
        native = native_lib.try_load()
        if native is not None:
            line = native.format_doubles(values, sep=",")
            if line is not None:
                f.write(line)
                return
        f.write(",".join(map(repr, values.tolist())))
        f.write("\n")


def _parse_values(rest: str) -> np.ndarray:
    native = native_lib.try_load()
    if native is not None:
        out = native.parse_doubles(rest.encode("ascii", "replace"))
        if out is not None:
            return out
    return np.array(rest.split(","), dtype=np.float64)


def read_kf(path: str, dtype=np.float64) -> tuple[list[str], np.ndarray]:
    """Read a .kf file -> (names, (rows, V) float array). Whole-file native
    parse when built (~10x: the read path is parse-bound)."""
    native = native_lib.try_load()
    if native is not None:
        with open(path, "rb") as fb:
            res = native.parse_table(fb.read())
        if res is not None:
            names, mat = res
            if not names:
                return names, np.zeros((0, 0), dtype=dtype)
            return names, mat.astype(dtype, copy=False)
    names: list[str] = []
    rows: list[np.ndarray] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            name, _, rest = line.partition(",")
            names.append(name)
            rows.append(_parse_values(rest))
    if not rows:
        return names, np.zeros((0, 0), dtype=dtype)
    return names, np.vstack(rows).astype(dtype, copy=False)


def read_kf_files(paths: list[str], dtype=np.float64) -> tuple[list[str], np.ndarray]:
    """Concatenate several .kf files (order preserved). All files are read
    and parsed as ONE native table when possible — per-file parse overhead
    dominates serving blocks of thousands of single-row query files."""
    native = native_lib.try_load()
    if native is not None and paths:
        parts = []
        for p in paths:
            with open(p, "rb") as fb:
                data = fb.read()
            if data and not data.endswith(b"\n"):
                data += b"\n"
            parts.append(data)
        res = native.parse_table(b"".join(parts))
        if res is not None:
            names, mat = res
            if not names:
                return names, np.zeros((0, 0), dtype=dtype)
            return names, mat.astype(dtype, copy=False)
    all_names: list[str] = []
    mats: list[np.ndarray] = []
    for p in paths:
        names, mat = read_kf(p, dtype=dtype)
        all_names.extend(names)
        if mat.size:
            mats.append(mat)
    if not mats:
        return all_names, np.zeros((0, 0), dtype=dtype)
    return all_names, np.vstack(mats)
