"""ctypes loader for the native ingest library (fastio.cpp).

Builds libkf2vec_io.so on demand with g++ when missing; every caller has a
pure-numpy fallback, so absence of a compiler is never fatal.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libkf2vec_io.so")
_lock = threading.Lock()
_lib = None
_tried = False


class NativeIO:
    def __init__(self, cdll: ctypes.CDLL):
        self._c = cdll
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        self._c.kf2vec_encode.argtypes = [u8p, ctypes.c_int64, u8p]
        self._c.kf2vec_count_canonical.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, i64p, ctypes.c_int,
        ]
        self._c.kf2vec_parse_fasta.argtypes = [
            u8p, ctypes.c_int64, u8p, i64p, i64p, ctypes.c_int64,
        ]
        self._c.kf2vec_parse_fasta.restype = ctypes.c_int64
        try:
            self._c.kf2vec_pack2bit.argtypes = [
                u8p, ctypes.c_int64, u8p, u8p, ctypes.c_int,
            ]
            self._pack2bit = self._c.kf2vec_pack2bit
        except AttributeError:  # stale .so from an older build
            self._pack2bit = None
        try:
            self._c.kf2vec_format_counts.argtypes = [i64p, ctypes.c_int64, u8p]
            self._c.kf2vec_format_counts.restype = ctypes.c_int64
            self._format_counts = self._c.kf2vec_format_counts
        except AttributeError:
            self._format_counts = None
        try:
            self._c.kf2vec_window_codes.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64, i64p,
            ]
            self._window_codes = self._c.kf2vec_window_codes
        except AttributeError:
            self._window_codes = None
        f64p = ctypes.POINTER(ctypes.c_double)
        f32p = ctypes.POINTER(ctypes.c_float)
        try:
            self._c.kf2vec_parse_doubles.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, f64p, ctypes.c_int64,
            ]
            self._c.kf2vec_parse_doubles.restype = ctypes.c_int64
            self._parse_doubles = self._c.kf2vec_parse_doubles
        except AttributeError:
            self._parse_doubles = None
        try:
            self._c.kf2vec_parse_table.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, f64p, ctypes.c_int64,
                i64p, ctypes.c_int64, i64p,
            ]
            self._c.kf2vec_parse_table.restype = ctypes.c_int64
            self._parse_table = self._c.kf2vec_parse_table
        except AttributeError:
            self._parse_table = None
        try:
            self._c.kf2vec_format_doubles.argtypes = [f64p, ctypes.c_int64, u8p, ctypes.c_char]
            self._c.kf2vec_format_doubles.restype = ctypes.c_int64
            self._format_doubles = self._c.kf2vec_format_doubles
            self._c.kf2vec_format_floats.argtypes = [f32p, ctypes.c_int64, u8p, ctypes.c_char]
            self._c.kf2vec_format_floats.restype = ctypes.c_int64
            self._format_floats = self._c.kf2vec_format_floats
        except AttributeError:
            self._format_doubles = None
            self._format_floats = None

    @staticmethod
    def _u8(arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    @staticmethod
    def _i64(arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def encode(self, seq: bytes | np.ndarray) -> np.ndarray:
        src = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.ascontiguousarray(seq, dtype=np.uint8)
        out = np.empty(src.size, dtype=np.uint8)
        self._c.kf2vec_encode(self._u8(src), src.size, self._u8(out))
        return out

    def count_canonical(self, codes: np.ndarray, k: int, n_threads: int | None = None) -> np.ndarray:
        codes = np.ascontiguousarray(codes, dtype=np.uint8)
        hist = np.zeros(4**k, dtype=np.int64)
        threads = n_threads or min(16, os.cpu_count() or 1)
        self._c.kf2vec_count_canonical(
            self._u8(codes), codes.size, k, self._i64(hist), threads
        )
        return hist

    def pack2bit(self, codes: np.ndarray, n_threads: int | None = None) -> tuple[np.ndarray, np.ndarray] | None:
        """2-bit pack + invalid bitmask (codes.size must be a multiple of 8);
        None if the loaded .so predates this entry point."""
        if self._pack2bit is None:
            return None
        codes = np.ascontiguousarray(codes, dtype=np.uint8)
        packed = np.empty(codes.size // 4, dtype=np.uint8)
        invbits = np.empty(codes.size // 8, dtype=np.uint8)
        threads = n_threads or min(16, os.cpu_count() or 1)
        self._pack2bit(self._u8(codes), codes.size, self._u8(packed), self._u8(invbits), threads)
        return packed, invbits

    def window_codes(self, codes: np.ndarray, k: int, trash: int) -> np.ndarray | None:
        """Canonical window codes (int64, len n-k+1; invalid windows = trash);
        None if the .so predates this entry point or k is out of the C++
        kernel's [1, 31] range (the C side no-ops without filling out)."""
        if self._window_codes is None or not 1 <= k <= 31:
            return None
        codes = np.ascontiguousarray(codes, dtype=np.uint8)
        out = np.empty(max(0, codes.size - k + 1), dtype=np.int64)
        if out.size:
            self._window_codes(self._u8(codes), codes.size, k, trash, self._i64(out))
        return out

    def parse_doubles(self, text: bytes, expect: int | None = None) -> np.ndarray | None:
        """Parse a ',' / tab / space separated float run; None if unavailable
        or malformed (caller falls back to the Python parser)."""
        if self._parse_doubles is None:
            return None
        cap = expect if expect is not None else max(8, len(text) // 2 + 2)
        out = np.empty(cap, dtype=np.float64)
        n = self._parse_doubles(
            text, len(text), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap
        )
        if n < 0 or (expect is not None and n != expect):
            return None
        return out[:n]

    def parse_table(self, data: bytes) -> tuple[list[str], np.ndarray] | None:
        """Parse a whole name-prefixed numeric table (.kf rows / .di_mtrx
        body) -> (names, (rows, cols) float64). None if unavailable or the
        input is malformed / ragged (caller falls back to Python parsing)."""
        if self._parse_table is None:
            return None
        n = len(data)
        max_rows = data.count(b"\n") + 2
        vals = np.empty(max(8, n // 2 + 2), dtype=np.float64)
        spans = np.empty(2 * max_rows, dtype=np.int64)
        cols = np.zeros(1, dtype=np.int64)
        rows = self._parse_table(
            data, n, vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), vals.size,
            self._i64(spans), max_rows, self._i64(cols),
        )
        if rows < 0:
            return None
        c = int(cols[0])
        names = [data[spans[2 * i] : spans[2 * i + 1]].decode() for i in range(rows)]
        return names, vals[: rows * c].reshape(rows, c).copy()

    def format_doubles(self, vals: np.ndarray, sep: str = ",") -> str | None:
        """py-repr renderings of a float64 vector joined by sep + '\\n';
        None if the .so predates this entry point."""
        if self._format_doubles is None:
            return None
        vals = np.ascontiguousarray(vals, dtype=np.float64)
        out = np.empty(max(1, vals.size * 26), dtype=np.uint8)
        n = self._format_doubles(
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), vals.size,
            self._u8(out), sep.encode()[0],
        )
        return out[:n].tobytes().decode("ascii")

    def format_floats(self, vals: np.ndarray, sep: str = "\t") -> str | None:
        """str(np.float32) renderings of a float32 vector joined by sep + '\\n'."""
        if self._format_floats is None:
            return None
        vals = np.ascontiguousarray(vals, dtype=np.float32)
        # worst case: "-9999999986991104.0" (E=15 fixed) + sep = 21 bytes
        out = np.empty(max(1, vals.size * 22), dtype=np.uint8)
        n = self._format_floats(
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), vals.size,
            self._u8(out), sep.encode()[0],
        )
        return out[:n].tobytes().decode("ascii")

    def format_counts(self, vals: np.ndarray) -> str | None:
        """Render an int64 vector as 'v.0,v.0,...,v.0\\n' (reference .kf row
        tail for integral counts); None if the .so predates this entry."""
        if self._format_counts is None:
            return None
        vals = np.ascontiguousarray(vals, dtype=np.int64)
        # worst case: "-9223372036854775808.0" + separator = 24 bytes
        out = np.empty(max(1, vals.size * 24), dtype=np.uint8)
        n = self._format_counts(self._i64(vals), vals.size, self._u8(out))
        return out[:n].tobytes().decode("ascii")

    def parse_fasta_encoded(self, data: bytes) -> tuple[np.ndarray, np.ndarray]:
        """-> (encoded concat codes, record offsets len nrec+1)."""
        src = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(src.size, dtype=np.uint8)
        out_len = np.zeros(1, dtype=np.int64)
        max_rec = max(1024, data.count(b">") + 1)
        offs = np.zeros(max_rec + 1, dtype=np.int64)
        nrec = self._c.kf2vec_parse_fasta(
            self._u8(src), src.size, self._u8(out), self._i64(out_len),
            self._i64(offs), max_rec,
        )
        if nrec < 0:
            raise RuntimeError("record capacity exceeded")
        return out[: out_len[0]], offs[: nrec + 1]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libkf2vec_io.so"],
            cwd=_HERE,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def try_load() -> NativeIO | None:
    """load() that never raises — the shared guard for every optional-native
    call site (KF2VEC_NO_NATIVE handling lives inside load())."""
    try:
        return load()
    except Exception:
        return None


def load() -> NativeIO | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if os.environ.get("KF2VEC_NO_NATIVE"):  # honored at call time, not cached
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # always invoke make: it is a no-op when the .so is current, rebuilds
        # when fastio.cpp changed, and builds from scratch when missing (the
        # binary is never shipped — it is -march=native, so a foreign
        # prebuilt .so could SIGILL)
        if not _build() and not os.path.exists(_SO):
            return None
        try:
            _lib = NativeIO(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
        return _lib
