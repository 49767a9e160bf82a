"""Native C++ ingest library vs the numpy ground truth."""

import numpy as np
import pytest

from kf2vecfsw_tpu.io.fasta import encode_bases
from kf2vecfsw_tpu.io.native import lib as native_lib
from kf2vecfsw_tpu.kmer.counter import count_canonical_numpy


@pytest.fixture(scope="module")
def native():
    lib = native_lib.load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_native_encode(native):
    seq = b"ACGTacgtNnX-"
    assert np.array_equal(native.encode(seq), encode_bases(seq))


@pytest.mark.parametrize("k", [3, 7, 9])
def test_native_count_matches_numpy(native, k):
    rng = np.random.default_rng(0)
    seq = rng.choice(list(b"ACGTN"), size=200_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
    codes = encode_bases(seq.tobytes())
    ref = count_canonical_numpy(codes, k)
    for threads in (1, 4):
        got = native.count_canonical(codes, k, n_threads=threads)
        assert np.array_equal(got, ref)


def test_native_parse_fasta(native):
    data = b">r1 desc\nACGT\nACGT\n>r2\nNNTT\n"
    codes, offs = native.parse_fasta_encoded(data)
    assert offs.tolist() == [0, 8, 12]
    assert np.array_equal(codes[:8], encode_bases(b"ACGTACGT"))
    assert np.array_equal(codes[8:], encode_bases(b"NNTT"))


def test_native_count_invalid_boundaries(native):
    # invalid bases must reset the rolling window, incl. across thread splits
    codes = encode_bases(b"ACGTNACGTACGNNACG" * 5000)
    ref = count_canonical_numpy(codes, 5)
    got = native.count_canonical(codes, 5, n_threads=8)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("k", [3, 7, 11])
def test_native_count_le_fold_edge_cases(native, k):
    # the LE+fold fast path has 8-base group boundaries: exercise inputs
    # whose length/invalid placement hits every group-alignment case
    rng = np.random.default_rng(1)
    for n in (k, k + 1, k + 7, k + 8, 63, 64, 65, 1000):
        for p_n in (0.0, 0.3):
            seq = rng.choice(list(b"ACGTN"), size=n, p=[(1 - p_n) / 4] * 4 + [p_n]).astype(np.uint8)
            codes = encode_bases(seq.tobytes())
            assert np.array_equal(
                native.count_canonical(codes, k), count_canonical_numpy(codes, k)
            ), f"k={k} n={n} p_n={p_n}"


@pytest.mark.parametrize("k", [1, 2, 5, 7, 11, 31])
def test_native_window_codes_matches_numpy(native, k):
    rng = np.random.default_rng(3)
    for n in (k, k + 1, 1000, 20_000):
        seq = rng.choice(list(b"ACGTN"), size=n, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
        codes = encode_bases(seq.tobytes())
        got = native.window_codes(codes, k, 4**k if k <= 13 else 2**62)
        if got is None:
            pytest.skip("window_codes missing from loaded .so")
        from kf2vecfsw_tpu.kmer.counter import window_codes_numpy

        canon, valid = window_codes_numpy(codes, k)
        ref = np.where(valid, canon, 4**k if k <= 13 else 2**62)
        assert np.array_equal(got, ref), f"k={k} n={n}"


def test_native_window_codes_rejects_out_of_range_k(native):
    # the C++ kernel no-ops for k outside [1,31]; the wrapper must return
    # None rather than an uninitialized buffer
    codes = np.zeros(100, dtype=np.uint8)
    assert native.window_codes(codes, 0, 1) is None
    assert native.window_codes(codes, 40, 1) is None


def test_native_format_doubles_matches_repr(native):
    rng = np.random.default_rng(5)
    vals = np.concatenate(
        [rng.random(20_000) * s * sign for s in (1e-300, 1e-5, 1e-4, 1.0, 1e15, 1e16, 1e300) for sign in (1, -1)]
        + [np.array([0.0, -0.0, 1.0, 1e16, 1e-4, 9.999999999999999e-5, 5e-324, 9999999999999998.0])]
    )
    line = native.format_doubles(vals, sep=",")
    if line is None:
        pytest.skip("format_doubles missing from loaded .so")
    got = line[:-1].split(",")
    assert line.endswith("\n")
    for v, g in zip(vals.tolist(), got):
        assert repr(v) == g, (repr(v), g)


def test_native_format_floats_matches_numpy_str(native):
    rng = np.random.default_rng(6)
    vals = np.concatenate(
        [(rng.random(20_000) * s * sign).astype(np.float32) for s in (1e-38, 1e-4, 1.0, 1e15, 1e16, 1e38) for sign in (1, -1)]
        + [np.array([0.0, -0.0, 1e-4, 1.4e-45, 3.4028235e38, 9.9999996e15, 1.00000003e16], dtype=np.float32)]
    ).astype(np.float32)
    line = native.format_floats(vals, sep="\t")
    if line is None:
        pytest.skip("format_floats missing from loaded .so")
    got = line[:-1].split("\t")
    for v, g in zip(vals, got):
        assert str(v) == g, (str(v), g)


def test_native_format_specials(native):
    # nan/inf must render like Python repr, not parser garbage; extreme
    # int64 counts must not overflow the wrapper's buffer
    vals = np.array([np.nan, np.inf, -np.inf, 1.5, -0.0])
    line = native.format_doubles(vals)
    if line is None:
        pytest.skip("format_doubles missing")
    assert line == "nan,inf,-inf,1.5,-0.0\n"
    assert native.format_floats(vals.astype(np.float32)) == "nan\tinf\t-inf\t1.5\t-0.0\n"
    big = native.format_counts(np.full(64, -(10**18), dtype=np.int64))
    assert big.startswith("-1000000000000000000.0,")


def test_native_pack2bit_matches_numpy(native):
    rng = np.random.default_rng(2)
    for n in (8, 64, 4096, 1 << 17):
        codes = rng.integers(0, 5, n, dtype=np.uint8)
        res = native.pack2bit(codes)
        if res is None:
            pytest.skip("pack2bit missing from loaded .so")
        packed, invbits = res
        b = (codes & 3).reshape(-1, 4)
        ref_packed = (b[:, 0] | (b[:, 1] << 2) | (b[:, 2] << 4) | (b[:, 3] << 6)).astype(np.uint8)
        ref_inv = np.packbits(codes == 4, bitorder="little")
        assert np.array_equal(packed, ref_packed)
        assert np.array_equal(invbits, ref_inv)


@pytest.mark.parametrize("k", [12, 13])
def test_native_partitioned_count_matches_numpy(native, k):
    """k >= 12 routes to the radix-partitioned counter (multithreaded, cache-
    resident sub-histograms) instead of the old single-threaded fallback."""
    rng = np.random.default_rng(2)
    seq = rng.choice(list(b"ACGTN"), size=150_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
    codes = encode_bases(seq.tobytes())
    ref = count_canonical_numpy(codes, k)
    for threads in (1, 4):
        got = native.count_canonical(codes, k, n_threads=threads)
        assert np.array_equal(got, ref)


def test_native_parse_fasta_gt_in_header(native):
    """A '>' inside a header's description is text, not a record start
    (matches _parse_fasta, which scans for '>' only after the header's
    newline). Previously the native parser emitted a phantom empty record."""
    data = b">r1 cut>site desc\nACGT\nGGCC\n>r2\nTTAA\n"
    codes, offs = native.parse_fasta_encoded(data)
    assert offs.tolist() == [0, 8, 12]
    assert np.array_equal(codes[:8], encode_bases(b"ACGTGGCC"))
    assert np.array_equal(codes[8:], encode_bases(b"TTAA"))


def test_native_format_counts_int64_min(native):
    """-2^63 negation must go through uint64 (signed negation is UB)."""
    out = native.format_counts(np.array([np.iinfo(np.int64).min, 7], dtype=np.int64))
    assert out == "-9223372036854775808.0,7.0\n"


def test_native_parse_fasta_fuzz_matches_python(native):
    """Randomized dirty FASTA (CRLF, lowercase, blank lines, '>' in headers
    and sequences, trailing garbage, no final newline): the native parser's
    record count + encoded bytes must agree with the pure-Python fallback."""
    from kf2vecfsw_tpu.io.fasta import _parse_fasta

    rng = np.random.default_rng(12)
    pieces = [
        b">a desc\n", b">b x>y\r\n", b"ACGTacgt\n", b"NNN->..\r\n", b"\n",
        b"ggTT>cc\n", b"A" * 37 + b"\n", b">c\n", b"tTnN\n",
    ]
    for trial in range(50):
        n = int(rng.integers(2, 12))
        parts = [b">first\n"] + [pieces[int(rng.integers(len(pieces)))] for _ in range(n)]
        data = b"".join(parts)
        if trial % 3 == 0:
            data = data.rstrip(b"\n")
        py = _parse_fasta(data)
        codes, offs = native.parse_fasta_encoded(data)
        assert len(py) == len(offs) - 1, (trial, data)
        for i, (_, seq) in enumerate(py):
            got = codes[offs[i] : offs[i + 1]]
            assert np.array_equal(got, encode_bases(seq)), (trial, i, data)
