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
