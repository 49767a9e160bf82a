import os

import numpy as np
import pytest

from kf2vecfsw_tpu.kmer.vocab import (
    FSW_BASE_MAP,
    canonical_vocab_codes,
    canonical_vocab_size,
    codes_to_digit_matrix,
    codes_to_strings,
    low_complexity_mask,
    revcomp_codes,
)

from .conftest import REFERENCE, requires_reference

REF_VOCABS = {
    3: "vocab_generator_k3C_fin.fa",
    4: "vocab_generator_k4C_fin.fa",
    5: "vocab_generator_k5C_fin.fa",
    6: "test_kmers_6_sorted",
    7: "test_kmers_7_sorted",
    8: "vocab_generator_k8C_fin.fa",
    9: "vocab_generator_k9C_fin.fa",
}


def test_vocab_sizes():
    # 4^k/2 (+ palindromes for even k): SURVEY.md component #4
    assert [canonical_vocab_size(k) for k in range(3, 10)] == [
        32, 136, 512, 2080, 8192, 32896, 131072,
    ]
    for k in range(2, 10):
        assert len(canonical_vocab_codes(k)) == canonical_vocab_size(k)


def test_revcomp_involution():
    for k in (3, 7):
        codes = np.arange(4**k)
        rc = revcomp_codes(codes, k)
        assert np.array_equal(revcomp_codes(rc, k), codes)


@requires_reference
@pytest.mark.parametrize("k", sorted(REF_VOCABS))
def test_vocab_matches_reference_files(k):
    path = os.path.join(REFERENCE, "kf2vec", "data", REF_VOCABS[k])
    ref = open(path).read().split()
    ours = codes_to_strings(canonical_vocab_codes(k), k)
    assert ours == ref


def test_fsw_digit_matrix():
    # k-mer "ACGT" -> reference map A=0,T=1,C=2,G=3 (main.py:118)
    code = np.array([0b00_01_10_11])  # A C G T
    mat = codes_to_digit_matrix(code, 4, FSW_BASE_MAP)
    assert mat.tolist() == [[0, 2, 3, 1]]


def test_low_complexity_mask():
    mask = low_complexity_mask(3)
    strs = codes_to_strings(canonical_vocab_codes(3), 3)
    for s, keep in zip(strs, mask):
        assert keep == (len(set(s)) > 2)
