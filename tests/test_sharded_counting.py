"""Sharded counting over the virtual 8-device mesh vs the numpy counter."""

import numpy as np

from kf2vecfsw_tpu.io.fasta import encode_bases
from kf2vecfsw_tpu.kmer.counter import count_canonical_numpy
from kf2vecfsw_tpu.parallel.counting import count_canonical_sharded
from kf2vecfsw_tpu.parallel.mesh import make_mesh


def test_sharded_counting_matches_numpy():
    rng = np.random.default_rng(0)
    seq = rng.choice(list(b"ACGTN"), size=300_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
    codes = encode_bases(seq.tobytes())
    ref = count_canonical_numpy(codes, 7)
    for n_data in (1, 4, 8):
        mesh = make_mesh(n_data, 1)
        got = count_canonical_sharded(codes, 7, mesh)
        assert np.array_equal(got, ref), n_data


def test_sharded_counting_short_input():
    codes = encode_bases(b"ACGTACGTAC")
    mesh = make_mesh(8, 1)
    got = count_canonical_sharded(codes, 5, mesh)
    assert np.array_equal(got, count_canonical_numpy(codes, 5))
