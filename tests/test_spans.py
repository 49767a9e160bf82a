"""Unit tests for the multi-epoch span decomposition and bucketing helpers."""

import numpy as np

from kf2vecfsw_tpu.train.step import SPAN_SIZES, bucket_items, split_spans


def test_split_spans_covers_range_exactly():
    for start, end, boundaries in [
        (0, 2000, []),
        (0, 8000, list(range(500, 8000, 500))),
        (3, 17, [5, 11]),
        (0, 1, []),
        (5, 5, []),
        (0, 513, [512]),
    ]:
        pieces = split_spans(start, end, boundaries)
        pos = start
        for e0, span in pieces:
            assert e0 == pos
            assert span in SPAN_SIZES
            pos += span
            # never cross a boundary
            for b in boundaries:
                assert not (e0 < b < e0 + span), (e0, span, b)
        assert pos == end


def test_split_spans_boundary_epochs_end_pieces():
    # autosave at 500: some piece must END exactly at 500
    pieces = split_spans(0, 1000, [500])
    ends = {e0 + s for e0, s in pieces}
    assert 500 in ends and 1000 in ends


def test_bucket_items_monotone_and_bounded():
    prev = 0
    for n in range(1, 5000, 7):
        b = bucket_items(n)
        assert b >= n
        assert b % 8 == 0 or b == 8
        # waste bounded by the geometric ratio (plus rounding to 8)
        assert b <= max(8, int(n * 1.25) + 8), (n, b)
        assert b >= prev or n < prev  # monotone in n
    # identical inputs map to identical buckets (program reuse)
    assert bucket_items(850) == bucket_items(850)


def test_bucket_ladder_is_small():
    ladder = sorted({bucket_items(n) for n in range(1, 20000)})
    # bounded executable count for any realistic library build
    assert len(ladder) < 40, ladder
