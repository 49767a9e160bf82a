"""Pallas batched bitonic sort kernel (kernels/sort.py), interpret mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from kf2vecfsw_tpu.kernels.sort import sort_rows


@pytest.mark.parametrize("r,n", [(8, 128), (16, 1024), (4, 8192)])
def test_bitonic_sort_rows_matches_numpy(r, n):
    rng = np.random.default_rng(0)
    keys = rng.normal(size=(r, n)).astype(np.float32)
    idx = np.broadcast_to(np.arange(n, dtype=np.int32), (r, n)).copy()
    ks, ix = sort_rows(
        (jnp.asarray(keys), jnp.asarray(idx)), block_rows=min(r, 32), interpret=True
    )
    ks, ix = np.asarray(ks), np.asarray(ix)
    assert np.array_equal(ks, np.sort(keys, axis=1))
    # payload must be a permutation consistent with the sorted keys (ties
    # may permute differently than a stable sort — measure-zero for floats)
    for row in range(r):
        assert sorted(ix[row]) == list(range(n))
        assert np.array_equal(keys[row][ix[row]], ks[row])


def test_bitonic_sort_three_operands():
    rng = np.random.default_rng(1)
    r, n = 8, 512
    keys = rng.normal(size=(r, n)).astype(np.float32)
    w = rng.random((r, n)).astype(np.float32)
    idx = np.broadcast_to(np.arange(n, dtype=np.int32), (r, n)).copy()
    ks, ws, ix = sort_rows(
        (jnp.asarray(keys), jnp.asarray(w), jnp.asarray(idx)),
        block_rows=8,
        interpret=True,
    )
    order = np.argsort(keys, axis=1, kind="stable")
    assert np.array_equal(np.asarray(ks), np.take_along_axis(keys, order, 1))
    assert np.allclose(np.asarray(ws), np.take_along_axis(w, order, 1))
