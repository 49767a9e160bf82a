"""Pallas TPU kernel: batched minor-axis bitonic sort (EXPERIMENT — not on
the shipped path).

The FSW embedding's hot op is sorting (B*d_out, N) rows of f32 projections
(with payload rows riding along). This kernel is a VMEM-resident bitonic
network: every compare-exchange stage is two lane-rotations plus selects
over the whole block, no scalar code. Measured head-to-head on one v5e at
(8192, 8192) f32 2-operand in a clean (unthrottled) window:

    XLA lax.sort, rank-3 batched (16, 512, 8192):  90 ms
    this kernel (fori_loop stages, traced rolls):  168 ms

The dynamic-shift pltpu.roll dominates (a statically-unrolled 91-stage body
would specialize the shifts, but overwhelms this rig's remote Mosaic
compiler at N=8192). Kept as a tested, documented experiment; the FSW path
stays on the (already minor-axis, multi-operand) XLA sort. NOTE: XLA's sort
on the equivalent RANK-2 (8192, 8192) shape is pathologically slow (~6-9 s)
— models must keep the batch dims unflattened.

Row length N must be a power of two (the FSW point-set bucket already is).

Compare-exchange at distance d (a power of two) via the roll trick:
    partner(i) = i ^ d  ->  roll(x, -d) where (i & d) == 0 else roll(x, +d)
    ascending run iff (i & size) == 0
The k(k+1)/2 stages (91 for N=8192) run as a lax.fori_loop over a single
vectorized stage body (an unrolled body at N=8192 overwhelms the Mosaic
compiler); d and size are traced powers of two read from an SMEM table.

Ties keep their pre-stage element (non-strict comparisons): the sort is
NOT stable across equal keys, matching jax.lax.sort's unspecified payload
order under num_keys=1 closely enough for the FSW use (equal projections
are a measure-zero event that also permutes fwd/bwd consistently).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stage_tables(n: int) -> np.ndarray:
    """(n_stages, 2) int32 [d, size] for the bitonic network on rows of n."""
    rows = []
    size = 2
    while size <= n:
        d = size // 2
        while d >= 1:
            rows.append((d, size))
            d //= 2
        size *= 2
    return np.asarray(rows, dtype=np.int32)


def _bitonic_kernel(n: int, n_ops: int, n_stages: int):
    def kernel(*refs):
        tab_ref = refs[0]
        ins = refs[1 : 1 + n_ops]
        outs = refs[1 + n_ops :]
        rows = tuple(r[...] for r in ins)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def stage(t, rows):
            d = tab_ref[t, 0]
            size = tab_ref[t, 1]
            lo_half = (lane & d) == 0
            keep_small = lo_half == ((lane & size) == 0)
            key = rows[0]
            nd = jnp.int32(n) - d
            up = pltpu.roll(key, nd, 1)    # partner for the lo half (i + d)
            down = pltpu.roll(key, d, 1)   # partner for the hi half (i - d)
            partner_key = jnp.where(lo_half, up, down)
            take = (keep_small & (partner_key < key)) | (
                (~keep_small) & (partner_key > key)
            )
            out = []
            for r in rows:
                partner = jnp.where(lo_half, pltpu.roll(r, nd, 1), pltpu.roll(r, d, 1))
                out.append(jnp.where(take, partner, r))
            return tuple(out)

        rows = jax.lax.fori_loop(0, n_stages, stage, rows)
        for o, r in zip(outs, rows):
            o[...] = r

    return kernel


def sort_rows(operands, block_rows: int = 32, interpret: bool = False):
    """Sort each row of operands[0] ascending, applying the same permutation
    to the payload operands. All operands are (R, N) with N a power of two
    and R a multiple of block_rows (pad externally). Returns the sorted
    tuple."""
    key = operands[0]
    r, n = key.shape
    assert n & (n - 1) == 0, f"row length {n} must be a power of two"
    n_ops = len(operands)
    block_rows = min(block_rows, r)
    assert r % block_rows == 0, (r, block_rows)
    table = _stage_tables(n)
    n_stages = table.shape[0]
    kernel = _bitonic_kernel(n, n_ops, n_stages)
    out_shapes = tuple(jax.ShapeDtypeStruct((r, n), o.dtype) for o in operands)
    data_spec = [
        pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(n_ops)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((n_stages, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
        ] + data_spec,
        out_specs=tuple(data_spec),
        interpret=interpret,
    )(jnp.asarray(table), *operands)
