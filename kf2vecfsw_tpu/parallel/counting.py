"""Multi-chip sharded canonical k-mer counting.

The reference handles long genomes upstream of the model (SURVEY.md §2.3
"sequence parallelism"): the TPU-native analogue is sharding the *counting*
of one (or many) long sequences across chips — each device histograms its
slice of the base stream and the small 4^k histogram is psum'd over ICI
(SURVEY.md §5 "Distributed communication backend").

The base stream is split into per-device segments overlapped by k-1 bases
(so no window is lost or double-counted), 2-bit packed on the host, and
processed under shard_map: unpack + windowing in fused XLA, histogram via
the Pallas MXU kernel (TPU) or scatter-add (CPU fallback), then
lax.psum over the 'data' axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..io.fasta import INVALID
from ..kernels.histogram import (
    CODE_COLS,
    TILE_T,
    _h_tiling,
    histogram_pallas,
    pack_2bit,
    unpack_2bit_xla,
    window_codes_xla,
)
from ..train.step import shard_map
from .mesh import DATA_AXIS


def _segment(codes_u8: np.ndarray, n_seg: int, k: int) -> np.ndarray:
    """(n_seg, L) uint8 segments with k-1 overlap, padded with INVALID;
    L is a multiple of 8 for 2-bit packing."""
    n = codes_u8.size
    seg = -(-n // n_seg)
    seg_len = -(-(seg + k - 1) // 8) * 8
    out = np.full((n_seg, seg_len), INVALID, dtype=np.uint8)
    for i in range(n_seg):
        lo = i * seg
        hi = min(n, lo + seg + k - 1)
        if lo < n:
            out[i, : hi - lo] = codes_u8[lo:hi]
    return out


def count_canonical_sharded(codes_u8: np.ndarray, k: int, mesh) -> np.ndarray:
    """Dense 4^k canonical histogram, counting sharded over mesh['data']."""
    n_data = mesh.shape[DATA_AXIS]
    segments = _segment(np.asarray(codes_u8, dtype=np.uint8), n_data, k)
    packed_rows, inv_rows = [], []
    for row in segments:
        p, iv, _ = pack_2bit(row)
        packed_rows.append(p)
        inv_rows.append(iv)
    packed = np.stack(packed_rows)
    inv = np.stack(inv_rows)

    use_pallas = jax.default_backend() == "tpu"
    h_tile, n_h = _h_tiling(k)
    trash = n_h * h_tile * 128
    nbins = 4**k

    def per_device(packed_local, inv_local):
        bases = unpack_2bit_xla(packed_local[0], inv_local[0])
        codes = window_codes_xla(bases, k, trash if use_pallas else nbins)
        if use_pallas:
            n = codes.shape[0]
            n_pad = -(-n // TILE_T) * TILE_T
            codes = jnp.pad(codes, (0, n_pad - n), constant_values=trash)
            # the Pallas kernel accumulates per-call in f32 (exact only below
            # 2^24 per bin): histogram bounded sub-segments and accumulate in
            # int32, mirroring kernels/histogram.py's MAX_WINDOWS_PER_CALL
            tiles = codes.reshape(-1, CODE_COLS)
            rows_per_call = max(1, (1 << 23) // TILE_T) * (TILE_T // CODE_COLS)
            hist_i = jnp.zeros((nbins,), jnp.int32)
            for lo in range(0, tiles.shape[0], rows_per_call):
                part = histogram_pallas(tiles[lo : lo + rows_per_call], k)
                hist_i = hist_i + part.reshape(-1)[:nbins].astype(jnp.int32)
        else:
            hist_i = jnp.zeros((nbins + 1,), jnp.int32).at[codes].add(1)[:-1]
        # psum in int32: exact for totals up to 2^31 (f32 would round above
        # 2^24 — reachable for low-complexity repeats on large genomes)
        return jax.lax.psum(hist_i, DATA_AXIS)[None]

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )
    # multi-process-safe staging: each process contributes only its segment
    # rows (a raw device_put under the global sharding would throw)
    from jax.sharding import NamedSharding

    from .mesh import process_row_slice, put_global_rows

    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        sl = process_row_slice(n_data, mesh)
        packed_dev = put_global_rows(packed[sl], n_data, sh)
        inv_dev = put_global_rows(inv[sl], n_data, sh)
    else:
        packed_dev = jax.device_put(packed)
        inv_dev = jax.device_put(inv)
    out = jax.jit(fn)(packed_dev, inv_dev)
    # every row is the same psum'd histogram; take the first
    return np.asarray(out[0]).astype(np.int64)
