"""Fourier Sliced-Wasserstein (FSW) embedding and distance model, in JAX.

TPU-native reimplementation of the reference's NeuralNetFSW
(models.py:51-68), which consumes the (N, k+1) k-mer matrices from
get_kmers: a learnable (4, base_dim) base lookup maps each k-mer to a point
in R^{k*base_dim}; the weighted point multiset (points, frequencies) is
embedded by an FSW layer; a 2-layer MLP maps the embedding to the output.

The external ``fswlib`` is not vendored by the reference, so the FSW layer is
implemented here from the Fourier Sliced-Wasserstein definition with the
constructor semantics used at models.py:58 (d_in = k*base_dim, d_out,
frequency_init="even", minimize_slice_coherence=True):

For output m with learnable slice direction v_m and frequency xi_m, project
the points p_j = <v_m, x_j>, sort them, and take the cosine-series
coefficient of the quantile function Q_m of the weighted 1-D distribution:

    E_m = integral_0^1 Q_m(t) * sqrt(2) cos(pi xi_m t) dt
        = sum_i p_(i) * sqrt(2) w_(i) cos(pi xi_m cbar_i) sinc(xi_m w_(i) / 2)

where cbar_i is the midpoint of the i-th cumulative-weight step. The sinc
form is smooth in xi (no special case at xi=0) and exactly insensitive to
zero-weight (padding) points — the padding contract relied on by the
reference's pad_collate (train_model_set.py:83-86).

Properties verified by tests: permutation invariance, zero-weight padding
insensitivity, weight normalization invariance, and distance sensitivity.

frequency_init="even": xi_m = m (an orthonormal cosine basis on [0,1]).
minimize_slice_coherence: slices initialized as stacked random orthonormal
blocks (QR of Gaussian), giving zero coherence within each block of d_in
directions — slices remain learnable parameters as in fswlib.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .mlp import _linear_init

_SQRT2 = float(np.sqrt(2.0))


@jax.custom_vjp
def _sort_pw(p, w):
    """Sort p along the minor axis carrying w (stable, keys=p).

    Gradient contract: d/dp only. The weight operand is DATA (normalized
    k-mer frequencies from the `.npy` inputs) in every caller — no parameter
    ever flows into it — so the backward pass drops the weight cotangent
    instead of carrying a second f32 operand through the inverse-sort. This
    makes the backward a 2-operand int32-keyed sort (the minimal permutation
    inversion) rather than round 2's 3-operand one. Do not reuse this
    primitive somewhere weights need gradients.

    Keys are sorted as int32 via the monotone bijection _f2i_keys (the same
    trick the lazy refresh uses): integer comparators skip the f32 sort's
    NaN/-0.0 totality logic — measured ~20% faster at (512, 8192) — and the
    result is bit-identical on the NaN-free projections this receives."""
    ks, w = jax.lax.sort((_f2i_keys(p), w), dimension=-1, is_stable=False, num_keys=1)
    return _i2f_keys(ks), w


def _sort_pw_fwd(p, w):
    # is_stable=False: measured ~20-30% faster on TPU than the stable sort
    # at (16,512,8192). Safe here — ties between f32 projections are
    # measure-zero, and perm/ws/ps come from the SAME sort call so they are
    # mutually consistent whatever tie order the network picked.
    iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
    ks, ws, perm = jax.lax.sort(
        (_f2i_keys(p), w, iota), dimension=-1, is_stable=False, num_keys=1
    )
    return (_i2f_keys(ks), ws), perm


def _sort_pw_bwd(perm, cts):
    # transpose of a permutation = unsort: sorting (perm, d_ps) by the
    # unique integer keys restores original positions in ONE extra sort —
    # 6x faster than XLA's autodiff scatter for the sort primitive; the
    # weight cotangent is dropped (see _sort_pw docstring), saving a third
    # sorted operand, and the keys are all-distinct so the unstable sort
    # (measured 64 vs 80 ms) is exact
    d_ps, d_ws = cts
    _, d_p = jax.lax.sort((perm, d_ps), dimension=-1, is_stable=False, num_keys=1)
    return d_p, jnp.zeros_like(d_ws)


_sort_pw.defvjp(_sort_pw_fwd, _sort_pw_bwd)


@jax.custom_vjp
def _sort_shared(p, wb):
    """Sort SHARED projections once, carrying every genome's weights.

    p: (C, V) — projections of the shared (canonical-vocab) point set,
    identical for every genome in the batch; wb: (B, V) — per-genome
    weights over the vocab (DATA: no gradient, see _sort_pw's contract).
    Returns (ps (C, V), wsb (B, C, V)) where wsb[b] is wb[b] permuted by
    p's per-row sort order.

    This is the whole point of the shared-vocab FSW path: ONE
    (B+1)-operand sort whose comparison cost is paid once on the keys
    (the B weight operands just ride the permutation) replaces B
    independent 2-operand sorts — measured 39 ms vs 91 ms at
    (B=16, C=512, V=8192) on v5e — and because ps is shared, autodiff
    hands the backward a single batch-summed cotangent, so the backward
    is ONE 2-operand int32-keyed unsort instead of B of them.

    Keys run through the _f2i_keys int32 bijection (see _sort_pw): the
    comparison cost is the one part of this sort paid per element rather
    than per riding operand, so integer comparators help most exactly here."""
    ops = (_f2i_keys(p),) + tuple(
        jnp.broadcast_to(wb[b][None, :], p.shape) for b in range(wb.shape[0])
    )
    res = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=1)
    return _i2f_keys(res[0]), jnp.stack(res[1:])


def _sort_shared_fwd(p, wb):
    iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
    ops = (
        (_f2i_keys(p),)
        + tuple(jnp.broadcast_to(wb[b][None, :], p.shape) for b in range(wb.shape[0]))
        + (iota,)
    )
    res = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=1)
    return (_i2f_keys(res[0]), jnp.stack(res[1:-1])), (res[-1], wb)


def _sort_shared_bwd(residual, cts):
    perm, wb = residual
    d_ps, _d_wsb = cts  # weight cotangent dropped (data; see _sort_pw)
    # d_ps is ALREADY summed over the batch by autodiff (every genome reads
    # the same ps), so one 2-operand unsort restores original positions
    _, d_p = jax.lax.sort((perm, d_ps), dimension=-1, is_stable=False, num_keys=1)
    return d_p, jnp.zeros_like(wb)


_sort_shared.defvjp(_sort_shared_fwd, _sort_shared_bwd)


def init_fsw_params(key, d_in: int, d_out: int):
    """Slices (d_out, d_in) with blockwise-orthonormal init + even freqs."""
    keys = jax.random.split(key, -(-d_out // d_in) + 1)
    blocks = []
    remaining = d_out
    for i in range(-(-d_out // d_in)):
        g = jax.random.normal(keys[i], (d_in, d_in))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q[: min(remaining, d_in)])
        remaining -= d_in
    slices = jnp.concatenate(blocks, axis=0)[:d_out]
    freqs = jnp.arange(d_out, dtype=jnp.float32)
    return {"slices": slices.astype(jnp.float32), "freqs": freqs}


def fsw_embed(fsw_params, points, weights, slice_chunk: int = 0):
    """FSW embedding of one weighted point set.

    points: (N, d_in), weights: (N,) nonnegative (zeros = padding).
    Returns (d_out,). Memory is bounded by chunking over slices
    (the analogue of fswlib's max_parallel_slices, models.py:64);
    slice_chunk=0 means unchunked — ONE batched minor-axis sort over all
    d_out slices, which is ~4x faster than serializing chunks through
    lax.map (the round-1 default of 128 cost 143 ms/step at B=16, N=8192).
    Callers with large N x d_out products pass an explicit chunk
    (see fsw_dist_embed_apply's memory-budget heuristic).

    TPU layout: projections are (C, N) so the per-slice sort runs along the
    MINOR axis, and weights ride along as a second lax.sort operand instead
    of argsort + gathers (21x faster than the major-axis argsort form).
    """
    slices = fsw_params["slices"]
    freqs = fsw_params["freqs"]
    d_out = slices.shape[0]
    total = jnp.maximum(weights.sum(), 1e-30)
    wn = weights / total

    def chunk_fn(args):
        v, xi = args  # (C, d_in), (C,)
        p = v @ points.T  # (C, N)
        wb = jnp.broadcast_to(wn[None, :], p.shape)
        ps, ws = _sort_pw(p, wb)
        cs = _cumsum_minor_matmul(ws)
        cbar = cs - ws / 2.0
        delta = _SQRT2 * ws * jnp.cos(jnp.pi * xi[:, None] * cbar) * jnp.sinc(
            xi[:, None] * ws / 2.0
        )
        return jnp.sum(ps * delta, axis=-1)  # (C,)

    if slice_chunk <= 0 or d_out <= slice_chunk:
        return chunk_fn((slices, freqs))
    n_chunks = -(-d_out // slice_chunk)
    pad = n_chunks * slice_chunk - d_out
    sl = jnp.pad(slices, ((0, pad), (0, 0)))
    fr = jnp.pad(freqs, (0, pad))
    out = jax.lax.map(
        # remat per chunk: lax.map's backward otherwise stacks every chunk's
        # (N,)-sized sort/cumsum residuals at once, defeating the chunking's
        # memory bound exactly when it matters (k=9 giant sets)
        jax.checkpoint(chunk_fn),
        (sl.reshape(n_chunks, slice_chunk, -1), fr.reshape(n_chunks, slice_chunk)),
    )
    return out.reshape(-1)[:d_out]


def fsw_embed_shared(fsw_params, points, weights, slice_chunk: int = 0):
    """FSW embedding of B weighted point sets SHARING one point matrix.

    points: (V, d_in) — one shared point set (the canonical vocab under the
    lookup); weights: (B, V) nonnegative per-genome weights (zeros = absent
    k-mers). Returns (B, d_out).

    Exactly equal (up to float summation order) to vmapping `fsw_embed`
    over per-genome point sets: the sinc quantile form is insensitive to
    zero-weight points, so padding each genome's set out to the full vocab
    changes nothing — but it makes the projections (C, V) identical across
    the batch, collapsing B sorts into one (see _sort_shared).
    """
    slices = fsw_params["slices"]
    freqs = fsw_params["freqs"]
    d_out = slices.shape[0]
    total = jnp.maximum(weights.sum(axis=-1, keepdims=True), 1e-30)
    wn = weights / total  # (B, V)

    def chunk_fn(args):
        v, xi = args  # (C, d_in), (C,)
        p = v @ points.T  # (C, V), shared across the batch
        ps, wsb = _sort_shared(p, wn)  # (C, V), (B, C, V)
        cs = _cumsum_minor_matmul(wsb)
        cbar = cs - wsb / 2.0
        x = xi[None, :, None]
        delta = _SQRT2 * wsb * jnp.cos(jnp.pi * x * cbar) * jnp.sinc(x * wsb / 2.0)
        return jnp.sum(ps[None, :, :] * delta, axis=-1)  # (B, C)

    if slice_chunk <= 0 or d_out <= slice_chunk:
        return chunk_fn((slices, freqs))
    n_chunks = -(-d_out // slice_chunk)
    pad = n_chunks * slice_chunk - d_out
    sl = jnp.pad(slices, ((0, pad), (0, 0)))
    fr = jnp.pad(freqs, (0, pad))
    out = jax.lax.map(
        # remat per chunk (see fsw_embed): bounds the backward's residual
        # footprint to ONE chunk's (B, Cc, V) transients instead of all
        jax.checkpoint(chunk_fn),
        (sl.reshape(n_chunks, slice_chunk, -1), fr.reshape(n_chunks, slice_chunk)),
    )  # (n_chunks, B, Cc)
    return jnp.moveaxis(out, 1, 0).reshape(weights.shape[0], -1)[:, :d_out]


# -- lazy-permutation shared-vocab path ---------------------------------------
#
# The exact shared path pays one multi-operand sort + a cumsum + trig over
# (B, C, V) tensors EVERY step, yet everything the sort produces besides the
# permutation — sorted weights, their cumsum midpoints cbar, and hence the
# whole per-point coefficient
#
#     delta[i,c,v] = sqrt2 * w_(v) * cos(pi xi_c cbar_v) * sinc(xi_c w_(v)/2)
#
# depends only on DATA (per-genome weights) and the permutation. Freezing the
# permutation for R steps makes delta constant; scattered back to original
# vocab order (delta_orig) the embedding collapses to
#
#     E[i,c] = sum_v p[c,v] * delta_orig[i,c,v],    p = slices @ points.T.
#
# Rounds 3-4 materialized delta_orig as a resident (n, C, V) plane and ran
# that contraction every step. Round 5 collapses it further through the
# LOOKUP's linearity: every shared point is a concatenation of lookup rows,
# points[v] = concat_j lookup[digits[v, j]], so
#
#     p[c,v] = sum_j <v_c[j], lookup[digits[v,j]]>
#     E[i,c] = sum_j sum_a S[i,c,j,a] * <v_c[j], lookup[a]>,
#     S[i,c,j,a] = sum_{v : digits[v,j] = a} delta_orig[i,c,v]
#
# where v_c[j] is the j-th base_dim block of slice row c. S is (n, C, k, 4) —
# V-INDEPENDENT (8.6 GB -> 2.4 MB at the k=9 regime), computed at refresh by
# one MXU matmul of delta_orig against the one-hot digit-class matrix, and the
# per-step forward is two tiny einsums instead of an HBM-bound (B, C, V)
# contraction. At a refresh step the permutation is fresh, so E and its
# gradient wrt slices AND lookup equal the exact path's (whose custom VJP also
# treats the permutation as locally constant — the regrouped sums are
# algebraically identical); between refreshes the objective is the exact FSW
# of a slightly stale ordering. Learnable frequencies stay trainable through
# the first-order term (xi - stop_grad(xi)) * g2 with g2 precomputed by jvp at
# refresh: the forward value is untouched (the factor is exactly zero) while
# autodiff reads off the exact d E / d xi at the refresh point.
#
# Measured on v5e at (B=16, C=512, V=8192): exact span step 30.3 ms; round-4
# plane-based lazy step ~2.5 ms + amortized refresh (see bench.py fsw_lazy
# fields; the compact plane removes the step's plane traffic entirely).


def _f2i_keys(p):
    """Monotone bijection f32 -> int32 so the sort runs integer comparators
    (no NaN/-0.0 totality logic; measured ~20% faster at (512, 8192))."""
    i = jax.lax.bitcast_convert_type(p, jnp.int32)
    return jnp.where(i < 0, i ^ jnp.int32(0x7FFFFFFF), i)


def _i2f_keys(k):
    """Inverse of _f2i_keys."""
    i = jnp.where(k < 0, k ^ jnp.int32(0x7FFFFFFF), k)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _cumsum_minor_matmul(x, block: int = 256):
    """Cumulative sum along the minor axis as a blocked lower-triangular
    matmul: XLA's native cumsum is ~log2(V) full passes over the tensor
    (~55 GB of HBM traffic for a 2 GB operand at V=8192); one (block,block)
    triangular matmul per block rides the MXU in a single pass plus a tiny
    per-block offset scan. f32 operands with HIGHEST precision keep the
    accumulation in f32 (same precision class as the sequential cumsum)."""
    V = x.shape[-1]
    if V <= block:
        return jnp.cumsum(x, axis=-1)
    pad = (-V) % block
    if pad:  # zero tail padding leaves the first V prefix sums unchanged
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    nb = (V + pad) // block
    xb = x.reshape(x.shape[:-1] + (nb, block))
    tri = jnp.tril(jnp.ones((block, block), x.dtype))
    within = jax.lax.dot_general(
        xb, tri, (((xb.ndim - 1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (..., nb, block): within[..., k, i] = sum_{j<=i} xb[..., k, j]
    sums = xb.sum(-1)
    offsets = jnp.cumsum(sums, axis=-1) - sums  # exclusive block offsets
    out = (within + offsets[..., None]).reshape(x.shape)
    return out[..., :V] if pad else out


def fsw_lazy_refresh(fsw_params, points, digits, W, group: int = 8):
    """Precompute (S (n, C, k, 4), g2 (n, C)) for the lazy path.

    points: (V, d_in) shared vocab points under the current lookup;
    digits: (V, k) int base codes of the canonical vocab (points[v] =
    concat_j lookup[digits[v, j]]); W: (n, V) nonnegative per-item vocab
    weights (rows of zeros allowed — bucket padding items yield all-zero S
    and embed to 0).

    S carries the quantile coefficients SEGMENT-SUMMED over digit classes
    (see the module comment above): S[i, c, j, a] = sum over vocab entries
    whose j-th base is a of delta_orig[i, c, v] — V-independent, so the
    resident plane is (n, C, k, 4) f32 regardless of vocab size.
    g2[i, c] = sum_v ps[c, v] * (d delta / d xi_c)[i, c, v] is the
    frequencies' embedding gradient AT the refresh point, contracted in
    sorted order BEFORE the unsort (so the ddelta tensor is never
    materialized to HBM or unsorted). Between refreshes the freqs gradient
    therefore uses the refresh-point projections — the same first-order
    staleness class as S itself, and exact at a fresh permutation.

    Per group of up to `group` items (snapped to a divisor of n): one
    (1+G+1)-operand int-keyed sort of the shared projections carrying the G
    weight rows, the delta/ddelta elementwise block (ddelta via jvp wrt the
    frequencies; the cumsum inside uses the blocked-matmul form), one
    (1+G)-operand unsort keyed by the permutation, and one MXU matmul of
    delta_orig against the (V, 4k) one-hot digit matrix. The sort network's
    cost is payload-traffic-bound (~45 GB/s measured on v5e), so the
    refresh floor is ~64 MB of sort traffic per item at (C=512, V=8192) —
    amortize it with refresh intervals of tens to hundreds of steps. Runs
    entirely per-slice-row, so under a model-axis-sharded mesh each device
    refreshes only its local slice rows with no collectives; transients are
    (group, C_local, V)-sized and bounded by the group size (see
    train/fsw_lazy.py pick_refresh_group).
    """
    slices = fsw_params["slices"]
    freqs = fsw_params["freqs"]
    n, V = W.shape
    k = digits.shape[1]
    group = min(group, n)
    while n % group:  # largest divisor of n at most `group` (trace-time)
        group -= 1
    total = jnp.maximum(W.sum(axis=-1, keepdims=True), 1e-30)
    wn = W / total  # (n, V)
    p = slices @ points.T  # (C, V)
    keys = _f2i_keys(p)
    # one-hot digit-class matrix (V, k*4): delta_orig @ D segment-sums the
    # coefficients per (position, base) class on the MXU
    onehot = (digits[:, :, None] == jnp.arange(4, dtype=digits.dtype)).astype(
        jnp.float32
    ).reshape(V, k * 4)

    # D_perm fast path: the permutation is IDENTICAL across groups (the keys
    # don't depend on the weights), so pre-permute the digit matrix ONCE —
    # S[g,c,:] = sum_j delta_sorted[g,c,j] * D[perm[c,j],:] — and each
    # group's S becomes one MXU contraction of the SORTED delta against
    # D_perm. This drops the iota operand from every group sort AND the
    # whole (1+G)-operand unsort (~45% of the refresh's sort traffic,
    # measured: R=128 default-lazy 199 -> ~280 steps/s at the flagship
    # shape). Gated by D_perm's (C_local, V, 4k) f32 footprint — at k=9 it
    # would be ~10 GB, so giant vocabs keep the unsort path.
    dperm_bytes = int(p.shape[0]) * V * (k * 4) * 4
    use_dperm = dperm_bytes <= _dperm_budget_bytes()
    if use_dperm:
        iota0 = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
        _, perm = jax.lax.sort((keys, iota0), dimension=-1, is_stable=False, num_keys=1)
        d_perm = onehot[perm]  # (C, V, k*4)

    def group_fn(wg):  # (G, V) -> ((G, C, k, 4), (G, C))
        g = wg.shape[0]
        ops = (keys,) + tuple(
            jnp.broadcast_to(wg[i][None, :], p.shape) for i in range(g)
        )
        if not use_dperm:
            iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
            ops = ops + (iota,)
        res = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=1)
        ps = _i2f_keys(res[0])  # (C, V) sorted projections
        wsb = jnp.stack(res[1 : g + 1])  # (G, C, V) sorted weights

        def delta_of_xi(xi):
            cs = _cumsum_minor_matmul(wsb)
            cbar = cs - wsb / 2.0
            x = xi[None, :, None]
            return _SQRT2 * wsb * jnp.cos(jnp.pi * x * cbar) * jnp.sinc(x * wsb / 2.0)

        delta, gdelta = jax.jvp(delta_of_xi, (freqs,), (jnp.ones_like(freqs),))
        g2 = jnp.sum(ps[None] * gdelta, axis=-1)  # (G, C), sorted order
        # HIGHEST precision everywhere below — bf16 mantissas over up-to-V
        # cancelling terms would break the refresh_steps=1 == exact contract
        if use_dperm:
            # S from SORTED delta via the pre-permuted digit matrix (ties
            # between the shared perm and this sort are measure-zero on f32
            # projections — the same assumption _sort_pw documents)
            s = jnp.einsum(
                "gcj,cjm->gcm", delta, d_perm,
                precision=jax.lax.Precision.HIGHEST,
            )
            return s, g2
        perm_g = res[-1]
        # unsort delta to original vocab order: sort (perm, rows...) by the
        # unique int keys; operands ride the inverse permutation
        res2 = jax.lax.sort(
            (perm_g,) + tuple(delta[i] for i in range(g)),
            dimension=-1,
            is_stable=False,
            num_keys=1,
        )
        delta_orig = jnp.stack(res2[1:])  # (G, C, V), consumed immediately
        s = jax.lax.dot_general(
            delta_orig, onehot, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (G, C, k*4)
        return s, g2

    if n == group:
        s, g2 = group_fn(wn)
    else:
        s, g2 = jax.lax.map(group_fn, wn.reshape(n // group, group, V))
    C = slices.shape[0]
    return s.reshape(n, C, k, 4), g2.reshape(n, C)


def _dperm_budget_bytes() -> int:
    """Budget for the refresh's resident pre-permuted digit matrix: 1/8 of
    per-device HBM (~2 GiB on a 16 GiB v5e — admits k<=7 at C=512 local;
    sharding slice rows over the model axis admits larger k)."""
    from ..utils.membudget import hbm_fraction

    return hbm_fraction(1, 8)


def fsw_lazy_refresh_pergenome(fsw_params, lookup, X, group: int = 4):
    """Per-genome lazy refresh: (S (n, C, k, 4), g2 (n, C)) from padded
    point-set tensors X (n, N, k+1) — the non-shared-vocab regime (short
    contigs, sparse clades, k > 9) where every genome owns its point matrix.

    Freezes each genome's OWN sort order: per item, project its points
    (points_i = lookup[kmers_i], p_i = slices @ points_i.T), sort with the
    weights riding (one 3-operand (C, N) int-keyed sort — the per-genome
    analogue of the shared path's one (B+2)-operand sort), build
    delta/ddelta, unsort, and segment-sum against the item's own one-hot
    digit matrix. The compact S collapse (see the lazy-path comment above)
    holds per genome because points_i is still a concatenation of lookup
    rows — S[i,c,j,a] sums delta over the item's points whose j-th base is
    a. Zero-weight padding rows contribute exactly 0 to S and g2 (delta
    carries a ws factor); all-zero padding ITEMS yield S=0 rows that embed
    to the MLP bias, matching the exact path.

    The returned (S, g2) feed the SAME fsw_lazy_apply as the shared path.
    Gradient contract: outputs are refresh-point data (stop_grad at the
    caller), exactly as fsw_lazy_refresh.
    """
    slices = fsw_params["slices"]
    freqs = fsw_params["freqs"]
    n, N, kp1 = X.shape
    k = kp1 - 1
    group = min(group, n)
    while n % group:  # largest divisor of n at most `group` (trace-time)
        group -= 1
    kmers = X[..., :k].astype(jnp.int32)  # (n, N, k)
    w = X[..., -1]
    total = jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-30)
    wn = w / total  # (n, N)

    def item_fn(km, wi):  # (N, k), (N,) -> ((C, k, 4), (C,))
        points = lookup[km].reshape(N, -1)  # (N, d_in)
        p = slices @ points.T  # (C, N)
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
        wb = jnp.broadcast_to(wi[None, :], p.shape)
        ks, ws, perm = jax.lax.sort(
            (_f2i_keys(p), wb, iota), dimension=-1, is_stable=False, num_keys=1
        )
        ps = _i2f_keys(ks)

        def delta_of_xi(xi):
            cs = _cumsum_minor_matmul(ws)
            cbar = cs - ws / 2.0
            x = xi[:, None]
            return _SQRT2 * ws * jnp.cos(jnp.pi * x * cbar) * jnp.sinc(x * ws / 2.0)

        delta, gdelta = jax.jvp(delta_of_xi, (freqs,), (jnp.ones_like(freqs),))
        g2 = jnp.sum(ps * gdelta, axis=-1)  # (C,)
        _, delta_orig = jax.lax.sort(
            (perm, delta), dimension=-1, is_stable=False, num_keys=1
        )
        onehot = (km[:, :, None] == jnp.arange(4, dtype=km.dtype)).astype(
            jnp.float32
        ).reshape(N, k * 4)
        s = jax.lax.dot_general(
            delta_orig, onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (C, k*4)
        return s, g2

    if n == group:
        s, g2 = jax.vmap(item_fn)(kmers, wn)
    else:
        s, g2 = jax.lax.map(
            lambda args: jax.vmap(item_fn)(*args),
            (kmers.reshape(n // group, group, N, k), wn.reshape(n // group, group, N)),
        )
    C = slices.shape[0]
    return s.reshape(n, C, k, 4), g2.reshape(n, C)


def fsw_lazy_apply(params, S, g2, model_axis: str | None = None):
    """Forward from a precomputed compact plane S (B, C, k, 4) plus the
    refresh-point freqs-gradient matrix g2 (B, C) — rows of
    fsw_lazy_refresh gathered per batch. Numerically equal to
    fsw_dist_embed_apply_shared at a fresh permutation (summation order
    aside); between refreshes, exact FSW of the stale ordering. Gradients
    wrt slices AND lookup flow through the proj einsum — exact at the
    refresh point, same staleness class as S. The
    (freqs - stop_grad(freqs)) * g2 term is identically zero in the forward
    but hands autodiff the refresh-point d E / d xi."""
    freqs = params["fsw"]["freqs"]
    lookup = params["lookup"]  # (4, base_dim)
    slices = params["fsw"]["slices"]  # (C, k*base_dim)
    C, k = S.shape[1], S.shape[2]
    vblocks = slices.reshape(C, k, lookup.shape[1])
    # HIGHEST precision keeps the refresh_steps=1 == exact-shared-path
    # contract; both einsums are tiny (V never appears), so it costs nothing
    proj = jnp.einsum(
        "ckd,ad->cka", vblocks, lookup, precision=jax.lax.Precision.HIGHEST
    )  # (C, k, 4): <slice block j of row c, lookup row a>
    fsw_out = jnp.einsum(
        "bcka,cka->bc", S, proj, precision=jax.lax.Precision.HIGHEST
    )  # (B, C)
    fsw_out = fsw_out + (freqs - jax.lax.stop_gradient(freqs))[None, :] * g2
    h = fsw_out @ params["fc1"]["w"]
    if model_axis is not None:
        h = jax.lax.psum(h, model_axis)
    h = jax.nn.relu(h + params["fc1"]["b"])
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def init_fsw_dist_embed(
    key, k: int, base_dim: int, fswout_dim: int, hidden_size: int, embedding_size: int
):
    """NeuralNetFSW-equivalent parameter pytree (models.py:52-58)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "lookup": jax.random.normal(k1, (4, base_dim), jnp.float32),
        "fsw": init_fsw_params(k2, k * base_dim, fswout_dim),
        "fc1": _linear_init(k3, fswout_dim, hidden_size),
        "fc2": _linear_init(k4, hidden_size, embedding_size),
    }


# transient budget for the batched FSW sort: the sort's fwd+bwd carries ~4
# (B, C, N) f32 arrays (projections, weights, perm, cotangents); cap their
# footprint so giant clades (k=9 point sets, N~131072) still fit HBM.
# Derived per-device (1/8 of HBM = the 2 GiB this was tuned at on a 16 GiB
# v5e) so larger parts chunk less; resolved lazily so importing this module
# never initializes the JAX backend. Tests override via KF2VEC_HBM_BYTES.
def fsw_sort_budget_bytes() -> int:
    from ..utils.membudget import hbm_fraction

    return hbm_fraction(1, 8)


def _auto_slice_chunk(b: int, n: int, d_out: int) -> int:
    per_slice = 4 * b * n * 4  # 4 f32-sized (B, 1, N) buffers per slice
    # floor of 8 (f32 sublane tile), NOT a fixed 32: with giant per-slice
    # transients (large B x N) a 32-slice floor would exceed the budget by
    # 4x exactly in the regime the budget exists for
    chunk = max(8, fsw_sort_budget_bytes() // max(per_slice, 1))
    if chunk >= d_out:
        return 0  # unchunked: one fused sort over all slices
    # power-of-2 bucket so recompiles stay bounded across clades
    p = 8
    while p * 2 <= chunk:
        p *= 2
    return p


def fsw_dist_embed_apply(params, X, model_axis: str | None = None, slice_chunk: int | None = None):
    """Forward pass (models.py:60-68). X: (B, N, k+1) — integer-coded bases
    in the first k columns (A=0,T=1,C=2,G=3), frequency weight in the last.
    Zero-padded rows carry weight 0 and do not affect the embedding.

    slice_chunk=None picks the largest chunk (usually: no chunking — one
    fused batched sort) that keeps the sort transients under
    fsw_sort_budget_bytes()."""
    kmers = X[..., :-1].astype(jnp.int32)
    weights = X[..., -1]
    B, N, k = kmers.shape
    base_embed = params["lookup"][kmers].reshape(B, N, -1)

    if slice_chunk is None:
        slice_chunk = _auto_slice_chunk(B, N, int(params["fsw"]["slices"].shape[0]))
    embed_one = functools.partial(fsw_embed, params["fsw"], slice_chunk=slice_chunk)
    fsw_out = jax.vmap(embed_one)(base_embed, weights)  # (B, d_out)

    h = fsw_out @ params["fc1"]["w"]
    if model_axis is not None:
        # slices (and thus fsw features) sharded over the model axis:
        # fc1 is row-parallel
        h = jax.lax.psum(h, model_axis)
    h = jax.nn.relu(h + params["fc1"]["b"])
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def fsw_dist_embed_apply_shared(
    params, W, vocab_digits, model_axis: str | None = None, slice_chunk: int | None = None
):
    """Shared-vocab forward: W (B, V) vocab-aligned weights, vocab_digits
    (V, k) reference-coded bases. Numerically equal to fsw_dist_embed_apply
    on the equivalent per-genome point sets (zero-weight rows are exact
    no-ops under the sinc quantile form)."""
    B, V = W.shape
    points = params["lookup"][vocab_digits].reshape(V, -1)
    if slice_chunk is None:
        slice_chunk = _auto_slice_chunk(B, V, int(params["fsw"]["slices"].shape[0]))
    fsw_out = fsw_embed_shared(params["fsw"], points, W, slice_chunk=slice_chunk)
    h = fsw_out @ params["fc1"]["w"]
    if model_axis is not None:
        h = jax.lax.psum(h, model_axis)
    h = jax.nn.relu(h + params["fc1"]["b"])
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


# shared-vocab gate: V beyond this would blow the sort transients / W
# staging (1<<18 admits k<=9, V=131,072); batch beyond this would make the
# multi-operand sort arity unwieldy (reference FSW batch is 16)
FSW_SHARED_VOCAB_MAX = 1 << 18
FSW_SHARED_BATCH_MAX = 64


def shared_vocab_applicable(k: int, n_points_bucket: int, batch: int) -> bool:
    """Use the shared-vocab path when the vocab is small enough to carry
    and the genomes' point sets are a large fraction of it. The crossover:
    the shared sort moves ~(B+2)*V floats vs the per-genome path's ~3*B*N,
    and pays its comparison cost once — so shared wins down to point sets
    ~V/3 (full genomes at k<=9 contain nearly every canonical k-mer; short
    contigs/queries stay on the per-genome path)."""
    from ..kmer.vocab import MAX_DENSE_K, canonical_vocab_size

    if not (1 <= k <= MAX_DENSE_K):
        return False
    V = canonical_vocab_size(k)
    if V > FSW_SHARED_VOCAB_MAX or batch > FSW_SHARED_BATCH_MAX:
        return False
    return V <= 3 * n_points_bucket


@functools.lru_cache(maxsize=None)
def _vocab_digits_dev(k: int):
    from ..kmer.vocab import FSW_BASE_MAP, canonical_vocab_codes, codes_to_digit_matrix

    digits = codes_to_digit_matrix(canonical_vocab_codes(k), k, FSW_BASE_MAP)
    return jax.device_put(digits.astype(np.int32))


def make_fsw_shared_apply(k: int):
    """apply_fn(params, W, model_axis=None) closing over the canonical
    vocab digit matrix for k — drop-in for the epoch runners' apply
    contract (train/step.py), with W rows in place of point-set tensors."""
    digits = _vocab_digits_dev(k)

    def apply_fn(params, W, model_axis=None, slice_chunk=None):
        return fsw_dist_embed_apply_shared(
            params, W, digits, model_axis=model_axis, slice_chunk=slice_chunk
        )

    return apply_fn


def fsw_dist_embed_specs(model_axis: str | None):
    m = model_axis
    return {
        "lookup": P(),
        "fsw": {"slices": P(m, None), "freqs": P(m)},
        "fc1": {"w": P(m, None), "b": P()},
        "fc2": {"w": P(), "b": P()},
    }
