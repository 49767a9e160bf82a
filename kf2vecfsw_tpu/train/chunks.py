"""Chunked-streaming trainers (reference: train_model_set_chunks.py,
train_classifier_model_chunks.py).

Each genome's features are a (c_i, V) matrix of raw per-10kb-window k-mer
counts (from get_chunks). Per epoch and per genome, the trainer draws random
contiguous window spans — span length ~ floor(Exp(c/5))+1 capped at c
(datasets.py:48-53) — sums them, renormalizes, and trains on the synthetic
"partial genome". The distance trainer draws TWO spans per genome (Siamese
pairs, Dataset_chunks_2rows) and repeats the true-distance labels twice
(train_model_set_chunks.py:396-397); the loss is Loss_chunks
(weight 1/(d+1000), losses.py:58-117).

TPU-native architecture: per-genome chunk prefix sums live in device memory
(DeviceChunkStore) and the random span re-aggregation is a jitted
segment-sum fused into the train step; multi-epoch spans run as one XLA
program (sampling, LR schedule and best-loss tracking on device), so the
host contributes nothing per epoch. Clades whose prefix array exceeds
KF2VEC_CHUNK_DEVICE_BUDGET fall back to host-side streaming sampling (the
≫-device-memory path: each host materializes only its B sampled vectors per
step, overlapped by a prefetch thread).
"""

from __future__ import annotations

import math
import os
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from .. import defaults
from ..models.mlp import (
    classifier_apply,
    count_params,
    dist_embed_apply,
    init_classifier,
    init_dist_embed,
)
from ..ops.losses import chunks_weighted_sqrt_mse, nll_loss
from ..ops.pairwise import pairwise_l2_exact
from ..parallel.mesh import DATA_AXIS, make_mesh
from ..utils.logging import close_logger, make_run_logger, timestamp
from ..utils.timing import hms
from .checkpoint import save_checkpoint
from .classifier import load_kf_matrix, write_classes_table
from .distance import export_embeddings, load_subtree_dist
from .schedule import step_lr
from .step import adam_init, adam_update, lr_schedule_args

F32 = np.float32


def _chunk_device_budget() -> int:
    """Default per-device byte budget for the chunk prefix store: 1/4 of
    HBM (the 4 GiB this was tuned at on a 16 GiB v5e), derived per part so
    bigger chips keep more clades device-resident. KF2VEC_CHUNK_DEVICE_BUDGET
    still overrides at the call sites."""
    from ..utils.membudget import hbm_fraction

    return hbm_fraction(1, 4)


def _check_fullgenome_width(input_dir_fullgenomes: str, names: list[str], input_size: int) -> None:
    """Fail fast when -input_dir_fullgenomes features were built at a
    different k than the chunk features: the mismatch otherwise surfaces as
    a raw shape error in the final full-genome pass AFTER all epochs ran."""
    from ..io.kf import read_kf

    missing = [
        g for g in names
        if not os.path.exists(os.path.join(input_dir_fullgenomes, g + ".kf"))
    ]
    if missing:
        raise FileNotFoundError(
            f"-input_dir_fullgenomes is missing {len(missing)} .kf file(s) "
            f"needed for the final full-genome pass (first: {missing[0]}.kf)"
        )
    # width probe on the first file only (parsing every file here would
    # duplicate the final pass's work; existence is the cheap sweep above)
    _, probe = read_kf(os.path.join(input_dir_fullgenomes, names[0] + ".kf"))
    if probe.shape[1] != input_size:
        raise ValueError(
            f"full-genome feature width {probe.shape[1]} != chunk feature width "
            f"{input_size}: -input_dir and -input_dir_fullgenomes must be built "
            f"with the same k"
        )


class ChunkStore:
    """Host-resident chunk matrices + span sampling.

    Matches the reference's memory story: uint16 by default, uint8 with
    ``cap`` (values clamped to 255, utils.py:408-430). ``column_mask``
    drops feature columns up front (the hidden -mask low-complexity filter,
    train_classifier_model_chunks.py:171-195).
    """

    def __init__(
        self,
        kf_paths: list[str],
        cap: bool = False,
        threads: int = 8,
        column_mask: np.ndarray | None = None,
    ):
        from ..io.kf import read_kf

        def load(p):
            _, mat = read_kf(p)
            if column_mask is not None:
                mat = mat[:, column_mask]
            if cap:
                return np.minimum(mat, 255).astype(np.uint8)
            return mat.astype(np.uint16)

        with ThreadPoolExecutor(max_workers=threads) as pool:
            self.matrices = list(pool.map(load, kf_paths))
        self.names = [os.path.basename(p)[: -len(".kf")] for p in kf_paths]

    @property
    def input_size(self) -> int:
        return self.matrices[0].shape[1]

    def sample_one(self, rng: np.random.Generator, gi: int) -> np.ndarray:
        """One normalized random-span vector (datasets.py:44-62)."""
        m = self.matrices[gi]
        c = m.shape[0]
        nrows = int(np.floor(rng.exponential(c / 5))) + 1
        if nrows > c:
            nrows = int(rng.integers(1, c + 1))
        ix = int(rng.integers(0, c - nrows + 1))
        tmp = m[ix : ix + nrows].sum(axis=0, dtype=np.int64).astype(np.float64)
        total = tmp.sum()
        if total > 0:
            tmp /= total
        else:
            tmp[:] = 0.0
        return (tmp * defaults.FEATURES_SCALER).astype(F32)

    def sample_one_uniform(self, rng: np.random.Generator, gi: int) -> np.ndarray:
        """Legacy uniform-span sampling (Dataset_chunks, datasets.py:271-325):
        span length ~ U[1, c), start ~ U[0, c-span)."""
        m = self.matrices[gi]
        c = m.shape[0]
        nrows = int(rng.integers(1, max(c, 2)))
        ix = int(rng.integers(0, max(c - nrows, 1)))
        tmp = m[ix : ix + nrows].sum(axis=0, dtype=np.int64).astype(np.float64)
        total = tmp.sum()
        if total > 0:
            tmp /= total
        return (tmp * defaults.FEATURES_SCALER).astype(F32)

    def sample_batch(self, rng, genome_indices, draws: int) -> np.ndarray:
        """(len(indices) * draws, V) float32: `draws` spans per genome,
        consecutive rows belong to the same genome."""
        out = np.empty((len(genome_indices) * draws, self.input_size), dtype=F32)
        row = 0
        for gi in genome_indices:
            for _ in range(draws):
                out[row] = self.sample_one(rng, gi)
                row += 1
        return out


class DeviceChunkStore:
    """Device-resident chunk re-aggregation (SURVEY §5: "a jitted segment-sum
    over a chunk-count matrix resident in device memory").

    Per-genome prefix sums over the chunk axis live in HBM as one
    (G, Cmax+1, V) int32 array; a random contiguous span-sum is then two
    gathered rows and a subtraction, so sampling fuses into the jitted train
    step and the host never materializes a batch. Span semantics match the
    host sampler (datasets.py:48-53): length = floor(Exp(c/5))+1, re-drawn
    uniform on [1, c] when over c, start uniform.

    Falls back (see fits()) for clades whose prefix array would not fit the
    device budget — the host ChunkStore streaming path keeps those training.
    """

    def __init__(
        self,
        matrices: list[np.ndarray],
        scaler: float = defaults.FEATURES_SCALER,
        mesh=None,
    ):
        g = len(matrices)
        v = matrices[0].shape[1]
        n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1
        self.sharded = n_data > 1
        # genome axis padded to the data-axis multiple so the store shards
        # evenly; padded rows are never drawn (the sampler only sees real
        # genome indices)
        g_pad = -(-g // n_data) * n_data if self.sharded else g
        self.counts = np.ones(g_pad, dtype=np.int32)
        self.counts[:g] = [m.shape[0] for m in matrices]
        cmax = int(self.counts.max())
        prefix = np.zeros((g_pad, cmax + 1, v), dtype=np.int32)
        for i, m in enumerate(matrices):
            ci = m.shape[0]
            p = np.cumsum(m.astype(np.int64), axis=0)
            # the store is int32 and the span normalizer sums the int32 span
            # vector exactly — both require the per-genome TOTAL count to fit
            # int32 (fits() routes larger genomes to the host ChunkStore)
            if int(p[-1].sum()) >= 2**31:
                raise OverflowError(
                    f"genome {i}: total chunk count {int(p[-1].sum())} overflows the "
                    "int32 device prefix store; use the host ChunkStore path"
                )
            prefix[i, 1 : ci + 1] = p
            prefix[i, ci + 1 :] = p[-1]
        if self.sharded:
            # genome-dim sharding over 'data' lifts the per-device budget
            # n_data-fold: each device holds G/n_data genomes' prefix sums;
            # the sampler runs under shard_map and psums the batch together
            from ..parallel.mesh import put_global

            self.prefix = put_global(prefix, NamedSharding(mesh, P(DATA_AXIS)))
            self.counts_dev = put_global(self.counts, NamedSharding(mesh, P()))
        else:
            self.prefix = jax.device_put(prefix)
            self.counts_dev = jax.device_put(self.counts)
        self.mesh = mesh
        self.g_local = g_pad // n_data
        self.scaler = float(scaler)

    @staticmethod
    def nbytes(matrices: list[np.ndarray]) -> int:
        cmax = max(m.shape[0] for m in matrices)
        return len(matrices) * (cmax + 1) * matrices[0].shape[1] * 4

    @staticmethod
    def fits(matrices: list[np.ndarray], mesh=None) -> bool:
        budget_env = os.environ.get("KF2VEC_CHUNK_DEVICE_BUDGET")
        budget = int(budget_env) if budget_env else _chunk_device_budget()
        n_data = mesh.shape[DATA_AXIS] if mesh is not None else 1
        if DeviceChunkStore.nbytes(matrices) > budget * n_data:
            return False
        # int32 store + exact-int32 span normalization: per-genome totals
        # must stay below 2^31 (a >2G-k-mer genome streams from the host)
        return all(int(m.sum(dtype=np.int64)) < 2**31 for m in matrices)

    @classmethod
    def build_process_sharded(
        cls,
        local_matrices: list[np.ndarray],
        counts_global: np.ndarray,
        input_size: int,
        mesh,
        scaler: float = defaults.FEATURES_SCALER,
    ):
        """Multi-HOST store assembly: each process supplies only the chunk
        matrices for the contiguous genome range its devices own (SURVEY §7
        "each host reads its slice"); counts_global (padded length, pad rows
        = 1) comes from a process_allgather. The global (G_pad, Cmax+1, V)
        prefix array is assembled shard-by-shard via
        make_array_from_process_local_data — no process ever materializes
        other hosts' genomes."""
        from ..parallel.mesh import put_global, put_global_rows

        self = cls.__new__(cls)
        g_pad = int(counts_global.shape[0])
        n_data = mesh.shape[DATA_AXIS]
        self.sharded = True
        self.mesh = mesh
        self.counts = np.asarray(counts_global, dtype=np.int32)
        cmax = int(self.counts.max())
        n_proc = jax.process_count()
        rows_local = g_pad // n_proc
        local_prefix = np.zeros((rows_local, cmax + 1, input_size), dtype=np.int32)
        for i, m in enumerate(local_matrices):
            ci = m.shape[0]
            p = np.cumsum(m.astype(np.int64), axis=0)
            if int(p[-1].sum()) >= 2**31:
                raise OverflowError(
                    f"local genome {i}: total chunk count overflows the int32 "
                    "device prefix store; use the host ChunkStore path"
                )
            local_prefix[i, 1 : ci + 1] = p
            local_prefix[i, ci + 1 :] = p[-1]
        self.prefix = put_global_rows(
            local_prefix, g_pad, NamedSharding(mesh, P(DATA_AXIS))
        )
        self.counts_dev = put_global(self.counts, NamedSharding(mesh, P()))
        self.g_local = g_pad // n_data
        self.scaler = float(scaler)
        return self

    def _sample_one(self, key, gi):
        return _sample_chunk_span(self.prefix, self.counts_dev, self.scaler, key, gi)

    def sample_batch(self, key, genome_indices, draws: int):
        """(len(indices)*draws, V) float32, `draws` consecutive rows per
        genome — jit-traceable; genome_indices is a (B,) int32 array.

        NOTE: inside jit, prefer sample_chunk_batch(prefix, counts, ...) with
        the buffers passed as ARGUMENTS — closure-captured multi-GB arrays
        become jaxpr constants and blow up (remote) compilation."""
        return sample_chunk_batch(
            self.prefix, self.counts_dev, self.scaler, key, genome_indices, draws
        )


def _span_from_row(row, c, scaler, key):
    """One normalized span vector from a genome's prefix rows (shared by the
    replicated and sharded samplers so their math is identical)."""
    k1, k2, k3 = jax.random.split(key, 3)
    nrows = jnp.floor(jax.random.exponential(k1) * (c.astype(jnp.float32) / 5.0)).astype(jnp.int32) + 1
    alt = jax.random.randint(k2, (), 1, c + 1)
    nrows = jnp.where(nrows > c, alt, nrows)
    ix = jax.random.randint(k3, (), 0, c - nrows + 1)
    ivec = row[ix + nrows] - row[ix]
    # exact int32 sum (store construction guarantees totals < 2^31), matching
    # the host sampler's int64/f64 normalization to f32 rounding
    total = jnp.sum(ivec).astype(jnp.float32)
    vec = ivec.astype(jnp.float32)
    return jnp.where(total > 0, vec / total, 0.0) * scaler


def _sample_chunk_span(prefix, counts, scaler, key, gi):
    return _span_from_row(prefix[gi], counts[gi], scaler, key)


def sample_chunk_batch(prefix, counts, scaler, key, genome_indices, draws: int):
    """Pure-function span sampler (buffers as args, jit-friendly)."""
    b = genome_indices.shape[0]
    keys = jax.random.split(key, b * draws)
    gis = jnp.repeat(genome_indices, draws)
    return jax.vmap(lambda k, g: _sample_chunk_span(prefix, counts, scaler, k, g))(keys, gis)


def sample_chunk_batch_sharded(
    prefix_local, counts, scaler, key, genome_indices, draws: int, g_local: int
):
    """shard_map body for the genome-sharded prefix store: each device
    computes the span vectors for the batch genomes IT owns (same per-sample
    keys as the replicated sampler, so results are bit-identical) and the
    (B*draws, V) batch is assembled with one psum over 'data'."""
    d = jax.lax.axis_index(DATA_AXIS)
    b = genome_indices.shape[0]
    keys = jax.random.split(key, b * draws)
    gis = jnp.repeat(genome_indices, draws)

    def one(k, gi):
        owner = gi // g_local
        li = jnp.where(owner == d, gi - owner * g_local, 0)
        vec = _span_from_row(prefix_local[li], counts[gi], scaler, k)
        return jnp.where(owner == d, vec, 0.0)

    rows = jax.vmap(one)(keys, gis)
    return jax.lax.psum(rows, DATA_AXIS)


def make_chunked_span_runner(
    loss_and_grad_step, dstore, n_items: int, batch_size: int, draws: int, consts=(), mesh=None
):
    """Multi-epoch chunked training as ONE device program: scan over epochs,
    each epoch drawing its permutation and chunk spans on device (the LR
    step schedule too), with best-loss params tracked in the carry. Returns
    run(params, opt, (best_params, lowest f32, best_epoch i32), base_key,
    epoch0, span, lr_args) -> (params, opt, best, per-epoch aux stacks).
    Checkpoint metadata must come from the returned best tuple — the device
    f32 loss comparison decides which params were kept.

    The chunk prefix store and `consts` (e.g. the true-distance matrix /
    label vector needed by loss_and_grad_step(params, opt, x, idx, lr,
    consts)) are passed as jit ARGUMENTS: closure-captured device arrays
    become jaxpr constants, and a multi-GB constant overflows (remote)
    compilation requests.

    With a multi-device `mesh`, the sampled batch carries a 'data'-axis
    sharding constraint so GSPMD partitions the forward/backward data-
    parallel and inserts the gradient all-reduce (the DataParallel
    equivalent the host-streaming path gets from its explicit device_put
    sharding)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS
    from .step import device_step_lr, fold_best

    x_sharding = None
    if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
        rows = batch_size * draws
        if rows % mesh.shape[DATA_AXIS] == 0:
            x_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def _shard_x(x):
        if x_sharding is not None and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            return jax.lax.with_sharding_constraint(x, x_sharding)
        return x

    if getattr(dstore, "sharded", False):
        from .step import shard_map as _shard_map

        g_local = dstore.g_local

        def _sample(prefix, counts, key, gidx):
            return _shard_map(
                lambda pl, cl, k, gi: sample_chunk_batch_sharded(
                    pl, cl, dstore.scaler, k, gi, draws, g_local
                ),
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(), P(), P()),
                out_specs=P(),
            )(prefix, counts, key, gidx)

    else:

        def _sample(prefix, counts, key, gidx):
            return sample_chunk_batch(prefix, counts, dstore.scaler, key, gidx, draws)

    n_full = n_items // batch_size
    tail = n_items - n_full * batch_size
    batch_weights = jnp.asarray(
        [batch_size] * n_full + ([tail] if tail else []), jnp.float32
    )

    def epoch_fn(params, opt, prefix, counts, consts_v, key_e, lr):
        perm = jax.random.permutation(jax.random.fold_in(key_e, 0), n_items).astype(jnp.int32)
        aux_parts = []
        if n_full:

            def body(carry, bi):
                params, opt = carry
                gidx = jax.lax.dynamic_slice_in_dim(perm, bi * batch_size, batch_size)
                x = _shard_x(_sample(
                    prefix, counts, jax.random.fold_in(key_e, 1 + bi), gidx
                ))
                params, opt, aux = loss_and_grad_step(params, opt, x, gidx, lr, consts_v)
                return (params, opt), aux

            (params, opt), aux_full = jax.lax.scan(body, (params, opt), jnp.arange(n_full))
            aux_parts.append(aux_full)
        if tail:
            gidx = perm[n_full * batch_size :]
            x = _shard_x(_sample(
                prefix, counts, jax.random.fold_in(key_e, 1 + n_full), gidx
            ))
            params, opt, aux_t = loss_and_grad_step(params, opt, x, gidx, lr, consts_v)
            aux_parts.append(jax.tree.map(lambda a: jnp.asarray(a)[None], aux_t))
        aux = jax.tree.map(lambda *xs: jnp.concatenate(xs), *aux_parts)
        return params, opt, aux

    def span_impl(params, opt, best, prefix, counts, consts_v, base_key, epoch0, lr_args, span):
        lr0, lr_min, lr_decay, lr_base, lr_freq = lr_args

        def body(carry, e):
            params, opt, bp, lo, be = carry
            lr = device_step_lr(e, lr0, lr_min, lr_decay, lr_base, lr_freq)
            params, opt, aux = epoch_fn(
                params, opt, prefix, counts, consts_v, jax.random.fold_in(base_key, e), lr
            )
            losses = aux[0] if isinstance(aux, tuple) else aux
            eloss = jnp.sum(losses * batch_weights) / jnp.sum(batch_weights)
            better = eloss < lo
            bp = fold_best(better, bp, params)
            lo = jnp.where(better, eloss, lo)
            be = jnp.where(better, e, be)
            return (params, opt, bp, lo, be), aux

        carry = (params, opt) + tuple(best)
        (params, opt, bp, lo, be), aux = jax.lax.scan(body, carry, epoch0 + jnp.arange(span))
        return params, opt, (bp, lo, be), aux

    jitted = jax.jit(span_impl, static_argnums=(9,), donate_argnums=(0, 1, 2))

    def run(params, opt, best, base_key, epoch0, span, lr_args):
        lr_args = tuple(jnp.float32(v) for v in lr_args[:4]) + (jnp.int32(lr_args[4]),)
        return jitted(
            params, opt, tuple(best), dstore.prefix, dstore.counts_dev, tuple(consts),
            base_key, jnp.int32(epoch0), lr_args, int(span),
        )

    return run


def stage_replicated(x, mesh):
    """Replicated device staging that also works on a multi-process mesh
    (raw device_put would place on this process's devices only)."""
    if jax.process_count() == 1:
        return jax.device_put(x)
    from ..parallel.mesh import put_global, replicated

    return jax.tree.map(lambda a: put_global(jax.device_get(a), replicated(mesh)), x)


def load_chunk_store_process_sliced(
    kf_paths: list[str], mesh, cap: bool, column_mask: np.ndarray | None = None
):
    """Multi-host chunk ingest: THIS process reads only the chunk `.kf`
    files for the contiguous genome range its devices own; per-genome chunk
    counts and the feature width are exchanged with process_allgather.
    Returns (local_matrices, counts_global, input_size, totals_global) for
    DeviceChunkStore.build_process_sharded / sharded_store_fits, or None when
    the layout does not divide evenly (callers fall back to full replicated
    ingest)."""
    from jax.experimental import multihost_utils

    from ..io.kf import read_kf

    n_proc = jax.process_count()
    n_data = mesh.shape[DATA_AXIS]
    g = len(kf_paths)
    g_pad = -(-g // n_data) * n_data
    if n_proc == 1 or g_pad % n_proc or n_data % n_proc:
        return None
    per = g_pad // n_proc
    p = jax.process_index()
    lo, hi = p * per, min((p + 1) * per, g)

    def load(path):
        _, mat = read_kf(path)
        if column_mask is not None:
            mat = mat[:, column_mask]
        return np.minimum(mat, 255).astype(np.uint8) if cap else mat.astype(np.uint16)

    local = [load(q) for q in kf_paths[lo:hi]]
    local_counts = np.ones(per, dtype=np.int32)
    local_counts[: len(local)] = [m.shape[0] for m in local]
    local_v = np.array([local[0].shape[1] if local else 0], dtype=np.int32)
    # per-genome TOTAL counts as f64 (exact < 2^53): the int32 prefix store
    # cannot hold genomes whose totals reach 2^31
    local_totals = np.zeros(per, dtype=np.float64)
    local_totals[: len(local)] = [float(m.sum(dtype=np.int64)) for m in local]
    all_counts = np.asarray(multihost_utils.process_allgather(local_counts))
    all_v = np.asarray(multihost_utils.process_allgather(local_v))
    all_totals = np.asarray(multihost_utils.process_allgather(local_totals))
    input_size = int(all_v.max())
    return local, all_counts.reshape(-1), input_size, all_totals.reshape(-1)


def sharded_store_fits(
    counts_global: np.ndarray, input_size: int, mesh, totals_global=None
) -> bool:
    budget_env = os.environ.get("KF2VEC_CHUNK_DEVICE_BUDGET")
    budget = int(budget_env) if budget_env else _chunk_device_budget()
    n_data = mesh.shape[DATA_AXIS]
    cmax = int(np.max(counts_global))
    nbytes = int(counts_global.shape[0]) * (cmax + 1) * input_size * 4
    if nbytes > budget * n_data:
        return False
    # same int32 guard as DeviceChunkStore.fits: oversized genomes must fall
    # back to the host ChunkStore instead of raising in build_process_sharded
    return totals_global is None or bool(np.all(totals_global < 2**31))


def stage_batch(x, mesh, x_sharding):
    """Host batch -> device under the 'data' sharding, multi-process-safe.

    Multi-process meshes cannot device_put a process-local array under a
    global sharding (train/chunks round-1 defect); instead every process
    samples the identical global batch (same seeded host RNG) and stages
    only its own row slice via make_array_from_process_local_data."""
    if x_sharding is None or x.shape[0] % mesh.shape[DATA_AXIS] != 0:
        return x
    if jax.process_count() == 1:
        return jax.device_put(x, x_sharding)
    from ..parallel.mesh import process_row_slice, put_global_rows

    sl = process_row_slice(x.shape[0], mesh)
    return put_global_rows(x[sl], x.shape[0], x_sharding)


def _prefetch(batches_iter, depth: int = 2):
    """Background-thread prefetcher for host-sampled batches. Producer
    exceptions re-raise in the consumer (a bare worker previously died
    silently, hanging the training loop on q.get()); an abandoned consumer
    releases the producer thread."""
    from ..utils.prefetch import prefetch_iter

    return prefetch_iter(batches_iter, depth=depth)


# -- chunked distance trainer --------------------------------------------------


def train_model_set_chunks_func(
    features_folder: str,
    input_dir_fullgenomes: str,
    feature_files: list[str],
    clades_info: str,
    true_dist_dir: str,
    num_epochs: int,
    hidden_size: int,
    embedding_size: int,
    batch_size: int,
    lr0: float,
    lr_min: float,
    lr_decay: float,
    clades_to_train: list[int] | None,
    seed: int,
    cap_data: bool,
    model_filepath: str,
    mesh=None,
    log_every: int = 1,
    resume: bool = False,
    autosave_every: int = 500,
) -> list[str]:
    from ..ingest.tree_ops import read_subtrees

    since = time.time()
    clade_tag = (
        "_".join(str(c) for c in clades_to_train) if clades_to_train is not None else "all"
    )
    log = make_run_logger(model_filepath, f"train_model_{timestamp()}_clade_{clade_tag}.log")
    mesh = mesh or make_mesh()
    try:
        log.info("\n==> Input arguments...\n")
        log.info(f"Feature directory: {features_folder}")
        log.info(f"Clades information: {clades_info}")
        log.info(f"Ground truth directory: {true_dist_dir}")
        log.info("\n==> Parameters...\n")
        log.info(f"Backend: {jax.default_backend()} ({len(jax.devices())} devices)")
        log.info(f"Hidden Size fc1: {hidden_size}")
        log.info(f"Embedding Size: {embedding_size}")
        log.info(f"Total Epochs: {num_epochs}")
        log.info(f"Batch Size: {batch_size}")
        log.info(f"Cap kmer frequencies: {cap_data}")

        rows = read_subtrees(clades_info)
        clade_order: list[int] = []
        for _, c in rows:
            if c not in clade_order:
                clade_order.append(c)
        if clades_to_train is not None:
            clade_order = list(clades_to_train)
        log.info(f"Number of Classes: {len(clade_order)}")

        avail = {os.path.basename(f)[: -len(".kf")]: f for f in feature_files}
        saved: list[str] = []
        key = jax.random.PRNGKey(seed)

        for c in clade_order:
            log.info(f"\n==> Working on subtree {c}...\n")
            clade_genomes = {g for g, cl in rows if cl == c}
            backbone_names = [g for g in avail if g in clade_genomes]
            clade_paths = [avail[g] for g in backbone_names]

            # multi-host ingest: each process reads only its genome slice and
            # the prefix store assembles sharded (SURVEY §7); falls back to
            # full replicated ingest when the sliced layout does not apply
            store = None
            dstore_presliced = None
            sliced = load_chunk_store_process_sliced(clade_paths, mesh, cap_data)
            if sliced is not None:
                local_mats, counts_global, input_size, totals_global = sliced
                if sharded_store_fits(counts_global, input_size, mesh, totals_global):
                    dstore_presliced = DeviceChunkStore.build_process_sharded(
                        local_mats, counts_global, input_size, mesh
                    )
                    log.info("Chunk ingest: per-process genome slices (multi-host)")
            if dstore_presliced is None:
                store = ChunkStore(clade_paths, cap=cap_data)
                input_size = store.input_size
            n_items = len(backbone_names)
            log.info(f"Dimensions of feature matrix rows: {n_items}, cols: {input_size}")
            _check_fullgenome_width(input_dir_fullgenomes, backbone_names, input_size)

            dist = load_subtree_dist(true_dist_dir, c, backbone_names).astype(F32)
            dist_dev = stage_replicated(dist, mesh)

            params = stage_replicated(
                init_dist_embed(key, input_size, hidden_size, embedding_size), mesh
            )
            opt = adam_init(params)
            log.info(f"Total parameters: {count_params(params)}")

            x_sharding = NamedSharding(mesh, P(DATA_AXIS))
            if dstore_presliced is not None:
                dstore = dstore_presliced
            else:
                dstore = (
                    DeviceChunkStore(store.matrices, mesh=mesh)
                    if DeviceChunkStore.fits(store.matrices, mesh)
                    else None
                )
            if dstore is not None:
                log.info("Chunk store: device-resident prefix sums (sampling fused into the train step)")
            else:
                log.info("Chunk store: host streaming (prefix array exceeds device budget)")

            def loss_from_x(p, x, idx, dmat):
                emb = dist_embed_apply(p, x)
                md = pairwise_l2_exact(emb)
                ridx = jnp.repeat(idx, 2)
                td = dmat[jnp.ix_(ridx, ridx)]
                return chunks_weighted_sqrt_mse(md, td)

            # the distance matrix is a jit ARGUMENT everywhere (closure
            # constants ship with every compile request)
            @jax.jit
            def step(params, opt, x, idx, lr, dmat):
                loss, grads = jax.value_and_grad(loss_from_x)(params, x, idx, dmat)
                params, opt = adam_update(params, grads, opt, lr)
                return params, opt, loss

            def loss_and_grad_step(params, opt, x, idx, lr, consts):
                loss, grads = jax.value_and_grad(loss_from_x)(params, x, idx, consts[0])
                params, opt = adam_update(params, grads, opt, lr)
                return params, opt, loss

            n_batches = max(1, math.ceil(n_items / batch_size))
            stop_epochs = int(math.ceil(n_items / batch_size * 2))
            lq: deque = deque([float("nan")] * stop_epochs, maxlen=stop_epochs)
            log.info(f"Stopping epochs: {stop_epochs}")
            consec_lowest, consec_best_epoch = math.inf, -1

            lowest, best_epoch, best_params = math.inf, -1, params
            start_epoch = 0
            ckpt_path = os.path.join(model_filepath, f"model_subtree_{c}.ckpt")
            state_path = os.path.join(
                model_filepath, f"trainer_state_chunks_subtree_{c}.ckpt"
            )
            if resume:
                from .resume import restore_trainer_state

                state = restore_trainer_state(state_path, params, log, mesh=mesh)
                if state is not None:
                    start_epoch, params, opt, best_params, lowest, best_epoch, _ = state
            meta = {
                "model_input_size": input_size,
                "model_hidden_size_fc1": hidden_size,
                "model_embedding_size": embedding_size,
            }

            n_full = n_items // batch_size
            tail_n = n_items - n_full * batch_size
            batch_sizes = [batch_size] * n_full + ([tail_n] if tail_n else [])

            def account_epoch(epoch, loss_row):
                """Per-epoch bookkeeping from the fetched per-batch losses:
                outlier/NaN logs, best/rolling-mean tracking, epoch log."""
                nonlocal lowest, best_epoch, consec_lowest, consec_best_epoch
                for bi, lv in enumerate(loss_row):
                    if epoch > 5 and lv > 0.2:
                        log.info(
                            f"Epoch [{epoch + 1}/{num_epochs}], Step [{bi + 1}/{n_batches}], "
                            f"Outlier: {lv:.20f} batch size: {batch_sizes[bi] * 2}"
                        )
                    if math.isnan(lv):
                        log.info(f"Loss: {lv}")
                epoch_loss = float(
                    (loss_row * np.array(batch_sizes)).sum() / max(sum(batch_sizes), 1)
                )
                lq.appendleft(epoch_loss)
                lq_mean = float(np.nanmean(lq))
                if lq_mean < consec_lowest:
                    consec_lowest, consec_best_epoch = lq_mean, epoch
                if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
                    hrs, m, s = hms(time.time() - since)
                    log.info(
                        f"Epoch [{epoch + 1}/{num_epochs}], Step [{n_batches}/{n_batches}], "
                        f"Train loss: {epoch_loss:.20f}, Time: {hrs:02d}:{m:02d}:{s:02d}"
                    )
                return epoch_loss

            epoch_key = jax.random.fold_in(key, 17)
            if dstore is not None:
                # multi-epoch device spans: sampling, LR schedule and
                # best-loss params all on device; one dispatch + one loss
                # fetch per span instead of a round trip per epoch
                from .step import split_spans

                span_run = make_chunked_span_runner(
                    loss_and_grad_step, dstore, n_items, batch_size, draws=2,
                    consts=(dist_dev,), mesh=mesh,
                )
                lr_args = lr_schedule_args(lr0, lr_min, lr_decay)
                best = (
                    jax.tree.map(jnp.copy, best_params),
                    jnp.float32(lowest),
                    jnp.int32(best_epoch),
                )
                boundaries: set[int] = set()
                if autosave_every:
                    boundaries.update(range(autosave_every, num_epochs, autosave_every))
                for epoch0, span in split_spans(start_epoch, num_epochs, sorted(boundaries)):
                    params, opt, best, loss_mat = span_run(
                        params, opt, best, epoch_key, epoch0, span, lr_args
                    )
                    lv = np.asarray(jax.device_get(loss_mat), dtype=np.float64)
                    for i in range(span):
                        account_epoch(epoch0 + i, lv[i])
                    end_epoch = epoch0 + span - 1
                    # save only at autosave boundaries / the final epoch:
                    # spans can be much shorter than autosave_every and a
                    # per-span save would multiply checkpoint I/O ~17x
                    if autosave_every and (
                        (end_epoch + 1) % autosave_every == 0
                        or end_epoch == num_epochs - 1
                    ):
                        from .resume import save_trainer_state

                        save_trainer_state(
                            state_path, end_epoch, params, opt, best[0],
                            float(best[1]), int(best[2]), mesh=mesh,
                        )
                # the device comparison decided which params were kept — use
                # its values for the checkpoint metadata too
                best_params, lowest, best_epoch = best[0], float(best[1]), int(best[2])
            else:
                for epoch in range(start_epoch, num_epochs):
                    lr = step_lr(epoch, lr0, lr_min, lr_decay)
                    # keyed by absolute epoch (not positional) so a -resume'd
                    # run replays the identical permutation + chunk-span
                    # sample stream, exactly like the device span path
                    erng = np.random.default_rng((seed, epoch))
                    perm = erng.permutation(n_items)
                    losses = []

                    def batches():
                        for bi in range(n_batches):
                            gidx = perm[bi * batch_size : (bi + 1) * batch_size]
                            x = store.sample_batch(erng, gidx, draws=2)
                            yield gidx.astype(np.int32), x

                    for gidx, x in _prefetch(batches()):
                        x_dev = stage_batch(x, mesh, x_sharding)
                        params, opt, loss = step(params, opt, x_dev, gidx, jnp.float32(lr), dist_dev)
                        losses.append(loss)

                    loss_vals = np.asarray(jax.device_get(jnp.stack(losses)), dtype=np.float64)
                    epoch_loss = account_epoch(epoch, loss_vals)
                    if epoch_loss < lowest:
                        lowest, best_epoch, best_params = epoch_loss, epoch, params
                    if autosave_every and (epoch + 1) % autosave_every == 0:
                        from .resume import save_trainer_state

                        save_trainer_state(
                            state_path, epoch, params, opt, best_params, lowest,
                            best_epoch, mesh=mesh,
                        )

            log.info(f"Best Epoch [{best_epoch + 1}/{num_epochs}], Lowest loss: {lowest:.20f}")
            log.info(
                f"Best consecutive Epoch [{consec_best_epoch + 1}/{num_epochs}], "
                f"Lowest loss: {consec_lowest:.20f}"
            )
            save_checkpoint(
                ckpt_path, "NeuralNet", {**meta, "best_epoch": best_epoch, "lowest_loss": lowest},
                best_params,
            )
            saved.append(ckpt_path)

            # final embeddings from FULL genomes (train_model_set_chunks.py:578-616);
            # coordinator-only (export writes are gated anyway — skip the
            # redundant full-genome read + forward on other processes)
            from .resume import is_coordinator

            if is_coordinator():
                full_paths = [
                    os.path.join(input_dir_fullgenomes, g + ".kf") for g in backbone_names
                ]
                full_names, full_feats = load_kf_matrix(full_paths)
                full_feats = full_feats * F32(defaults.FEATURES_SCALER)
                export_embeddings(
                    jax.jit(lambda p, x: dist_embed_apply(p, x)),
                    jax.device_get(best_params),
                    full_feats,
                    full_names,
                    model_filepath,
                    c,
                    log,
                )
            log.info(f"\n==> Training for subtree {c} completed!\n")

        log.info("\n==> Training Completed!\n")
        hrs, m, s = hms(time.time() - since)
        log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
        return saved
    finally:
        close_logger(log)


# -- chunked classifier trainer -------------------------------------------------


def train_classifier_chunks_func(
    features_folder: str,
    input_dir_fullgenomes: str,
    feature_files: list[str],
    clades_info: str,
    num_epochs: int,
    hidden_size: int,
    batch_size: int,
    lr0: float,
    lr_min: float,
    lr_decay: float,
    seed: int,
    custom_mask: bool,
    cap_data: bool,
    model_filepath: str,
    mesh=None,
    log_every: int = 1,
    resume: bool = False,
    autosave_every: int = 500,
) -> str:
    from ..ingest.tree_ops import read_subtrees

    since = time.time()
    log = make_run_logger(model_filepath, f"train_classifier_{timestamp()}.log")
    mesh = mesh or make_mesh()
    try:
        log.info("\n==> Preparing Data...\n")
        column_mask = None
        if custom_mask:
            from ..io.kf import read_kf
            from ..kmer.vocab import low_complexity_mask
            from .classifier import VOCAB_SIZES_TO_K

            _, probe = read_kf(feature_files[0])
            k_inferred = VOCAB_SIZES_TO_K.get(probe.shape[1])
            if k_inferred is None:
                raise ValueError(f"cannot infer k from width {probe.shape[1]} for -mask")
            column_mask = low_complexity_mask(k_inferred)
        # multi-host ingest: each process reads only its genome slice when
        # the sharded device store applies (same pattern as the chunked
        # distance trainer)
        store = None
        dstore_presliced = None
        sliced = load_chunk_store_process_sliced(feature_files, mesh, cap_data, column_mask)
        if sliced is not None:
            local_mats, counts_global, input_size, totals_global = sliced
            if sharded_store_fits(counts_global, input_size, mesh, totals_global):
                dstore_presliced = DeviceChunkStore.build_process_sharded(
                    local_mats, counts_global, input_size, mesh
                )
                log.info("Chunk ingest: per-process genome slices (multi-host)")
        if dstore_presliced is None:
            store = ChunkStore(feature_files, cap=cap_data, column_mask=column_mask)
            input_size = store.input_size
        names = [os.path.basename(p)[: -len(".kf")] for p in feature_files]
        n_items = len(names)
        log.info(f"Dimensions of feature matrix rows: {n_items}, cols: {input_size}")
        log.info(f"Masking: {custom_mask}")
        log.info(f"Cap kmer frequencies: {cap_data}")
        # with -mask the chunk width is the masked count; the full-genome
        # files are UNMASKED, so compare against the mask's source width
        _check_fullgenome_width(
            input_dir_fullgenomes, names,
            int(column_mask.size) if column_mask is not None else input_size,
        )

        clade_map = dict(read_subtrees(clades_info))
        labels = np.array([clade_map[n] for n in names], dtype=np.int32)
        from .classifier import validate_class_labels

        class_count = validate_class_labels(labels)
        labels_dev = stage_replicated(labels, mesh)
        log.info(f"Number of Classes: {class_count}")

        key = jax.random.PRNGKey(seed)
        params = stage_replicated(
            init_classifier(key, input_size, hidden_size, class_count), mesh
        )
        opt = adam_init(params)
        log.info(f"Total parameters: {count_params(params)}")

        def loss_from_x(p, x, idx, labels_v):
            lp = classifier_apply(p, x)
            y = labels_v[idx]
            loss = nll_loss(lp, y)
            correct = jnp.sum(jnp.argmax(lp, axis=1) == y)
            return loss, correct

        @jax.jit
        def step(params, opt, x, idx, lr, labels_v):
            (loss, correct), grads = jax.value_and_grad(loss_from_x, has_aux=True)(params, x, idx, labels_v)
            params, opt = adam_update(params, grads, opt, lr)
            return params, opt, loss, correct

        if dstore_presliced is not None:
            dstore = dstore_presliced
        else:
            dstore = (
                DeviceChunkStore(store.matrices, mesh=mesh)
                if DeviceChunkStore.fits(store.matrices, mesh)
                else None
            )
        log.info(
            "Chunk store: device-resident prefix sums"
            if dstore is not None
            else "Chunk store: host streaming (prefix array exceeds device budget)"
        )

        def loss_and_grad_step(params, opt, x, idx, lr, consts):
            (loss, correct), grads = jax.value_and_grad(loss_from_x, has_aux=True)(params, x, idx, consts[0])
            params, opt = adam_update(params, grads, opt, lr)
            return params, opt, (loss, correct)

        key = jax.random.fold_in(key, 23)
        n_batches = max(1, math.ceil(n_items / batch_size))
        lowest, best_epoch, best_params, highest_acc = math.inf, -1, params, -1.0
        start_epoch = 0
        state_path = os.path.join(model_filepath, "trainer_state_chunks_classifier.ckpt")
        if resume:
            from .resume import restore_trainer_state

            state = restore_trainer_state(state_path, params, log, mesh=mesh)
            if state is not None:
                start_epoch, params, opt, best_params, lowest, best_epoch, extra = state
                highest_acc = float(extra.get("acc_at_best", -1.0))
        n_full = n_items // batch_size
        tail_n = n_items - n_full * batch_size
        batch_sizes = [batch_size] * n_full + ([tail_n] if tail_n else [])
        items = max(sum(batch_sizes), 1)

        def account_epoch(epoch, loss_row, corr_row):
            epoch_loss = float((loss_row * np.array(batch_sizes)).sum() / items)
            acc = float(corr_row.sum() / items)
            if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
                hrs, m, s = hms(time.time() - since)
                log.info(
                    f"Epoch [{epoch + 1}/{num_epochs}], Step [{n_batches}/{n_batches}], "
                    f"Train loss: {epoch_loss:.20f}, {acc:.20f}, Time: {hrs:02d}:{m:02d}:{s:02d}"
                )
            return epoch_loss, acc

        if dstore is not None:
            from .step import split_spans

            span_run = make_chunked_span_runner(
                loss_and_grad_step, dstore, n_items, batch_size, draws=1,
                consts=(labels_dev,), mesh=mesh,
            )
            lr_args = lr_schedule_args(lr0, lr_min, lr_decay)
            best = (
                jax.tree.map(jnp.copy, best_params),
                jnp.float32(lowest),
                jnp.int32(best_epoch),
            )
            # accuracy AT the best epoch, keyed by absolute epoch so a resumed
            # run whose best epoch predates the restart keeps the saved value
            acc_by_epoch: dict[int, float] = {}
            resumed_acc = highest_acc
            boundaries: set[int] = set()
            if autosave_every:
                boundaries.update(range(autosave_every, num_epochs, autosave_every))
            for epoch0, span in split_spans(start_epoch, num_epochs, sorted(boundaries)):
                params, opt, best, (loss_mat, corr_mat) = span_run(
                    params, opt, best, key, epoch0, span, lr_args
                )
                lv = np.asarray(jax.device_get(loss_mat), dtype=np.float64)
                cv = np.asarray(jax.device_get(corr_mat), dtype=np.float64)
                for i in range(span):
                    _, acc = account_epoch(epoch0 + i, lv[i], cv[i])
                    acc_by_epoch[epoch0 + i] = acc
                end_epoch = epoch0 + span - 1
                if autosave_every and (
                    (end_epoch + 1) % autosave_every == 0 or end_epoch == num_epochs - 1
                ):
                    from .resume import save_trainer_state

                    save_trainer_state(
                        state_path, end_epoch, params, opt, best[0],
                        float(best[1]), int(best[2]),
                        extra={"acc_at_best": acc_by_epoch.get(int(best[2]), resumed_acc)},
                        mesh=mesh,
                    )
            # device comparison decided the kept params; metadata follows it
            best_params, lowest, best_epoch = best[0], float(best[1]), int(best[2])
            highest_acc = acc_by_epoch.get(best_epoch, resumed_acc)
        else:
            x_sharding = NamedSharding(mesh, P(DATA_AXIS))
            for epoch in range(start_epoch, num_epochs):
                lr = step_lr(epoch, lr0, lr_min, lr_decay)
                # absolute-epoch-keyed RNG: -resume replays the exact stream
                erng = np.random.default_rng((seed, epoch))
                perm = erng.permutation(n_items)
                losses, corrects = [], []

                def batches():
                    for bi in range(n_batches):
                        gidx = perm[bi * batch_size : (bi + 1) * batch_size]
                        yield gidx.astype(np.int32), store.sample_batch(erng, gidx, draws=1)

                for gidx, x in _prefetch(batches()):
                    # stage with 'data'-axis sharding (like the distance
                    # trainer's host path): a raw numpy arg would be treated
                    # as replicated, losing data parallelism on exactly the
                    # too-big-for-device-store path
                    x_dev = stage_batch(x, mesh, x_sharding)
                    params, opt, loss, corr = step(params, opt, x_dev, gidx, jnp.float32(lr), labels_dev)
                    losses.append(loss)
                    corrects.append(corr)

                loss_vals = np.asarray(jax.device_get(jnp.stack(losses)), dtype=np.float64)
                corr_vals = np.asarray(jax.device_get(jnp.stack(corrects)), dtype=np.float64)
                epoch_loss, acc = account_epoch(epoch, loss_vals, corr_vals)
                if epoch_loss < lowest:
                    lowest, highest_acc, best_epoch, best_params = epoch_loss, acc, epoch, params
                if autosave_every and (epoch + 1) % autosave_every == 0:
                    from .resume import save_trainer_state

                    save_trainer_state(
                        state_path, epoch, params, opt, best_params, lowest,
                        best_epoch, extra={"acc_at_best": highest_acc}, mesh=mesh,
                    )

        log.info(
            f"Best Epoch [{best_epoch + 1}/{num_epochs}], Lowest loss: {lowest:.20f}, "
            f"Highest accuracy: {highest_acc:.20f}"
        )
        meta = {
            "model_input_size": input_size,
            "model_hidden_size_fc1": hidden_size,
            "model_class_count": class_count,
            "best_epoch": best_epoch,
            "lowest_loss": lowest,
        }
        if custom_mask:
            meta["low_complexity_mask_k"] = k_inferred
        ckpt_path = os.path.join(model_filepath, "classifier_model.ckpt")
        save_checkpoint(ckpt_path, "NeuralNetClassifierOnly", meta, best_params)

        # backbone classes from FULL genomes (train_classifier_model_chunks.py:517-559);
        # the column mask is applied here too (the reference would crash on
        # this path with -mask: its final pass feeds unmasked features);
        # coordinator-only in multi-process
        from .resume import is_coordinator

        if is_coordinator():
            full_paths = [os.path.join(input_dir_fullgenomes, g + ".kf") for g in names]
            full_names, full_feats = load_kf_matrix(full_paths)
            if column_mask is not None:
                full_feats = full_feats[:, column_mask]
            full_feats = full_feats * F32(defaults.FEATURES_SCALER)
            lp = jax.jit(lambda p, x: classifier_apply(p, x))(jax.device_get(best_params), full_feats)
            probs = np.exp(np.asarray(lp))
            out = os.path.join(model_filepath, "backbone_classes.out")
            full_labels = np.array([clade_map[n] for n in full_names], dtype=np.int32)
            write_classes_table(out, full_names, probs, class_count, true_class=full_labels)
            log.info(f"Dimensions of class output rows:{len(full_names)} cols:{4 + class_count}")

        log.info("\n==> Training Completed!\n")
        hrs, m, s = hms(time.time() - since)
        log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
        return ckpt_path
    finally:
        close_logger(log)
