"""Query -> backbone placement distance matrices (reference: query.py:53-200).

For each predicted subtree: load that subtree's distance model and backbone
embeddings, embed the queries in blocks, and stream the squared+clamped
query-to-backbone distances into apples_input_di_mtrx_subtree_{c}.csv plus
the raw embeddings into embedding_subtree_{c}.emb.

Fixes the reference defect at query.py:118-126 / utils.py:363 (checkpoints
always rebuilt as dense NeuralNet): dispatch on the stored model_name, so FSW
subtree models are queryable — their inputs are the {name}_k{k}.npy matrices
from get_kmers rather than `.kf` vectors.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from .. import defaults
from ..models.fsw import fsw_dist_embed_apply
from ..models.mlp import dist_embed_apply
from ..ops.pairwise import cdist_exact_blocked, squared_clamped
from ..train.step import bucket_items
from ..train.distance import f32_row, pad_point_sets
from ..utils import phases
from ..utils.logging import close_logger, make_run_logger
from ..utils.timing import hms


def _make_qstep(apply_fn):
    # ONE jitted dispatch per block: forward + cdist + square/clamp fused,
    # defined at module level so the in-process executable cache survives
    # across query_func calls (a fresh jit(lambda) per call re-traces).
    # Embeddings and distances return FUSED into one (rows, E + anchors)
    # array: each separate np.asarray fetch costs a full tunnel round trip
    # (~29 ms on this rig), so two fetches per block across a 10-subtree
    # placement was 20 serial RTTs — one fused fetch halves that, and
    # copy_to_host_async (below) overlaps the rest.
    import jax.numpy as jnp

    @jax.jit
    def qstep(params, x, anchors):
        out = apply_fn(params, x)
        return jnp.concatenate(
            [out, squared_clamped(cdist_exact_blocked(out, anchors))], axis=1
        )

    return qstep


_QSTEP_FSW = _make_qstep(fsw_dist_embed_apply)
_QSTEP_DENSE = _make_qstep(dist_embed_apply)


def read_remap(path: str | None, log) -> dict[str, str] | None:
    if not path:
        return None
    try:
        remap: dict[str, str] = {}
        with open(path) as f:
            header = f.readline().rstrip("\n").split("\t")
            i_l = header.index("label")
            i_n = header.index("new_label")
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) > max(i_l, i_n):
                    remap[parts[i_l]] = parts[i_n]
        log.info(f"Remap loaded: {len(remap)} entries")
        return remap
    except Exception as e:  # reference warns and proceeds (query.py:102-104)
        log.warning(f"Could not read remap file {path}: {e}")
        return None


def read_embeddings_csv(path: str) -> tuple[list[str], np.ndarray]:
    names: list[str] = []
    rows: list[np.ndarray] = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            names.append(parts[0])
            rows.append(np.array(parts[1:], dtype=np.float32))
    return names, np.vstack(rows)


def query_func(
    features_folder: str,
    feature_files: list[str],
    model_dir: str,
    classes_dir: str,
    seed: int,
    output_dir: str,
    remap_path: str | None = None,
    block_size: int = defaults.DEFAULT_BLOCK_SZ,
) -> list[str]:
    from .classify import read_classes_out

    since = time.time()
    log = make_run_logger(output_dir, "query_run.log")
    try:
        log.info("\n==> Input arguments...\n")
        log.info(f"Query directory: {features_folder}")
        log.info(f"Model directory: {model_dir}")
        log.info(f"Class information: {classes_dir}")
        log.info(f"Seed: {seed}")

        log.info("\n==> Querying...\n")
        assignments = read_classes_out(os.path.join(classes_dir, "classes.out"))
        present = {
            # removesuffix, NOT split('.kf'): a genome named 'x.kf2' would
            # otherwise truncate to 'x' and be silently dropped from querying
            os.path.basename(p).removesuffix(".kf") for p in feature_files
        } | {
            _npy_stem(os.path.basename(p)) for p in feature_files
        }
        assignments = [(g, c) for g, c in assignments if g in present]
        clades = sorted({c for _, c in assignments})
        log.info(f"Total subtrees to query: {len(clades)}")

        remap = read_remap(remap_path, log)
        written: list[str] = []
        from .cache import cached_checkpoint, cached_embeddings, cached_query_matrix

        # shared device-resident feature matrix (one transfer for the
        # classify AND query passes; per-clade blocks become on-device
        # gathers by tiny int32 index vectors). None -> per-block host path.
        qmat = cached_query_matrix(feature_files)

        # three-stage pipeline (reference query.py:148-189 runs
        # read -> forward -> format strictly serially): a background thread
        # parses block z+1 while the device runs block z, and block z-1 is
        # formatted/written BETWEEN dispatching z and fetching z — JAX
        # dispatch is async, so the host text work overlaps the device
        # forward+cdist instead of serializing. The pending block carries
        # ACROSS clades too (round 5): the common placement shape is many
        # subtrees x one small block each, where per-clade draining turned
        # every fetch into a serial tunnel round trip (measured 770 ms of a
        # 840 ms warm 10-subtree placement) — overlapping each clade's fetch
        # with the next clade's dispatch leaves ~one RTT total.
        from collections import deque

        open_files: dict[int, tuple] = {}  # c -> (f_dist, f_emb)
        # in-flight dispatched blocks, written PIPE_DEPTH dispatches behind:
        # each entry's copy_to_host_async was issued at dispatch, so by the
        # time a block is written its D2H round trip has been overlapping
        # the newer blocks' dispatches — one RTT total instead of one per
        # block (items: (c, labels, fused_dev, real, e_dim, emb_names, last?))
        PIPE_DEPTH = 4
        pending: deque = deque()

        def _write_out(pend):
            c, labels, fused_dev, real, e_dim, emb_names, is_last = pend
            f_dist, f_emb = open_files[c]
            with phases.phase("fetch"):
                fused = np.asarray(fused_dev)
                outputs = fused[:real, :e_dim]
                # crop anchor columns: emb_dev rows are bucket-padded
                # (one compiled qstep per bucket, not per subtree)
                d = fused[:real, e_dim : e_dim + len(emb_names)]
            with phases.phase("format"):
                for lbl, drow in zip(labels, d):
                    f_dist.write(lbl + "\t" + f32_row(drow))
                for lbl, erow in zip(labels, outputs):
                    f_emb.write(lbl + "\t" + f32_row(erow))
            if is_last:
                f_dist.close()
                f_emb.close()
                del open_files[c]
                log.info(f"Wrote distance matrix: {f_dist.name}")
                log.info(f"Wrote embeddings: {f_emb.name}")
                log.info(f"\n==> Computation is completed for subtree {c}!\n")
                hrs, m, s = hms(time.time() - since)
                log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")

        try:
            for c in clades:
                contig_ids = [g for g, cl in assignments if cl == c]
                if not contig_ids:
                    continue
                log.info(
                    f"\n==> Working on subtree {c} ({len(contig_ids)} contigs)...\n"
                )

                # device-resident LRU: the ~76 MB subtree model and the
                # anchor matrix transfer once per process, not once per call
                # (the round-3 e2e regression was exactly this retransfer:
                # ~5.8 s of a 9.1 s serve was params crossing a 37 MB/s link)
                with phases.phase("model_load"):
                    model_name, meta, params = cached_checkpoint(
                        os.path.join(model_dir, f"model_subtree_{c}.ckpt")
                    )
                    emb_names, emb_dev = cached_embeddings(
                        os.path.join(model_dir, f"embeddings_subtree_{c}.csv")
                    )

                if model_name == "NeuralNetFSW":
                    from ..train.checkpoint import fsw_k_from_meta

                    k = fsw_k_from_meta(meta)
                    qstep = _QSTEP_FSW
                    loader = _npy_block_loader(features_folder, k)
                else:
                    qstep = _QSTEP_DENSE
                    loader = (
                        _kf_gather_loader(qmat)
                        if qmat is not None
                        else _kf_block_loader(features_folder)
                    )

                # embedding width for cropping the fused fetch: prefer the
                # meta key, but fall back to the fc2 shape — best-effort
                # torch-shim imports of reference checkpoints may carry only
                # the keys the reference save dict had (utils.py:358-371)
                e_dim = int(
                    meta.get("model_embedding_size")
                    or params["fc2"]["w"].shape[1]
                )
                dist_path = os.path.join(
                    output_dir, f"apples_input_di_mtrx_subtree_{c}.csv"
                )
                emb_path = os.path.join(output_dir, f"embedding_subtree_{c}.emb")
                f_dist = open(dist_path, "w")
                f_emb = open(emb_path, "w")
                open_files[c] = (f_dist, f_emb)
                f_dist.write("\t" + "\t".join(emb_names) + "\n")
                written += [dist_path, emb_path]

                def _blocks(ids=contig_ids, load=loader):
                    for z in range(0, len(ids), block_size):
                        with phases.phase("parse"):
                            blk = load(ids[z : z + block_size])
                        yield blk

                n_blocks = -(-len(contig_ids) // block_size)
                for i, (names, x) in enumerate(_prefetch_blocks(_blocks())):
                    real = len(names)
                    nb = bucket_items(real)
                    if nb > real and x.shape[0] == real:
                        # bucket the row count (like classify): otherwise the
                        # final partial block's distinct shape costs a fresh
                        # compile per distinct tail size across clades
                        # (the device-gather loader arrives pre-padded)
                        x = np.concatenate(
                            [x, np.zeros((nb - real,) + x.shape[1:], x.dtype)]
                        )
                    with phases.phase("dispatch"):
                        fused_dev = qstep(params, x, emb_dev)
                        # start the D2H copy NOW: by the time this block is
                        # written (after the next block/clade dispatches) the
                        # bytes are already host-side, so the fetch RTTs of
                        # successive blocks overlap instead of serializing
                        try:
                            fused_dev.copy_to_host_async()
                        except (AttributeError, NotImplementedError):
                            pass  # platform without async D2H: fetch blocks
                    phases.count("dispatches")
                    labels = [remap.get(n, n) for n in names] if remap else names
                    pending.append((
                        c, labels, fused_dev, real, e_dim, emb_names,
                        i == n_blocks - 1,
                    ))
                    if len(pending) > PIPE_DEPTH:
                        _write_out(pending.popleft())
            while pending:
                _write_out(pending.popleft())
        finally:
            # error path only (the success path drained above): close any
            # still-open outputs — the command failed, partial files are
            # expected, but leaked handles are not
            for f_dist, f_emb in open_files.values():
                f_dist.close()
                f_emb.close()
            open_files.clear()

        log.info("\n==> Computation Completed!\n")
        hrs, m, s = hms(time.time() - since)
        log.info(f"Total time: {hrs:02d}:{m:02d}:{s:02d}")
        return written
    finally:
        close_logger(log)


def _prefetch_blocks(blocks_iter, depth: int = 2):
    """Background-thread block prefetcher: host file parse for block z+1
    overlaps device compute for block z. Producer errors re-raise in the
    consumer; an abandoned consumer releases the worker thread."""
    from ..utils.prefetch import prefetch_iter

    return prefetch_iter(blocks_iter, depth=depth)


def _kf_gather_loader(qmat):
    """Block loader over the device-resident query matrix: rows for this
    block's contig ids are gathered ON DEVICE by an int32 index vector
    (already bucket-padded with row 0 — padded rows are cropped at fetch),
    so no feature bytes cross the host->device link per block."""
    import jax.numpy as jnp

    all_names, spans, dev = qmat

    def load(ids: list[str]):
        idx: list[int] = []
        names: list[str] = []
        for g in ids:
            span = spans.get(g)
            if span is None:
                raise FileNotFoundError(
                    f"{g}.kf was not in the cached query feature set"
                )
            start, stop = span
            idx.extend(range(start, stop))
            names.extend(all_names[start:stop])
        real = len(idx)
        nb = bucket_items(max(real, 1))
        x = jnp.take(
            dev, jnp.asarray(np.pad(np.asarray(idx, np.int32), (0, nb - real))), axis=0
        )
        return names, x

    return load


def _kf_block_loader(folder: str):
    def load(ids: list[str]):
        from .cache import read_kf_files_cached

        paths = [os.path.join(folder, f"{g}.kf") for g in ids]
        # host parse LRU: classify already parsed these same files this pass
        names, mat = read_kf_files_cached(paths, dtype=np.float32)
        return names, mat * np.float32(defaults.FEATURES_SCALER)

    return load


def _npy_block_loader(folder: str, k: int):
    # dense-capable k: N can never exceed the canonical vocab size, so pin
    # the padded point-set length to V — every subtree's query blocks then
    # share ONE compiled FSW forward (distinct per-subtree max-N buckets
    # previously cost a ~30 s remote compile per subtree on compile-bound
    # rigs); zero-weight padding rows are exact no-ops in the embedding
    from ..kmer.vocab import canonical_vocab_size

    # k <= 9 (V <= 131,072): vocab-sized padding is cheap; beyond that the
    # vocab dwarfs realistic fragments and geometric buckets win
    n_fixed = canonical_vocab_size(k) if 1 <= k <= 9 else None

    def load(ids: list[str]):
        mats = []
        for g in ids:
            p = os.path.join(folder, f"{g}_k{k}.npy")
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"FSW distance model needs k-mer point sets, but {p} is missing. "
                    f"Run `kf2vec get_kmers -input_dir {folder} -output_dir {folder} -k {k}` "
                    f"on the query genomes first (process_query_data does this "
                    f"automatically when the library is FSW)."
                )
            mats.append(np.load(p).astype(np.float32))
        nf = n_fixed
        # vocab-size padding must not blow HBM for big -block at k=9
        # (4000 x 131072 x 10 f32 would be ~21 GB); fall back to the
        # geometric bucket when the padded block would exceed ~2 GB
        # (a full default block at k=7 is ~1.2 GB and keeps the pin)
        if nf is not None and bucket_items(len(ids)) * nf * (k + 1) * 4 > (2 << 30):
            nf = None
        return ids, pad_point_sets(mats, n_fixed=nf)

    return load


def _npy_stem(basename: str) -> str:
    from ..train.distance import _strip_npy_suffix

    return _strip_npy_suffix(basename)
