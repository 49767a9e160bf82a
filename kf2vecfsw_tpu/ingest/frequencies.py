"""get_frequencies: genome -> canonical k-mer frequency `.kf` vector.

Replaces the reference's per-file Jellyfish subprocess pipeline
(main.py:250-373): count canonical k-mers over every record of each
FASTA/FASTQ file, optionally add a 0.5 pseudocount, normalize to sum 1
unless raw counts are requested, and write one `.kf` line per file.

The hot path runs in-process: the TPU Pallas histogram kernel (or numpy on
CPU-only hosts) replaces `jellyfish count -C`; file IO and base encoding are
overlapped with device compute via a reader thread pool.
"""

from __future__ import annotations

import os
import sys
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..io.fasta import list_sequence_files, read_sequences, sample_name
from ..io.kf import write_kf
from ..kmer.counter import KmerCounter


def _check_dir(path: str, what: str) -> None:
    if not os.path.exists(path):
        print(f"No such directory '{path}'", file=sys.stderr)
        raise SystemExit(1)


def _finalize_vec(vec: np.ndarray, pseudocount: bool, raw_cnt: bool, name: str = "") -> np.ndarray:
    if pseudocount:
        vec = vec + 0.5
    if not raw_cnt:
        if vec.sum() == 0:
            # all-N / too-short input: the normalized row will be all-NaN
            # (reference parity: pandas df/df.sum() does the same) — but warn
            # loudly so the poison is traceable to its source
            print(
                f"WARNING: no valid k-mers counted{f' for {name}' if name else ''}; "
                "writing an all-NaN .kf row",
                file=sys.stderr,
            )
        with np.errstate(invalid="ignore", divide="ignore"):
            vec = vec / vec.sum()
    return vec


def compute_kf_vector(
    counter: KmerCounter,
    seqs: list[np.ndarray],
    pseudocount: bool = False,
    raw_cnt: bool = False,
) -> np.ndarray:
    """Counts -> .kf value vector (float64), matching main.py:323-342."""
    return _finalize_vec(counter.feature_vector(seqs), pseudocount, raw_cnt)


def get_frequencies(
    input_dir: str,
    output_dir: str,
    k: int = 7,
    threads: int | None = None,
    pseudocount: bool = False,
    raw_cnt: bool = False,
    backend: str = "auto",
) -> list[str]:
    """Process every sequence file in input_dir into output_dir/{sample}.kf.

    Returns the list of written paths.
    """
    print(f"\n==> Starting k-mer counting for {input_dir}\n")
    _check_dir(input_dir, "input")
    _check_dir(output_dir, "output")

    files = list_sequence_files(input_dir)
    counter = KmerCounter(k, backend=backend)
    threads = threads or min(8, os.cpu_count() or 1)
    written: list[str] = []

    def load(fname: str):
        recs = read_sequences(os.path.join(input_dir, fname))
        return fname, [r.codes for r in recs]

    # pipeline: threaded read+encode feeds the counter; MAX_INFLIGHT genomes
    # are dispatched as ONE batched device program (one transfer pair, one
    # kernel launch with a genome grid dimension, one device->host fetch for
    # the whole batch) — per-genome dispatch/fetch round trips would
    # otherwise dominate on remote/tunneled chips
    MAX_INFLIGHT = 16

    inflight: list = []

    def drain_all():
        batch, inflight[:] = list(inflight), []
        if not batch:
            return
        tokens = counter.count_begin_batch([seqs for _, seqs in batch])
        vecs = counter.feature_vector_finish_batch(tokens)
        for (fname, _), counts in zip(batch, vecs):
            name = sample_name(fname)
            vec = _finalize_vec(counts, pseudocount, raw_cnt, name=name)
            out_path = os.path.join(output_dir, f"{name}.kf")
            write_kf(out_path, [(name, vec)])
            written.append(out_path)

    # bounded reader window: Executor.map would submit ALL files eagerly and
    # buffer every loaded genome in memory while the consumer drains — the
    # window caps residency at ~(threads + MAX_INFLIGHT) genomes
    with ThreadPoolExecutor(max_workers=threads) as pool:
        pending = deque()
        it = iter(files)
        for fname in it:
            pending.append(pool.submit(load, fname))
            if len(pending) >= threads + MAX_INFLIGHT:
                break
        while pending:
            fname, seqs = pending.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.submit(load, nxt))
            inflight.append((fname, seqs))
            if len(inflight) >= MAX_INFLIGHT:
                drain_all()
        drain_all()

    print(f"\n==> Done processing {input_dir}")
    return written
