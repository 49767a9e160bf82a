"""get_chunks: genome -> per-10kb-window raw-count `.kf` rows.

Reimplements the reference's seqtk/awk/seqkit subprocess pipeline
(main.py:654-929) as one in-memory pass per genome:

1. squeeze runs of [Nn|] to a single N (the awk pre-pass, main.py:740-742),
2. remove gap characters '-', '.' (seqkit seq -g, main.py:753),
3. drop contigs shorter than chunk_sz (seqkit -m, main.py:753),
4. tile each contig with chunk_sz windows using the exact-tiling overlap
   formula (main.py:813-818): T = ceil(L/W), overlap = ceil((T*W - L)/(T-1)),
   step = W - overlap; windows are named {contig}_sliding__{start}-{end}
   (1-based inclusive, seqkit sliding ids with ':' -> '__', main.py:895-896),
5. count raw canonical k-mers per window (get_frequencies with raw_cnt=True,
   main.py:869-881) — computed here as one canonical-code pass per contig
   plus a bincount per window slice, instead of one Jellyfish subprocess per
   window file,
6. concatenate rows in genomic order into {sample}.kf; genomes with fewer
   than chunk_cnt_thr windows are dropped (main.py:845-860).

Row names match the reference: {sample}.part_{contig}.part_{window_id}.
"""

from __future__ import annotations

import math
import os
import re
import time

import numpy as np

from .. import defaults
from ..io.fasta import encode_bases, list_sequence_files, read_sequences_raw, sample_name
from ..io.kf import append_kf
from ..io.native import lib as native_lib
from ..kmer.counter import window_codes_numpy
from ..kmer.vocab import canonical_vocab_codes
from ..utils.timing import hms

_N_RUN = re.compile(rb"[N|n]+")


def _canonical_window_codes(codes: np.ndarray, k: int, trash: int) -> np.ndarray:
    """Canonical window codes with invalid windows sent to `trash`; native
    single pass when built, vectorized numpy otherwise."""
    native = native_lib.try_load()
    if native is not None:
        out = native.window_codes(codes, k, trash)
        if out is not None:
            return out
    canon, valid = window_codes_numpy(codes, k)
    return np.where(valid, canon, trash)


def clean_contig(seq: bytes) -> bytes:
    """awk N-squeeze then gap removal, in the reference's order."""
    seq = _N_RUN.sub(b"N", seq)
    return seq.replace(b"-", b"").replace(b".", b"").replace(b" ", b"")


def window_spans(length: int, window: int) -> list[tuple[int, int]]:
    """0-based [start, end) spans for seqkit-sliding-with-computed-overlap
    (main.py:813-825). Returns [] if length < window."""
    if length < window:
        return []
    total = math.ceil(length / window)
    if total != 1:
        overlap = int(math.ceil((total * window - length) / (total - 1)))
    else:
        overlap = 0
    step = window - overlap
    spans = []
    start = 0
    while start + window <= length:
        spans.append((start, start + window))
        start += step
    return spans


def chunk_rows_for_genome(
    sample: str,
    records: list[tuple[str, bytes]],
    k: int,
    window: int = defaults.CHUNK_SZ,
    pseudocount: bool = False,
) -> list[tuple[str, np.ndarray]]:
    """All (row_name, raw count vector) chunk rows for one genome, in genomic
    order. Empty list if no contig reaches the window size."""
    vocab = canonical_vocab_codes(k)
    nbins = 4**k
    rows: list[tuple[str, np.ndarray]] = []
    for contig_name, raw_seq in records:
        seq = clean_contig(raw_seq)
        if len(seq) < window:
            continue
        codes = encode_bases(seq)
        canon = _canonical_window_codes(codes, k, nbins)
        for start, end in window_spans(len(seq), window):
            n_kmers = end - start - k + 1
            hist = np.bincount(canon[start : start + n_kmers], minlength=nbins + 1)
            vec = hist[vocab].astype(np.float64)
            if pseudocount:
                vec = vec + 0.5
            window_id = f"{contig_name}_sliding__{start + 1}-{end}"
            rows.append((f"{sample}.part_{contig_name}.part_{window_id}", vec))
    return rows


def get_chunks(
    input_dir: str,
    output_dir: str,
    k: int = defaults.DEFAULT_K_LEN,
    threads: int | None = None,
    pseudocount: bool = False,
    window: int = defaults.CHUNK_SZ,
    min_chunks: int = defaults.CHUNK_CNT_THR,
) -> list[str]:
    since = time.time()
    for d in (input_dir, output_dir):
        if not os.path.exists(d):
            raise SystemExit(f"No such directory '{d}'")

    from ..utils.logging import close_logger, make_run_logger

    # make_run_logger: unique logger name (thread-safe reuse) + propagate
    # off (a configured root logger would double-print every line)
    log = make_run_logger(
        output_dir, f"get_chunks_{os.path.basename(os.path.normpath(input_dir))}.log"
    )

    def stamp(msg: str) -> None:
        hrs, mins, secs = hms(time.time() - since)
        log.info(f"{msg} Time: {hrs:02d}:{mins:02d}:{secs:02d}\n")

    stamp("\n==> Making a list of sample names.")
    files = list_sequence_files(input_dir)
    stamp("\n==> Start processing samples.")

    written: list[str] = []
    threads = threads or min(8, os.cpu_count() or 1)

    def process(fname: str):
        sample = sample_name(fname)
        records = read_sequences_raw(os.path.join(input_dir, fname))
        return fname, sample, chunk_rows_for_genome(sample, records, k, window, pseudocount)

    try:
        # genomes process in a bounded thread window (-p): the native
        # counting/formatting calls release the GIL, so multi-core hosts
        # overlap genomes; results are consumed in submission order
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            pending = deque()
            it = iter(files)
            for fname in it:
                pending.append(pool.submit(process, fname))
                if len(pending) >= threads + 2:
                    break
            while pending:
                fname, sample, rows = pending.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(process, nxt))
                log.info(f"\n==> Start processing. Sample: {fname}")
                if len(rows) == 0:
                    stamp(f"\n==> Excluded {fname}. No contigs above threshold length.")
                    continue
                if len(rows) < min_chunks:
                    stamp(
                        f"\n==> Excluded {fname}. {len(rows)} chunks is too low. "
                        f"{min_chunks} is required."
                    )
                    continue
                out_path = os.path.join(output_dir, f"{sample}.kf")
                with open(out_path, "w") as f:
                    for name, vec in rows:
                        append_kf(f, name, vec)
                written.append(out_path)
                stamp(f"\n==> Done chunk processing for {fname}.")
        stamp("\n==> Done getting chunks.")
    finally:
        close_logger(log)
    return written
