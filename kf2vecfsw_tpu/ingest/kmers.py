"""get_kmers: genome -> (N, k+1) float32 k-mer matrix for the FSW model.

Reference behavior (main.py:112-184): per *.fna file, list present canonical
k-mers (ATCG-only), encode bases with A=0, T=1, C=2, G=3, append the
normalized frequency as column k+1, save {name}_k{k}.npy (float32).

Row order here is ascending canonical code (the reference inherits
Jellyfish's hash order); the FSW embedding is a multiset function, so row
order is irrelevant downstream (models.py:60-68 consumes the rows as a
weighted point set).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..io.fasta import read_sequences
from ..kmer.counter import KmerCounter
from ..kmer.vocab import FSW_BASE_MAP, codes_to_digit_matrix


def kmer_matrix(counter: KmerCounter, seqs: list[np.ndarray]) -> np.ndarray | None:
    codes, counts = counter.sparse(seqs)
    if codes.size == 0:
        return None
    digits = codes_to_digit_matrix(codes, counter.k, FSW_BASE_MAP).astype(np.float32)
    freqs = (counts / counts.sum()).astype(np.float32)
    return np.column_stack((digits, freqs))


def point_sets_to_vocab_weights(mats: list[np.ndarray], k: int) -> np.ndarray:
    """(N_i, k+1) FSW matrices -> (n, V) canonical-vocab-aligned weights.

    Inverse of kmer_matrix's encoding: each row's reference-coded digits
    (A=0,T=1,C=2,G=3) are decoded back to the canonical base-4 code and the
    frequency lands in that code's vocab column; absent k-mers stay 0.
    Exact for the FSW embedding (zero-weight points are no-ops), enabling
    the shared-vocab fast path (models/fsw.py: fsw_embed_shared)."""
    from ..kmer.vocab import canonical_vocab_codes

    vocab = canonical_vocab_codes(k)
    inv = np.zeros(4, dtype=np.int64)
    inv[FSW_BASE_MAP] = np.arange(4)  # reference digit -> internal base
    W = np.zeros((len(mats), len(vocab)), dtype=np.float32)
    for i, m in enumerate(mats):
        digits = m[:, :k].astype(np.int64)
        # hand-made .npy rows may carry out-of-range digits: raise ValueError
        # (the trainer's documented fallback to the per-genome path catches
        # exactly that) instead of IndexError / silent negative-index aliasing
        if digits.size and (digits.min() < 0 or digits.max() > 3):
            raise ValueError("point-set rows contain out-of-range base digits")
        codes = np.zeros(len(m), dtype=np.int64)
        for j in range(k):
            codes = (codes << 2) | inv[digits[:, j]]
        idx = np.searchsorted(vocab, codes)
        if idx.size and not np.array_equal(vocab[np.minimum(idx, len(vocab) - 1)], codes):
            raise ValueError("point-set rows contain non-canonical k-mer codes")
        # duplicate rows of the same k-mer SUM (coincident atoms are exactly
        # one atom of combined mass under the quantile form's telescoping
        # sinc identity — the per-genome path treats them identically)
        np.add.at(W[i], idx, m[:, k])
    return W


def get_kmers(input_dir: str, output_dir: str, k: int = 7) -> list[str]:
    os.makedirs(output_dir, exist_ok=True)
    # all sequence formats get_frequencies accepts (the reference globbed
    # only *.fna, so .fasta/.fq query dirs silently produced nothing); stems
    # match the .kf sample_name convention so classes.out names line up
    from ..io.fasta import list_sequence_files, sample_name

    fasta_files = sorted(
        os.path.join(input_dir, f) for f in list_sequence_files(input_dir)
    )
    counter = KmerCounter(k)
    written: list[str] = []
    for fna_path in fasta_files:
        base_name = sample_name(os.path.basename(fna_path))
        print(f"--- Processing {base_name} ---")
        recs = read_sequences(fna_path)
        matrix = kmer_matrix(counter, [r.codes for r in recs])
        if matrix is None:
            print(f"Warning: No valid ATCG k-mers found in {base_name}")
            continue
        out_path = os.path.join(output_dir, f"{base_name}_k{k}.npy")
        np.save(out_path, matrix)
        print(f"Saved: {out_path} (Shape: {matrix.shape})")
        written.append(out_path)
    return written
