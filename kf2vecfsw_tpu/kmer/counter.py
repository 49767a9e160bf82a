"""Canonical k-mer counting engine (in-repo replacement for Jellyfish).

The reference shells out to ``jellyfish count -m k -C`` + ``jellyfish dump``
per input file (main.py:309-319). Semantics reproduced here:

- scan every record of the file; each length-k window containing only
  A/C/G/T (case-insensitive) contributes one count to its *canonical* k-mer
  (min of the k-mer and its reverse complement in A<C<G<T order),
- windows containing any other character are skipped,
- counts are reported over the sorted canonical vocabulary
  (see kmer/vocab.py), zeros included.

Three compute paths:
- numpy: vectorized shift/accumulate + bincount (host fallback, ground truth
  for tests),
- TPU: canonical window codes computed in jitted XLA, histogram via the
  Pallas dual-one-hot MXU kernel (kernels/histogram.py); multi-chip counting
  shards the window stream over a mesh and psums the (small) histogram,
- sparse (any k up to 31): np.unique over canonical codes, used by the FSW
  ``get_kmers`` path which only needs the present k-mers (main.py:112-184).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..io.fasta import INVALID
from .vocab import MAX_DENSE_K, canonical_vocab_codes


def window_codes_numpy(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Base-4 canonical window codes + validity mask (vectorized numpy).

    Returns (canon, valid) of length L-k+1 (empty if L < k).
    """
    codes = np.asarray(codes)
    n = codes.size - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool)
    b = codes.astype(np.int64)
    fwd = np.zeros(n, dtype=np.int64)
    rc = np.zeros(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for i in range(k):
        digit = b[i : i + n]
        fwd += digit << (2 * (k - 1 - i))
        rc += (3 - digit) << (2 * i)
        valid &= digit < INVALID
    # invalid digits (=4) corrupt fwd/rc but those windows are masked out
    canon = np.minimum(fwd, rc)
    return canon, valid


def count_canonical_numpy(codes: np.ndarray, k: int) -> np.ndarray:
    """Dense histogram over all 4^k codes; only canonical bins are nonzero."""
    if k > MAX_DENSE_K:
        raise ValueError(f"dense counting supports k <= {MAX_DENSE_K}")
    canon, valid = window_codes_numpy(codes, k)
    return np.bincount(canon[valid], minlength=4**k).astype(np.int64)


def count_canonical_sparse(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(unique canonical codes ascending, counts) — works for any k <= 31."""
    canon, valid = window_codes_numpy(codes, k)
    return np.unique(canon[valid], return_counts=True)


def concat_with_separators(seqs: list[np.ndarray], k: int) -> np.ndarray:
    """Concatenate encoded records with k-1 INVALID separators so windows
    never straddle record boundaries (matches per-record Jellyfish scans)."""
    if not seqs:
        return np.zeros(0, dtype=np.uint8)
    sep = np.full(k - 1, INVALID, dtype=np.uint8)
    parts: list[np.ndarray] = []
    for i, s in enumerate(seqs):
        if i:
            parts.append(sep)
        parts.append(np.asarray(s, dtype=np.uint8))
    return np.concatenate(parts)


@dataclass
class KmerCounter:
    """Counts canonical k-mers and folds to the vocab feature vector.

    backend: 'auto' | 'numpy' | 'native' | 'tpu'.
    'auto' picks the fastest available path: the multithreaded C++ rolling
    counter for small-to-medium k (its per-thread private histograms stay
    cache/RAM friendly up to k~11), the TPU Pallas kernel for large k or when
    the native library is unavailable, numpy as the last resort. Override
    with the env var KF2VEC_COUNT_BACKEND.
    """

    k: int
    backend: str = "auto"
    # below this many bases the device round-trip is not worth it
    min_device_bases: int = 200_000
    # above this k the native per-thread histograms stop paying off
    max_native_k: int = 11
    # above this k the MXU one-hot histogram's O(4^k) per-window work makes
    # it lose to the host counter (measured 312 genomes/s on-chip at k=7 vs
    # ~240/s/core host; cost quadruples per +1 k), so k > 7 uses the k-free
    # scatter-add device path instead (kernels/histogram.py)
    max_device_k: int = 7
    # auto backend's host window, set from measurement (r4, 5 Mb genome,
    # one host core vs v5e): the host's dense histogram is cache-resident
    # through k=10 (host 487/156 MB/s at k=9/10 vs the chip's ~77 scatter
    # floor) and falls off a cliff once 4^k u32 spills LLC — k=11 swings
    # 37-66 MB/s across runs (vs the chip's steady 52-53: a wash; ties go
    # to the host, which needs no link), then 12.4 / 4.8 at k=12/13 while
    # the chip's k-free rank fold stays near-flat (43.5 / 35.6). So auto
    # counts k <= 11 on the host and k >= 12 on the chip (chip/host-core
    # margin >= 1.7x at k=12 even at the host's best, ~7x at k=13).
    min_kfree_k: int = 12

    def __post_init__(self):
        self._vocab: np.ndarray | None = None

    @property
    def vocab(self) -> np.ndarray | None:
        """Canonical vocab codes, built lazily and cached: the sparse()
        path (get_kmers) never touches the vocab, and the eager build cost
        is real at large k (~800 MB of transients at k=13)."""
        if self._vocab is None and self.k <= MAX_DENSE_K:
            self._vocab = canonical_vocab_codes(self.k)
        return self._vocab

    # -- backend resolution -------------------------------------------------
    def _resolved_backend(self) -> str:
        b = os.environ.get("KF2VEC_COUNT_BACKEND", self.backend)
        if os.environ.get("KF2VEC_FORCE_NUMPY"):
            return "numpy"
        return b

    def _native(self):
        from ..io.native import lib as native_lib

        return native_lib.try_load()

    def _use_device(self, n_bases: int) -> bool:
        backend = self._resolved_backend()
        if backend in ("numpy", "native") or self.k > MAX_DENSE_K:
            return False
        if backend == "tpu":
            return True
        if n_bases < self.min_device_bases:
            return False
        if self.max_device_k < self.k < self.min_kfree_k:
            return False  # the host's cache-resident counter wins at k=8..9
        # with a real accelerator attached, the batched one-dispatch MXU path
        # beats the per-core host counter (~4.4 ms/5 Mb genome at k=7 on
        # chip) — IF the host->device link can feed it. Thin tunneled links
        # (tens of MB/s) bottleneck below the host counter's own speed, so
        # the auto backend probes the link bandwidth once per process.
        try:
            import jax

            if jax.default_backend() != "tpu":
                return False
            from ..kernels.histogram import link_bandwidth_mbps

            return link_bandwidth_mbps() >= 100.0
        except Exception:
            return False

    def _device_count(self, codes: np.ndarray) -> np.ndarray:
        if self.k > self.max_device_k:
            # k-free scatter-add path: the MXU one-hot histogram's
            # per-window cost is O(4^k) and loses catastrophically at
            # k >= 9 (23 MB/s at k=11); the dense scatter is flat in k
            from ..kernels.histogram import (
                count_canonical_device_kfree_async,
                finalize_device_counts_kfree,
            )

            return finalize_device_counts_kfree(
                count_canonical_device_kfree_async(codes, self.k), self.k
            )
        from ..kernels.histogram import count_canonical_device

        return count_canonical_device(codes, self.k)

    def _host_count(self, codes: np.ndarray) -> np.ndarray:
        """CPU path: native multithreaded counter if built, else numpy."""
        if self._resolved_backend() != "numpy":
            # KF2VEC_NO_NATIVE is honored inside try_load()
            native = self._native()
            if native is not None:
                return native.count_canonical(codes, self.k)
        return count_canonical_numpy(codes, self.k)

    # -- public API ----------------------------------------------------------
    def count(self, seqs: list[np.ndarray]) -> np.ndarray:
        """Dense histogram over 4^k for a list of encoded records."""
        codes = concat_with_separators(seqs, self.k)
        if self._use_device(codes.size):
            return self._device_count(codes)
        return self._host_count(codes)

    # async pipeline: begin() dispatches device work without syncing, so
    # several genomes can be in flight (transfer/compute/readback overlap);
    # finish() materializes the histogram
    def count_begin(self, seqs: list[np.ndarray]):
        codes = concat_with_separators(seqs, self.k)
        if self._use_device(codes.size) and self.k >= 4:
            if self.k > self.max_device_k:
                from ..kernels.histogram import count_canonical_device_kfree_async

                return ("device_kfree", count_canonical_device_kfree_async(codes, self.k))
            from ..kernels.histogram import count_canonical_device_async

            return ("device", count_canonical_device_async(codes, self.k))
        return ("host", self._host_count(codes))

    def count_begin_batch(self, seqs_batch: list[list[np.ndarray]]) -> list:
        """Batched begin: device-eligible genomes share ONE dispatch (one
        transfer pair + one kernel launch + later one fetch for the whole
        batch), which amortizes the per-call link/dispatch overheads that
        dominate the single-genome path on remote chips. Host-path genomes
        are counted individually as usual. Returns one token per genome, in
        order, for count_finish_batch."""
        from ..kernels.histogram import (
            MAX_BATCH_BASES,
            _bucket_bases,
            count_canonical_device_batch_async,
        )

        codes_all = [concat_with_separators(seqs, self.k) for seqs in seqs_batch]
        dev_idx = [
            i
            for i, c in enumerate(codes_all)
            if self.k >= 4 and c.size <= MAX_BATCH_BASES and self._use_device(c.size)
        ]
        tokens: list = [None] * len(codes_all)
        # group by length bucket: one mixed batch would pad EVERY genome to
        # the longest one's bucket, inflating transfer bytes on the thin
        # links this path is gated for (one dispatch per bucket instead)
        by_bucket: dict[int, list[int]] = {}
        for i in dev_idx:
            by_bucket.setdefault(_bucket_bases(codes_all[i].size), []).append(i)
        kfree_path = self.k > self.max_device_k  # k-independent scatter counting
        for group in by_bucket.values():
            if len(group) > 1:
                if kfree_path:
                    from ..kernels.histogram import count_canonical_device_kfree_batch_async

                    acc = count_canonical_device_kfree_batch_async(
                        [codes_all[i] for i in group], self.k
                    )
                    for slot, i in enumerate(group):
                        tokens[i] = ("devbatch_kfree", (acc, slot))
                else:
                    acc = count_canonical_device_batch_async(
                        [codes_all[i] for i in group], self.k
                    )
                    for slot, i in enumerate(group):
                        tokens[i] = ("devbatch", (acc, slot))
            else:
                i = group[0]
                tokens[i] = self._begin_single(codes_all[i])
        for i, c in enumerate(codes_all):
            if tokens[i] is None:
                if self._use_device(c.size) and self.k >= 4:
                    # device-eligible but too long for the batch bucket:
                    # chunked single-genome device path
                    tokens[i] = self._begin_single(c)
                else:
                    tokens[i] = ("host", self._host_count(c))
        return tokens

    def _begin_single(self, codes: np.ndarray):
        """Single-genome device token (MXU histogram or k-free path by k)."""
        if self.k > self.max_device_k:
            from ..kernels.histogram import count_canonical_device_kfree_async

            return ("device_kfree", count_canonical_device_kfree_async(codes, self.k))
        from ..kernels.histogram import count_canonical_device_async

        return ("device", count_canonical_device_async(codes, self.k))

    def count_finish(self, token) -> np.ndarray:
        kind, payload = token
        if kind == "device":
            from ..kernels.histogram import finalize_device_counts

            return finalize_device_counts(payload, self.k)
        if kind == "device_kfree":
            from ..kernels.histogram import finalize_device_counts_kfree

            return finalize_device_counts_kfree(payload, self.k)
        if kind == "devbatch_kfree":
            from ..kernels.histogram import finalize_device_counts_kfree

            acc, slot = payload
            return finalize_device_counts_kfree(acc[slot], self.k)
        if kind == "devbatch":
            from ..kernels.histogram import finalize_device_counts_batch_array

            acc, slot = payload
            return finalize_device_counts_batch_array(acc, self.k)[slot]
        return payload

    def count_finish_batch(self, tokens: list) -> list[np.ndarray]:
        """Finalize many in-flight counts; device histograms are fetched in
        ONE batched transfer (amortizing per-fetch link round-trip latency)."""
        results: list[np.ndarray | None] = [None] * len(tokens)
        dev_idx = [i for i, (kind, _) in enumerate(tokens) if kind == "device"]
        if dev_idx:
            from ..kernels.histogram import finalize_device_counts_batch

            fetched = finalize_device_counts_batch([tokens[i][1] for i in dev_idx], self.k)
            for i, h in zip(dev_idx, fetched):
                results[i] = h
        # batched-dispatch tokens: fetch each shared (G, nbins) array once
        batch_groups: dict[int, tuple] = {}
        for i, (kind, payload) in enumerate(tokens):
            if kind == "devbatch":
                acc, slot = payload
                batch_groups.setdefault(id(acc), (acc, []))[1].append((i, slot))
        if batch_groups:
            from ..kernels.histogram import finalize_device_counts_batch_array

            for acc, members in batch_groups.values():
                hists = finalize_device_counts_batch_array(acc, self.k)
                for i, slot in members:
                    results[i] = hists[slot]
        # k-free-path tokens: fetch vocab counts, densify on host
        kfree_vc = self._kfree_vocab_counts_batch(tokens)
        if kfree_vc:
            from ..kmer.vocab import canonical_vocab_codes

            vocab = canonical_vocab_codes(self.k)
            for i, vc in kfree_vc.items():
                dense = np.zeros(4**self.k, dtype=np.int64)
                dense[vocab] = vc.astype(np.int64)
                results[i] = dense
        for i, (kind, payload) in enumerate(tokens):
            if kind == "host":
                results[i] = payload
        return results  # type: ignore[return-value]

    def _kfree_vocab_counts_batch(self, tokens: list) -> dict[int, np.ndarray]:
        """Fetch all k-free-path tokens' (V,) vocab-aligned counts: batched
        accs are fetched once per shared array, singles in one stacked
        transfer when possible."""
        out: dict[int, np.ndarray] = {}
        singles = [i for i, (kind, _) in enumerate(tokens) if kind == "device_kfree"]
        if singles:
            if len(singles) == 1:
                out[singles[0]] = np.asarray(tokens[singles[0]][1])
            else:
                from ..kernels.histogram import _stack_jit

                host = np.asarray(_stack_jit(tuple(tokens[i][1] for i in singles)))
                for j, i in enumerate(singles):
                    out[i] = host[j]
        groups: dict[int, tuple] = {}
        for i, (kind, payload) in enumerate(tokens):
            if kind == "devbatch_kfree":
                acc, slot = payload
                groups.setdefault(id(acc), (acc, []))[1].append((i, slot))
        for acc, members in groups.values():
            host = np.asarray(acc)
            for i, slot in members:
                out[i] = host[slot]
        return out

    def _require_vocab(self) -> None:
        if self.vocab is None:
            raise ValueError(
                f"feature vectors need the canonical vocabulary, which exists "
                f"for k <= {MAX_DENSE_K} only (got k={self.k}); use sparse() "
                f"for larger k"
            )

    def feature_vector_finish(self, token) -> np.ndarray:
        self._require_vocab()
        kind = token[0]
        if kind in ("device_kfree", "devbatch_kfree"):
            # k-free-path counts are ALREADY in canonical-vocab order:
            # skip the densify + re-gather round trip
            vc = self._kfree_vocab_counts_batch([token])[0]
            return vc.astype(np.float64)
        return self.count_finish(token)[self.vocab].astype(np.float64)

    def feature_vector_finish_batch(self, tokens: list) -> list[np.ndarray]:
        self._require_vocab()
        kfree_vc = self._kfree_vocab_counts_batch(tokens)
        dense_tokens = [t for i, t in enumerate(tokens) if i not in kfree_vc]
        dense_iter = iter(self.count_finish_batch(dense_tokens))
        out: list[np.ndarray] = []
        for i, _ in enumerate(tokens):
            if i in kfree_vc:
                out.append(kfree_vc[i].astype(np.float64))
            else:
                out.append(next(dense_iter)[self.vocab].astype(np.float64))
        return out

    def feature_vector(self, seqs: list[np.ndarray]) -> np.ndarray:
        """Counts in canonical-vocab order (the `.kf` column order), float64."""
        self._require_vocab()
        hist = self.count(seqs)
        return hist[self.vocab].astype(np.float64)

    def sparse(self, seqs: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
        """(distinct canonical codes ascending, counts) — the get_kmers
        producer (main.py:112-184). For dense-capable k the fast histogram +
        nonzero is ~200x quicker than the sort-based np.unique path."""
        codes = concat_with_separators(seqs, self.k)
        # gate at k<=11 (32 MB transient): beyond that the dense histogram's
        # 4^k memory spike outweighs the win over the sort-based path
        if self.k <= min(MAX_DENSE_K, self.max_native_k):
            hist = self._host_count(codes)
            nz = np.nonzero(hist)[0]
            return nz, hist[nz]
        return count_canonical_sparse(codes, self.k)
