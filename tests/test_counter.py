from collections import Counter

import numpy as np
import pytest

from kf2vecfsw_tpu.io.fasta import encode_bases
from kf2vecfsw_tpu.kernels.histogram import count_canonical_device
from kf2vecfsw_tpu.kmer.counter import (
    KmerCounter,
    concat_with_separators,
    count_canonical_numpy,
    count_canonical_sparse,
    window_codes_numpy,
)
from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_codes, codes_to_strings

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def brute_force(seq: str, k: int) -> Counter:
    c: Counter = Counter()
    for i in range(len(seq) - k + 1):
        w = seq[i : i + k].upper()
        if any(ch not in "ACGT" for ch in w):
            continue
        rc = "".join(COMP[ch] for ch in reversed(w))
        c[min(w, rc)] += 1
    return c


def hist_to_dict(hist: np.ndarray, k: int) -> dict:
    vc = canonical_vocab_codes(k)
    strs = codes_to_strings(vc, k)
    return {s: int(hist[c]) for s, c in zip(strs, vc) if hist[c] > 0}


@pytest.mark.parametrize("k", [2, 3, 5, 7, 8])
def test_numpy_counter_vs_brute_force(k):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGTNacgtn"), size=4000, p=[0.2, 0.2, 0.2, 0.2, 0.04, 0.04, 0.04, 0.04, 0.02, 0.02]))
    codes = encode_bases(seq.encode())
    hist = count_canonical_numpy(codes, k)
    assert hist_to_dict(hist, k) == dict(brute_force(seq, k))


def test_sparse_matches_dense():
    rng = np.random.default_rng(1)
    seq = rng.choice(list(b"ACGT"), size=3000).astype(np.uint8)
    codes = encode_bases(seq.tobytes())
    hist = count_canonical_numpy(codes, 7)
    u, cnt = count_canonical_sparse(codes, 7)
    nz = np.nonzero(hist)[0]
    assert np.array_equal(u, nz)
    assert np.array_equal(cnt, hist[nz])


def test_separators_block_straddling_windows():
    a = encode_bases(b"ACGTACG")
    b = encode_bases(b"TTTTTTT")
    joined = concat_with_separators([a, b], 4)
    hist = count_canonical_numpy(joined, 4)
    expected = count_canonical_numpy(a, 4) + count_canonical_numpy(b, 4)
    assert np.array_equal(hist, expected)


def test_short_sequence_and_all_invalid():
    assert count_canonical_numpy(encode_bases(b"AC"), 7).sum() == 0
    assert count_canonical_numpy(encode_bases(b"NNNNNNNNNN"), 7).sum() == 0
    canon, valid = window_codes_numpy(encode_bases(b"A"), 3)
    assert canon.size == 0 and valid.size == 0


def test_device_scatter_path_matches_numpy():
    # CPU backend in tests -> exercises the XLA scatter fallback + chunk seams
    rng = np.random.default_rng(2)
    seq = rng.choice(list(b"ACGTN"), size=100_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
    codes = encode_bases(seq.tobytes())
    for k in (5, 7):
        assert np.array_equal(count_canonical_device(codes, k), count_canonical_numpy(codes, k))


def test_pallas_interpret_matches_numpy():
    from kf2vecfsw_tpu.kernels import histogram as H

    rng = np.random.default_rng(3)
    seq = rng.choice(list(b"ACGTN"), size=30_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
    codes = encode_bases(seq.tobytes())
    ref = count_canonical_numpy(codes, 7)
    packed, inv_bits, _ = H.pack_2bit(H._pad_to_quantum(codes))
    got = np.asarray(H._count_jit_pallas(packed, inv_bits, 7, True)).reshape(-1)[: 4**7]
    assert np.array_equal(got.astype(np.int64), ref)


def test_async_batch_finalize_matches_numpy():
    # deployed counting pipeline: N genomes dispatched async, one batched
    # device->host fetch; also covers the multi-chunk on-device accumulation
    from kf2vecfsw_tpu.kernels.histogram import (
        count_canonical_device_async,
        finalize_device_counts_batch,
    )

    rng = np.random.default_rng(4)
    genomes = []
    for _ in range(3):
        seq = rng.choice(list(b"ACGTN"), size=60_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
        genomes.append(encode_bases(seq.tobytes()))
    k = 5
    accs = [count_canonical_device_async(g, k) for g in genomes]
    hists = finalize_device_counts_batch(accs, k)
    for g, h in zip(genomes, hists):
        assert np.array_equal(h, count_canonical_numpy(g, k))
    # single-element batch goes through the non-stacked path
    single = finalize_device_counts_batch([count_canonical_device_async(genomes[0], k)], k)
    assert np.array_equal(single[0], count_canonical_numpy(genomes[0], k))


def test_device_count_empty_input():
    # forced-device counting on an empty stream must return zeros, not assert
    assert np.array_equal(count_canonical_device(np.zeros(0, np.uint8), 5), np.zeros(4**5))


def test_feature_vector_rejects_k_beyond_vocab():
    from kf2vecfsw_tpu.kmer.counter import KmerCounter

    c = KmerCounter(14)
    with pytest.raises(ValueError, match="canonical vocabulary"):
        c.feature_vector([encode_bases(b"ACGTACGTACGTACGTACGT")])


def test_fastq_blank_header_token():
    import tempfile, os
    from kf2vecfsw_tpu.io.fasta import read_sequences_raw

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "q.fastq")
        with open(p, "wb") as f:
            f.write(b"@ \nACGT\n+\nIIII\n@r2\nTTTT\n+\nIIII\n")
        recs = read_sequences_raw(p)
        assert [r[0] for r in recs] == ["", "r2"]


def test_pack_unpack_roundtrip():
    from kf2vecfsw_tpu.kernels import histogram as H

    codes = encode_bases(b"ACGTNacgtNN-XA")
    packed, inv_bits, n = H.pack_2bit(codes)
    restored = np.asarray(H.unpack_2bit_xla(packed, inv_bits))[:n]
    assert np.array_equal(restored, codes)


def test_kmer_counter_feature_vector():
    counter = KmerCounter(7, backend="numpy")
    seqs = [encode_bases(b"ACGTACGTACGTACGTACGT")]
    vec = counter.feature_vector(seqs)
    assert vec.shape == (8192,)
    assert vec.sum() == 20 - 7 + 1


def test_batched_dispatch_interpret_matches_numpy(monkeypatch):
    """The multi-genome single-dispatch path (count_begin_batch +
    count_finish_batch) under forced pallas interpret mode: per-genome
    histograms from one (G, nbins) program match numpy exactly, including
    mixed genome lengths and the bucket padding."""
    monkeypatch.setenv("KF2VEC_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("KF2VEC_COUNT_BACKEND", "tpu")
    from kf2vecfsw_tpu.kmer.counter import KmerCounter

    rng = np.random.default_rng(6)
    k = 7
    seqs_batch = []
    for n in (250_000, 300_001, 271_337):
        seq = rng.choice(list(b"ACGTN"), size=n, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
        seqs_batch.append([encode_bases(seq.tobytes())])
    counter = KmerCounter(k)
    tokens = counter.count_begin_batch(seqs_batch)
    assert sum(1 for kind, _ in tokens if kind == "devbatch") == 3
    hists = counter.count_finish_batch(tokens)
    for seqs, h in zip(seqs_batch, hists):
        assert np.array_equal(h, count_canonical_numpy(seqs[0], k))


def test_batched_dispatch_mixed_host_and_device(monkeypatch):
    """Genomes below min_device_bases stay on the host path while the rest
    share one device dispatch; results are ordered correctly."""
    monkeypatch.setenv("KF2VEC_PALLAS_INTERPRET", "1")
    from kf2vecfsw_tpu.kmer.counter import KmerCounter

    rng = np.random.default_rng(7)
    k = 5
    big = [encode_bases(rng.choice(list(b"ACGT"), size=250_000).astype(np.uint8).tobytes())]
    small = [encode_bases(rng.choice(list(b"ACGT"), size=1_000).astype(np.uint8).tobytes())]
    counter = KmerCounter(k)
    # size-dependent device eligibility like auto mode on a TPU host (the
    # KF2VEC_COUNT_BACKEND=tpu override would force EVERY genome on-device)
    counter._use_device = lambda n_bases: n_bases >= 100_000
    tokens = counter.count_begin_batch([big, small, big])
    kinds = [kind for kind, _ in tokens]
    assert kinds[1] == "host" and kinds[0] in ("devbatch", "device")
    hists = counter.count_finish_batch(tokens)
    assert np.array_equal(hists[0], count_canonical_numpy(big[0], k))
    assert np.array_equal(hists[1], count_canonical_numpy(small[0], k))
    assert np.array_equal(hists[2], hists[0])


def test_sorted_device_path_matches_numpy():
    """The k-independent sorted counting path (sort + vocab-boundary
    searchsorted): exact parity with the numpy counter at k=5 and k=9,
    single-genome chunked AND batched dispatch."""
    from kf2vecfsw_tpu.kernels.histogram import (
        count_canonical_device_kfree_async,
        count_canonical_device_kfree_batch_async,
        finalize_device_counts_kfree,
    )
    from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_codes

    rng = np.random.default_rng(11)
    genomes = []
    for _ in range(3):
        seq = rng.choice(list(b"ACGTN"), size=50_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
        genomes.append(encode_bases(seq.tobytes()))
    for k in (5, 9):
        for g in genomes:
            dense = finalize_device_counts_kfree(
                count_canonical_device_kfree_async(g, k), k
            )
            assert np.array_equal(dense, count_canonical_numpy(g, k)), k
        acc = count_canonical_device_kfree_batch_async(genomes, k)
        vocab = canonical_vocab_codes(k)
        host = np.asarray(acc)
        for i, g in enumerate(genomes):
            ref = count_canonical_numpy(g, k)
            assert np.array_equal(host[i], ref[vocab]), (k, i)


def test_sorted_path_via_counter_tokens(monkeypatch):
    """KmerCounter routes k > max_device_k to the sorted path under forced
    tpu backend: count_begin/count_finish, the batched dispatch and the
    vocab-aligned feature_vector fast path all agree with numpy."""
    monkeypatch.setenv("KF2VEC_COUNT_BACKEND", "tpu")
    from kf2vecfsw_tpu.kmer.counter import KmerCounter, concat_with_separators
    from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_codes

    rng = np.random.default_rng(12)
    seqs = []
    for _ in range(3):
        seq = rng.choice(list(b"ACGTN"), size=30_000, p=[0.24, 0.26, 0.25, 0.24, 0.01]).astype(np.uint8)
        seqs.append(encode_bases(seq.tobytes()))
    k = 9
    counter = KmerCounter(k)
    assert counter.max_device_k < k  # the sorted path is the one engaged
    tok = counter.count_begin([seqs[0]])
    assert tok[0] == "device_kfree"
    ref = count_canonical_numpy(concat_with_separators([seqs[0]], k), k)
    assert np.array_equal(counter.count_finish(tok), ref)
    # batched: one devbatch_sorted dispatch for all three
    toks = counter.count_begin_batch([[s] for s in seqs])
    assert all(t[0] in ("devbatch_kfree", "device_kfree") for t in toks)
    hists = counter.count_finish_batch(toks)
    fvs = counter.feature_vector_finish_batch(toks)
    vocab = canonical_vocab_codes(k)
    for s, h, fv in zip(seqs, hists, fvs):
        r = count_canonical_numpy(concat_with_separators([s], k), k)
        assert np.array_equal(h, r)
        assert np.array_equal(fv, r[vocab].astype(np.float64))


def test_rank_table_inverts_vocab():
    """rank_table[vocab[i]] == i (the kfree path's vocab-order fold),
    non-canonical codes and the invalid sentinel map to V."""
    import numpy as np

    from kf2vecfsw_tpu.kernels.histogram import _rank_table_jit
    from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_codes, revcomp_codes

    for k in (3, 5, 7):
        table = np.asarray(_rank_table_jit(k))
        vocab = canonical_vocab_codes(k)
        v = vocab.size
        assert table.shape == (4**k + 1,)
        np.testing.assert_array_equal(table[vocab], np.arange(v))
        codes = np.arange(4**k)
        noncanon = codes[revcomp_codes(codes, k) < codes]
        assert np.all(table[noncanon] == v)
        assert table[-1] == v


def test_link_probe_subprocess_phases(monkeypatch):
    """The link-probe watchdog: parses the child's answer, enforces the
    init deadline on a silent child, and enforces the (shorter) transfer
    deadline after READY — killing the child by exact PID both ways."""
    import subprocess
    import sys
    import time

    import kf2vecfsw_tpu.kernels.histogram as H

    real_popen = subprocess.Popen
    child_code = {}

    def fake_popen(cmd, **kw):
        return real_popen([sys.executable, "-c", child_code["src"]], **kw)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)

    # happy path
    child_code["src"] = "print('KF2VEC_READY', flush=True); print('KF2VEC_LINK 123.5 2', flush=True)"
    assert H._probe_link_subprocess(100.0, 5.0) == (123.5, 2)

    # silent wedge before init: init deadline applies
    monkeypatch.setenv("KF2VEC_LINK_PROBE_INIT_TIMEOUT_S", "1")
    child_code["src"] = "import time; time.sleep(30)"
    t0 = time.perf_counter()
    assert H._probe_link_subprocess(100.0, 30.0) is None
    assert time.perf_counter() - t0 < 10

    # init answers, transfer wedges: the probe deadline applies
    child_code["src"] = "import time; print('KF2VEC_READY', flush=True); time.sleep(30)"
    monkeypatch.setenv("KF2VEC_LINK_PROBE_INIT_TIMEOUT_S", "20")
    t0 = time.perf_counter()
    assert H._probe_link_subprocess(100.0, 1.0) is None
    assert time.perf_counter() - t0 < 10

    # child dies without answering
    child_code["src"] = "pass"
    assert H._probe_link_subprocess(100.0, 5.0) is None
