import os

import numpy as np
import pytest

from kf2vecfsw_tpu.ingest.chunks import chunk_rows_for_genome, clean_contig, get_chunks, window_spans
from kf2vecfsw_tpu.ingest.frequencies import get_frequencies
from kf2vecfsw_tpu.ingest.kmers import get_kmers
from kf2vecfsw_tpu.ingest.tree_ops import divide_tree, get_distances, read_subtrees, scale_tree
from kf2vecfsw_tpu.io.kf import read_kf


def test_window_spans_exact_tiling():
    # main.py:813-818 overlap formula: ceil(L/W) windows that tile [0, ~L]
    for length in [10000, 10001, 19999, 20000, 25000, 100003]:
        spans = window_spans(length, 10000)
        total = -(-length // 10000)
        assert len(spans) == total
        assert spans[0][0] == 0
        assert all(e - s == 10000 for s, e in spans)
        assert spans[-1][1] <= length
        # tiles cover contiguously (overlap >= 0 between consecutive windows)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 <= e1
    assert window_spans(9999, 10000) == []


def test_clean_contig():
    assert clean_contig(b"ACGTNNNNNACGT") == b"ACGTNACGT"
    assert clean_contig(b"AC-G.T nn|NN") == b"ACGTN"  # squeeze happens before gap removal


def test_chunk_rows_sum():
    rng = np.random.default_rng(0)
    seq = rng.choice(list(b"ACGT"), size=25000).astype(np.uint8).tobytes()
    rows = chunk_rows_for_genome("g", [("c1", seq)], k=7, window=10000)
    assert len(rows) == 3
    for name, vec in rows:
        assert name.startswith("g.part_c1.part_c1_sliding__")
        assert vec.sum() == 10000 - 7 + 1  # all windows fully valid


def test_get_chunks_golden_parity(toy, tmp_path):
    out = str(tmp_path)
    written = get_chunks(os.path.join(toy, "train_tree_fna"), out, k=7)
    golden_dir = os.path.join(toy, "train_tree_chunks")
    checked = 0
    for w in written:
        golden = os.path.join(golden_dir, os.path.basename(w))
        if not os.path.exists(golden):
            continue  # reference checked in only a subset of outputs
        ours = sorted(open(w).read().splitlines())
        ref = sorted(open(golden).read().splitlines())
        # row-level byte parity; whole-file order can differ for multi-contig
        # genomes because the reference concatenates in os.listdir order
        assert ours == ref
        checked += 1
    assert checked >= 3


def test_get_frequencies_normalized(toy, tmp_path):
    out = str(tmp_path)
    written = get_frequencies(os.path.join(toy, "test_fna"), out, k=7)
    assert len(written) == 3
    for w in written:
        names, mat = read_kf(w)
        assert mat.shape == (1, 8192)
        assert abs(mat.sum() - 1.0) < 1e-12
        assert names[0] == os.path.basename(w)[: -len(".kf")]


def test_get_frequencies_raw_and_pseudocount(tmp_path):
    fa = tmp_path / "in"
    out = tmp_path / "out"
    fa.mkdir(), out.mkdir()
    (fa / "s1.fna").write_text(">c1\nACGTACGTACGT\n")
    get_frequencies(str(fa), str(out), k=3, raw_cnt=True)
    _, mat = read_kf(str(out / "s1.kf"))
    assert mat.sum() == 10  # 12 - 3 + 1 windows
    get_frequencies(str(fa), str(out), k=3, raw_cnt=True, pseudocount=True)
    _, mat2 = read_kf(str(out / "s1.kf"))
    assert mat2.sum() == 10 + 0.5 * 32


def test_get_kmers_npy(toy, tmp_path):
    out = str(tmp_path)
    written = get_kmers(os.path.join(toy, "test_fna"), out, k=7)
    assert len(written) == 3
    m = np.load(written[0])
    assert m.dtype == np.float32
    assert m.shape[1] == 8
    assert np.all(m[:, :7] < 4) and np.all(m[:, :7] >= 0)
    assert abs(m[:, 7].sum() - 1.0) < 1e-5


def test_divide_and_distances_roundtrip(toy, tmp_path):
    import shutil

    nwk = tmp_path / "train_tree.nwk"
    shutil.copy(os.path.join(toy, "train_tree_newick", "train_tree.nwk"), nwk)
    sub_path = divide_tree(str(nwk), size=2)
    got = dict(read_subtrees(sub_path))
    golden = dict(read_subtrees(os.path.join(toy, "train_tree_newick", "train_tree.subtrees")))
    assert got == golden

    written = get_distances(str(nwk), sub_path, mode="subtrees_only")
    assert sorted(os.path.basename(w) for w in written) == [
        "train_tree_subtree_0.di_mtrx",
        "train_tree_subtree_1.di_mtrx",
    ]

    out = scale_tree(str(nwk), 100.0)
    assert os.path.basename(out) == "train_tree_r100.0.nwk"
    golden_nwk = open(
        os.path.join(toy, "train_tree_newick", "train_tree_r100.0.nwk")
    ).read().strip()
    assert open(out).read().strip() == golden_nwk


def test_get_distances_full_mode(toy, tmp_path):
    import shutil

    nwk = tmp_path / "train_tree.nwk"
    shutil.copy(os.path.join(toy, "train_tree_newick", "train_tree.nwk"), nwk)
    written = get_distances(str(nwk), None, mode="full_only")
    assert os.path.basename(written[0]) == "train_tree_full.di_mtrx"
    from kf2vecfsw_tpu.tree.distance import read_di_mtrx, reindex_matrix

    rl, cl, v = read_di_mtrx(written[0])
    gl_r, gl_c, gl_v = read_di_mtrx(
        os.path.join(toy, "train_tree_newick_single_clade", "train_tree_subtree_0.di_mtrx")
    )
    assert np.abs(reindex_matrix(rl, cl, v, rl) - reindex_matrix(gl_r, gl_c, gl_v, rl)).max() == 0.0


def test_get_frequencies_fastq_input(tmp_path):
    """FASTQ inputs count identically to the same sequences as FASTA
    (main.py:272 accepts .fq/.fastq)."""
    import numpy as np

    from kf2vecfsw_tpu.io.kf import read_kf

    fa_dir = tmp_path / "fa"
    fq_dir = tmp_path / "fq"
    out_a = tmp_path / "oa"
    out_q = tmp_path / "oq"
    for d in (fa_dir, fq_dir, out_a, out_q):
        d.mkdir()
    seqs = [b"ACGTACGTACGTNNACGTACGT", b"TTTTGGGGCCCCAAAA"]
    with open(fa_dir / "s.fna", "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b">r%d\n%s\n" % (i, s))
    with open(fq_dir / "s.fastq", "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
    get_frequencies(str(fa_dir), str(out_a), k=5)
    get_frequencies(str(fq_dir), str(out_q), k=5)
    _, ma = read_kf(str(out_a / "s.kf"))
    _, mq = read_kf(str(out_q / "s.kf"))
    assert np.array_equal(ma, mq)


def test_kf_byte_parity_train_goldens(toy, tmp_path):
    """Normalized .kf output is BYTE-identical to the reference's checked-in
    train_tree_kf goldens (main.py:344-357 float-repr formatting) — the
    driver's north-star parity metric, pinned as a regression lock."""
    out = str(tmp_path)
    written = get_frequencies(os.path.join(toy, "train_tree_fna"), out, k=7)
    checked = 0
    for w in written:
        golden = os.path.join(toy, "train_tree_kf", os.path.basename(w))
        if os.path.exists(golden):
            assert open(w, "rb").read() == open(golden, "rb").read(), w
            checked += 1
    assert checked >= 4


def test_kf_byte_parity_test_goldens(toy, tmp_path):
    """Query-side .kf parity vs toy_example/test_kf, across backends: the
    default (native) counter and the forced-numpy fallback must both emit
    byte-identical files."""
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    out_a.mkdir(), out_b.mkdir()
    written = get_frequencies(os.path.join(toy, "test_fna"), str(out_a), k=7)
    checked = 0
    for w in written:
        golden = os.path.join(toy, "test_kf", os.path.basename(w))
        if os.path.exists(golden):
            assert open(w, "rb").read() == open(golden, "rb").read(), w
            checked += 1
    assert checked >= 3
    os.environ["KF2VEC_FORCE_NUMPY"] = "1"
    try:
        written_np = get_frequencies(os.path.join(toy, "test_fna"), str(out_b), k=7)
    finally:
        del os.environ["KF2VEC_FORCE_NUMPY"]
    for w in written_np:
        golden = os.path.join(toy, "test_kf", os.path.basename(w))
        if os.path.exists(golden):
            assert open(w, "rb").read() == open(golden, "rb").read(), w


def test_kf_byte_parity_device_backend_interpret(toy, tmp_path, monkeypatch):
    """The DEVICE counting path (forced tpu backend, pallas interpret mode)
    emits byte-identical .kf goldens through get_frequencies — locks the
    batched-dispatch kernel's counts, bucket padding and vocab fold without
    TPU hardware (the real-chip equivalent is driven via the CLI)."""
    monkeypatch.setenv("KF2VEC_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("KF2VEC_COUNT_BACKEND", "tpu")
    out = str(tmp_path)
    written = get_frequencies(os.path.join(toy, "train_tree_fna"), out, k=7)
    checked = 0
    for w in written:
        golden = os.path.join(toy, "train_tree_kf", os.path.basename(w))
        if os.path.exists(golden):
            assert open(w, "rb").read() == open(golden, "rb").read(), w
            checked += 1
    assert checked >= 4
