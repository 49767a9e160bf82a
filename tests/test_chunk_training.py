import glob
import os

import numpy as np
import pytest

from kf2vecfsw_tpu.io.kf import write_kf
from kf2vecfsw_tpu.train.chunks import (
    ChunkStore,
    train_classifier_chunks_func,
    train_model_set_chunks_func,
)
from kf2vecfsw_tpu.tree.distance import write_di_mtrx

V = 32  # k=3 vocab size


def _make_fixture(root):
    """3 'genomes' with chunked counts + full-genome .kf + subtrees + dists."""
    rng = np.random.default_rng(0)
    chunks_dir = os.path.join(root, "chunks")
    full_dir = os.path.join(root, "full")
    out_dir = os.path.join(root, "models")
    for d in (chunks_dir, full_dir, out_dir):
        os.makedirs(d, exist_ok=True)
    names = ["gA", "gB", "gC"]
    for name in names:
        c = int(rng.integers(6, 12))
        mat = rng.integers(0, 50, size=(c, V)).astype(np.float64)
        rows = [(f"{name}.part_c1.part_w{i}", mat[i]) for i in range(c)]
        write_kf(os.path.join(chunks_dir, f"{name}.kf"), rows)
        total = mat.sum(axis=0)
        write_kf(os.path.join(full_dir, f"{name}.kf"), [(name, total / total.sum())])
    sub_path = os.path.join(root, "t.subtrees")
    with open(sub_path, "w") as f:
        f.write("genome clade\n")
        for n in names:
            f.write(f"{n} 0\n")
    d = np.abs(rng.normal(size=(3, 3)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(os.path.join(root, "t_subtree_0.di_mtrx"), names, d)
    return chunks_dir, full_dir, out_dir, sub_path, names


def test_chunk_store_sampling():
    rng = np.random.default_rng(1)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        chunks_dir, *_ = _make_fixture(td)
        store = ChunkStore(sorted(glob.glob(os.path.join(chunks_dir, "*.kf"))))
        x = store.sample_batch(rng, [0, 1, 2], draws=2)
        assert x.shape == (6, V)
        # normalized to features_scaler
        assert np.allclose(x.sum(axis=1), 1e4, rtol=1e-4)


def test_chunk_store_cap():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "c"))
        write_kf(
            os.path.join(td, "c", "g.kf"),
            [("g.w0", np.full(V, 300.0)), ("g.w1", np.full(V, 10.0))],
        )
        store = ChunkStore([os.path.join(td, "c", "g.kf")], cap=True)
        assert store.matrices[0].dtype == np.uint8
        assert store.matrices[0].max() == 255


def test_chunked_distance_trainer(tmp_path):
    chunks_dir, full_dir, out_dir, sub_path, names = _make_fixture(str(tmp_path))
    files = sorted(glob.glob(os.path.join(chunks_dir, "*.kf")))
    saved = train_model_set_chunks_func(
        chunks_dir, full_dir, files, sub_path, str(tmp_path), 6, 32, 8, 2,
        1e-3, 3e-6, 2000, None, 28, False, out_dir, log_every=3,
    )
    assert saved and os.path.exists(saved[0])
    assert os.path.exists(os.path.join(out_dir, "distortions_subtree_0.csv"))
    assert os.path.exists(os.path.join(out_dir, "embeddings_subtree_0.csv"))


def test_chunked_classifier_trainer(tmp_path):
    chunks_dir, full_dir, out_dir, sub_path, names = _make_fixture(str(tmp_path))
    # two clades for a 2-class problem
    with open(sub_path, "w") as f:
        f.write("genome clade\ngA 0\ngB 0\ngC 1\n")
    files = sorted(glob.glob(os.path.join(chunks_dir, "*.kf")))
    ckpt = train_classifier_chunks_func(
        chunks_dir, full_dir, files, sub_path, 8, 32, 2, 1e-3, 3e-6, 2000, 28,
        False, False, out_dir, log_every=4,
    )
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(out_dir, "backbone_classes.out"))


def test_chunk_store_uniform_sampler():
    import tempfile

    rng = np.random.default_rng(2)
    with tempfile.TemporaryDirectory() as td:
        chunks_dir, *_ = _make_fixture(td)
        store = ChunkStore(sorted(glob.glob(os.path.join(chunks_dir, "*.kf"))))
        x = store.sample_one_uniform(rng, 0)
        assert x.shape == (V,)
        assert np.isclose(x.sum(), 1e4, rtol=1e-4)
