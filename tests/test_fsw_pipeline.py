"""FSW path end-to-end: get_kmers .npy -> NeuralNetFSW training -> query
(the reference could not query FSW models; we can — SURVEY.md §7 step 6)."""

import glob
import os
import shutil

import numpy as np
import pytest

from kf2vecfsw_tpu.infer.query import query_func
from kf2vecfsw_tpu.ingest import divide_tree, get_kmers
from kf2vecfsw_tpu.ingest.tree_ops import get_distances
from kf2vecfsw_tpu.train.distance import train_model_set_func

TOY = "/root/reference/toy_example"


@pytest.mark.skipif(not os.path.isdir(TOY), reason="toy example unavailable")
def test_fsw_train_and_query(tmp_path):
    work = str(tmp_path)
    npy_dir = os.path.join(work, "npy")
    models = os.path.join(work, "models")
    results = os.path.join(work, "results")
    testnpy = os.path.join(work, "testnpy")
    for d in (npy_dir, models, results, testnpy):
        os.makedirs(d)

    k = 5
    get_kmers(f"{TOY}/train_tree_fna", npy_dir, k=k)
    shutil.copy(f"{TOY}/train_tree_newick/train_tree.nwk", f"{work}/train_tree.nwk")
    sub = divide_tree(f"{work}/train_tree.nwk", size=2)
    get_distances(f"{work}/train_tree.nwk", sub, mode="subtrees_only")

    files = sorted(glob.glob(os.path.join(npy_dir, "*.npy")))
    saved = train_model_set_func(
        npy_dir, files, sub, work, 4, 32, 16, 16, 1e-4, 3e-6, 2000, [0], 28,
        models, use_fsw=True, base_dim=2, fswout_dim=24, log_every=2,
    )
    assert saved

    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint

    name, meta, params = load_checkpoint(os.path.join(models, "model_subtree_0.ckpt"))
    assert name == "NeuralNetFSW"
    assert meta["fsw_k"] == k

    # query: FSW models consume .npy query features
    get_kmers(f"{TOY}/test_fna", testnpy, k=k)
    with open(os.path.join(results, "classes.out"), "w") as f:
        f.write("genome\ttop_class\ttop_p\t0\t1\n")
        f.write("G000402355sub\t0.0\t0.9\t0.9\t0.1\n")
    qfiles = sorted(glob.glob(os.path.join(testnpy, "*.npy")))
    written = query_func(testnpy, qfiles, models, results, 28, results)
    dist_file = [w for w in written if "apples_input" in w][0]
    with open(dist_file) as f:
        header = f.readline().rstrip("\n").split("\t")
        row = f.readline().rstrip("\n").split("\t")
    assert row[0] == "G000402355sub"
    assert len(row) == len(header)
    vals = np.array(row[1:], dtype=float)
    assert np.all(np.isfinite(vals)) and np.all(vals >= 0)
