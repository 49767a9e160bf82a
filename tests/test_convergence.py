"""Convergence parity (SURVEY.md §7 gate 3: statistical parity, not
step-identical losses): a converged distance model must reproduce the true
patristic distances on the toy backbone — the quantity the reference's
distortions export approximates (its checked-in golden reaches 0.521 for the
true 0.5; we assert a tighter 10% band)."""

import glob
import os
import shutil

import numpy as np
import pytest

from kf2vecfsw_tpu.ingest import divide_tree, get_distances, get_frequencies
from kf2vecfsw_tpu.train.distance import train_model_set_func

TOY = "/root/reference/toy_example"


@pytest.mark.skipif(not os.path.isdir(TOY), reason="toy example unavailable")
def test_distance_model_converges_to_tree_distances(tmp_path):
    work = str(tmp_path)
    os.makedirs(f"{work}/kf")
    os.makedirs(f"{work}/models")
    get_frequencies(f"{TOY}/train_tree_fna", f"{work}/kf", k=7)
    shutil.copy(f"{TOY}/train_tree_newick/train_tree.nwk", f"{work}/train_tree.nwk")
    sub = divide_tree(f"{work}/train_tree.nwk", size=2)
    get_distances(f"{work}/train_tree.nwk", sub, mode="subtrees_only")

    kf_files = sorted(glob.glob(f"{work}/kf/*.kf"))
    train_model_set_func(
        f"{work}/kf", kf_files, sub, work, 400, 512, 128, 16, 1e-4, 3e-6, 2000,
        [0], 28, f"{work}/models", use_fsw=False, log_every=200,
    )

    lines = open(f"{work}/models/distortions_subtree_0.csv").read().splitlines()
    header = lines[0].split("\t")[1:]
    rows = {l.split("\t")[0]: np.array(l.split("\t")[1:], float) for l in lines[1:]}
    d2 = rows["G000830275"][header.index("G000402355")]
    # true patristic distance 0.5 (train_tree.nwk: 0.2 + 0.3)
    assert abs(d2 - 0.5) < 0.05, d2
