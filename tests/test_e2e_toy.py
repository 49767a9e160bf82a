"""End-to-end toy-example pipeline (SURVEY.md §7 minimum slice):
.kf build -> divide/distances -> classifier train -> distance-model train ->
classify -> query, asserting reference-compatible artifacts."""

import glob
import os
import shutil

import numpy as np
import pytest

from kf2vecfsw_tpu.infer.classify import classify_func, read_classes_out
from kf2vecfsw_tpu.infer.query import query_func, read_embeddings_csv
from kf2vecfsw_tpu.infer.secondary import write_secondary_classes
from kf2vecfsw_tpu.ingest import divide_tree, get_distances, get_frequencies
from kf2vecfsw_tpu.train.classifier import train_classifier_func
from kf2vecfsw_tpu.train.distance import train_model_set_func


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    toy = "/root/reference/toy_example"
    if not os.path.isdir(toy):
        pytest.skip("reference toy example not available")
    work = str(tmp_path_factory.mktemp("e2e"))
    for d in ("kf", "models", "results", "testkf"):
        os.makedirs(os.path.join(work, d))

    get_frequencies(f"{toy}/train_tree_fna", f"{work}/kf", k=7)
    shutil.copy(f"{toy}/train_tree_newick/train_tree.nwk", f"{work}/train_tree.nwk")
    sub = divide_tree(f"{work}/train_tree.nwk", size=2)
    get_distances(f"{work}/train_tree.nwk", sub, mode="subtrees_only")

    kf_files = sorted(glob.glob(f"{work}/kf/*.kf"))
    train_classifier_func(
        f"{work}/kf", kf_files, sub, 60, 256, 16, 1e-4, 3e-6, 2000, 28, False,
        f"{work}/models", log_every=20,
    )
    train_model_set_func(
        f"{work}/kf", kf_files, sub, work, 40, 256, 64, 16, 1e-4, 3e-6, 2000,
        None, 28, f"{work}/models", use_fsw=False, log_every=20,
    )

    get_frequencies(f"{toy}/test_fna", f"{work}/testkf", k=7)
    test_files = sorted(glob.glob(f"{work}/testkf/*.kf"))
    classify_func(f"{work}/testkf", test_files, f"{work}/models", 28, f"{work}/results")
    query_func(
        f"{work}/testkf", test_files, f"{work}/models", f"{work}/results", 28,
        f"{work}/results",
    )
    return work


def test_backbone_self_classification(pipeline):
    rows = []
    with open(os.path.join(pipeline, "models", "backbone_classes.out")) as f:
        header = f.readline().split("\t")
        for line in f:
            rows.append(line.split("\t"))
    i_true = header.index("true_class")
    i_top = header.index("top_class")
    assert len(rows) == 4  # train_tree_fna genomes present in clades
    for r in rows:
        assert int(r[i_true]) == int(float(r[i_top]))


def test_classes_out_format_and_assignment(pipeline):
    path = os.path.join(pipeline, "results", "classes.out")
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
    assert header == ["genome", "top_class", "top_p", "0", "1"]
    assignments = dict(read_classes_out(path))
    # G000402355sub is a subset of clade-0 backbone G000402355
    assert assignments["G000402355sub"] == 0


def test_query_outputs(pipeline):
    results = os.path.join(pipeline, "results")
    dist_files = sorted(glob.glob(os.path.join(results, "apples_input_di_mtrx_subtree_*.csv")))
    assert dist_files
    for df in dist_files:
        with open(df) as f:
            header = f.readline().rstrip("\n").split("\t")
            assert header[0] == ""
            n_backbone = len(header) - 1
            for line in f:
                parts = line.rstrip("\n").split("\t")
                assert len(parts) == n_backbone + 1
                vals = np.array(parts[1:], dtype=float)
                assert np.all(vals >= 0)
                # clamped: nothing in (0, 1e-6)
                assert not np.any((vals > 0) & (vals < 1e-6))
        emb_file = df.replace("apples_input_di_mtrx_subtree_", "embedding_subtree_").replace(".csv", ".emb")
        assert os.path.exists(emb_file)


def test_query_remap_renames_output_labels(pipeline):
    """-remap renames query row labels in the APPLES matrices and .emb
    (reference query.py:96-104,160-163; TSV with label/new_label header)."""
    work = pipeline
    remap_path = os.path.join(work, "remap.tsv")
    with open(remap_path, "w") as f:
        f.write("label\tnew_label\n")
        f.write("G000402355sub\tRENAMED_A\n")
    out2 = os.path.join(work, "results_remap")
    os.makedirs(out2, exist_ok=True)
    test_files = sorted(glob.glob(f"{work}/testkf/*.kf"))
    query_func(
        f"{work}/testkf", test_files, f"{work}/models", f"{work}/results", 28,
        out2, remap_path=remap_path,
    )
    labels = []
    for df in sorted(glob.glob(os.path.join(out2, "apples_input_di_mtrx_subtree_*.csv"))):
        with open(df) as f:
            f.readline()
            labels += [line.split("\t", 1)[0] for line in f if line.strip()]
    assert "RENAMED_A" in labels
    assert "G000402355sub" not in labels
    # unmapped queries keep their names
    assert any(l != "RENAMED_A" for l in labels)


def test_distortions_consistent_with_embeddings(pipeline):
    models = os.path.join(pipeline, "models")
    names, emb = read_embeddings_csv(os.path.join(models, "embeddings_subtree_0.csv"))
    with open(os.path.join(models, "distortions_subtree_0.csv")) as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header[1:] == names
        dist_rows = [line.rstrip("\n").split("\t")[1:] for line in f]
    d = np.array(dist_rows, dtype=np.float64)
    ref = ((emb[:, None] - emb[None]) ** 2).sum(-1)
    ref[ref < 1e-6] = 0
    assert np.allclose(d, ref, rtol=1e-3, atol=1e-5)


def test_secondary_classes(pipeline):
    path = os.path.join(pipeline, "results", "classes.out")
    written = write_secondary_classes(path)
    assert any(w.endswith("classes_secondBest.out") for w in written)
    with open(written[0]) as f:
        header = f.readline().rstrip("\n").split("\t")
        row = f.readline().rstrip("\n").split("\t")
    i_top = header.index("top_class")
    # second best of a 2-class problem is the other class
    orig = dict(read_classes_out(path))
    assert int(float(row[i_top])) == 1 - orig[row[0]]


def test_training_converged(pipeline):
    logs = glob.glob(os.path.join(pipeline, "models", "train_classifier_*.log"))
    text = open(logs[0]).read()
    assert "Training Completed" in text
