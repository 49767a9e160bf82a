"""CLI-level tests: argument wiring and the wrapper commands
(main.py:971-1495 parity surface)."""

import os
import shutil

import numpy as np
import pytest

from kf2vecfsw_tpu.cli import build_parser, main

TOY = "/root/reference/toy_example"


def test_parser_has_all_reference_subcommands():
    parser = build_parser()
    sub = next(
        a for a in parser._actions if a.__class__.__name__ == "_SubParsersAction"
    )
    commands = set(sub.choices)
    expected = {
        "get_kmers", "get_frequencies", "divide_tree", "scale_tree",
        "get_distances", "train_classifier", "classify", "train_model_set",
        "query", "build_library", "process_query_data", "get_chunks",
        "train_model_set_chunks", "train_classifier_chunks",
        "get_secondary_classes",
    }
    assert expected <= commands


def test_defaults_match_reference():
    parser = build_parser()
    args = parser.parse_args(["train_model_set"])
    # main.py:80-101 constants
    assert args.e == 8000
    assert args.hidden_sz == 2048
    assert args.embed_sz == 1024
    assert args.batch_sz == 16
    assert args.lr == 1e-5
    assert args.lr_min == 3e-6
    assert args.lr_decay == 2000
    assert args.seed == 28
    assert args.fswout_dim == 512 and args.base_dim == 4
    args = parser.parse_args(["get_frequencies"])
    assert args.k == 7
    args = parser.parse_args(["divide_tree"])
    assert args.size == 850
    args = parser.parse_args(["classify"])
    assert args.block == 4000


def test_version_flag(capsys):
    with pytest.raises(SystemExit):
        main(["--version"])
    assert "kf2vec-tpu" in capsys.readouterr().out


@pytest.mark.skipif(not os.path.isdir(TOY), reason="toy example unavailable")
def test_wrapper_commands_end_to_end(tmp_path):
    """build_library + process_query_data on the toy example (tiny epochs)."""
    lib = tmp_path / "library"
    res = tmp_path / "results"
    lib.mkdir(), res.mkdir()
    tree = tmp_path / "train_tree.nwk"
    shutil.copy(os.path.join(TOY, "train_tree_newick", "train_tree.nwk"), tree)

    main([
        "build_library", "-input_dir", os.path.join(TOY, "train_tree_fna"),
        "-output_dir", str(lib), "-tree", str(tree), "-size", "2",
        "-mode", "subtrees_only", "-cl_epochs", "8", "-di_epochs", "6",
        "-cl_hidden_sz", "64", "-di_hidden_sz", "64", "-di_embed_sz", "16",
    ])
    assert (lib / "classifier_model.ckpt").exists()
    assert (lib / "model_subtree_0.ckpt").exists()
    assert (lib / "embeddings_subtree_1.csv").exists()

    main([
        "process_query_data", "-input_dir", os.path.join(TOY, "test_fna"),
        "-output_dir", str(res), "-classifier_model", str(lib),
        "-distance_model", str(lib),
    ])
    assert (res / "classes.out").exists()
    dist_files = [f for f in os.listdir(res) if f.startswith("apples_input_di_mtrx")]
    assert dist_files
    for f in dist_files:
        mat = open(res / f).read().splitlines()
        assert mat[0].startswith("\t")


def test_masked_classifier_roundtrip(tmp_path):
    """-mask training + classify on unmasked query .kf (the reference cannot
    run this combination: classify never re-applies the mask)."""
    import glob

    from kf2vecfsw_tpu.infer.classify import classify_func, read_classes_out
    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.train.classifier import train_classifier_func

    rng = np.random.default_rng(0)
    kf, models, out = tmp_path / "kf", tmp_path / "m", tmp_path / "o"
    for d in (kf, models, out):
        d.mkdir()
    names = ["a1", "a2", "b1", "b2"]
    for i, n in enumerate(names):
        v = rng.random(32)
        v[: 16] += 5.0 * (i % 2)  # separable classes
        write_kf(str(kf / f"{n}.kf"), [(n, v / v.sum())])
    sub = tmp_path / "t.subtrees"
    sub.write_text("genome clade\n" + "".join(f"{n} {i % 2}\n" for i, n in enumerate(names)))
    files = sorted(glob.glob(str(kf / "*.kf")))
    train_classifier_func(
        str(kf), files, str(sub), 30, 16, 2, 1e-2, 3e-6, 2000, 28, True,
        str(models), log_every=30,
    )
    classify_func(str(kf), files, str(models), 28, str(out))
    got = dict(read_classes_out(str(out / "classes.out")))
    assert got == {n: i % 2 for i, n in enumerate(names)}


def test_prefetch_blocks_releases_worker_on_abandon():
    """A consumer that stops iterating mid-stream must release the producer
    thread (it previously blocked forever in q.put holding parsed blocks)."""
    import threading
    import time as _time

    from kf2vecfsw_tpu.infer.query import _prefetch_blocks

    produced = []

    def blocks():
        for i in range(100):
            produced.append(i)
            yield i

    n0 = threading.active_count()
    gen = _prefetch_blocks(blocks(), depth=2)
    assert next(gen) == 0
    gen.close()  # abandon mid-stream (fires the generator's finally)
    deadline = _time.time() + 5.0
    while threading.active_count() > n0 and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() == n0, "prefetch worker thread leaked"
    assert len(produced) < 100  # the producer stopped early, not drained


def test_prefetch_propagates_producer_errors():
    """A producer that raises mid-stream must re-raise in the consumer (a
    bare worker thread previously died silently, hanging the training loop
    on q.get() forever)."""
    import pytest

    from kf2vecfsw_tpu.utils.prefetch import prefetch_iter

    def items():
        yield 1
        yield 2
        raise RuntimeError("producer boom")

    got = []
    with pytest.raises(RuntimeError, match="producer boom"):
        for x in prefetch_iter(items(), depth=2):
            got.append(x)
    assert got == [1, 2]


def test_classifier_rejects_noncontiguous_clade_ids():
    """Class ids ARE output column indices downstream; a hand-made
    .subtrees file with gapped/1-based ids must fail fast, not silently
    mistrain (out-of-range NLL gathers clip under jit)."""
    import pytest

    from kf2vecfsw_tpu.train.classifier import validate_class_labels

    assert validate_class_labels(np.array([0, 1, 1, 2])) == 3
    for bad in ([1, 2, 3], [0, 2], [0, -1, 1], []):
        with pytest.raises(ValueError, match="contiguous 0-based"):
            validate_class_labels(np.array(bad, dtype=np.int64))


def test_flag_surface_matches_reference_argparse():
    """Diff our per-subcommand flag sets against the REFERENCE's own
    argparse (imported with its unavailable deps stubbed): no reference
    flag may be missing; our only additions are -resume and
    -fsw_lazy_refresh."""
    import io
    import re
    import sys
    import types
    from contextlib import redirect_stdout

    if not os.path.exists("/root/reference/kf2vec/main.py"):
        pytest.skip("reference tree not available")

    def stub(name, attrs=()):
        mod = types.ModuleType(name)
        for a in attrs:
            setattr(mod, a, lambda *x, **k: None)
        sys.modules[name] = mod
        return mod

    saved_modules = dict(sys.modules)
    saved_path = list(sys.path)
    try:
        stub("treeswift", ["read_tree_newick"])
        sk = stub("sklearn")
        sk.metrics = stub("sklearn.metrics", ["accuracy_score"])
        stub("fswlib", ["FSWEmbedding"])
        sys.path.insert(0, "/root/reference")
        import kf2vec.main as ref_main

        subs = [
            "get_frequencies", "get_kmers", "divide_tree", "get_distances",
            "scale_tree", "train_classifier", "train_model_set", "classify",
            "query", "build_library", "process_query_data", "get_chunks",
            "train_classifier_chunks", "train_model_set_chunks",
        ]

        def flags_of(run, sub):
            buf = io.StringIO()
            argv = sys.argv
            sys.argv = ["kf2vec", sub, "-h"]
            try:
                with redirect_stdout(buf):
                    run()
            except SystemExit:
                pass
            finally:
                sys.argv = argv
            return set(re.findall(r"(?<![\w-])-([A-Za-z_]\w*)", buf.getvalue()))

        allowed_extra = {"resume", "fsw_lazy_refresh", "tc_single_cut"}
        for sub in subs:
            ref = flags_of(ref_main.main, sub)
            ours = flags_of(main, sub)
            missing = ref - ours
            extra = ours - ref - allowed_extra - {"h"}
            assert not missing, (sub, sorted(missing))
            assert not extra, (sub, sorted(extra))
    finally:
        sys.modules.clear()
        sys.modules.update(saved_modules)
        sys.path[:] = saved_path
