"""Real multi-PROCESS training checks (VERDICT round-1 gap #1).

The 8-device virtual mesh elsewhere in the suite runs in ONE process; these
tests launch 2 separate Python processes under jax.distributed.initialize
(gloo CPU collectives, 4 virtual devices each) and require the shipped
training path to match a single-process run up to float reduction-order
noise — it fails outright if any data staging uses a process-local
device_put under a global sharding (the round-1 defect at
train/chunks.py:539).
"""

import numpy as np
import pytest

from kf2vecfsw_tpu.parallel.mp_check import launch


def test_two_process_training_matches_single_process():
    try:
        single = launch(1, local_devices=8)
        multi = launch(2, local_devices=4)
    except RuntimeError as e:
        if "gloo" in str(e).lower() or "collectives" in str(e).lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {e}")
        raise
    assert multi["num_processes"] == 2
    assert multi["global_devices"] == 8 == single["global_devices"]
    # cross-process psum (gloo) reduces in a different order than the
    # single-process collective: tolerance, not bit-equality
    assert np.allclose(multi["losses"], single["losses"], rtol=1e-2), (
        single["losses"],
        multi["losses"],
    )
    assert multi["best_epoch"] == single["best_epoch"]
    assert np.isfinite(multi["losses"]).all()


def test_two_process_chunked_trainer_sliced_ingest(tmp_path):
    """The chunked distance trainer over a 2-process mesh: each process
    ingests only its genome slice (process-sharded prefix store) and the
    trained checkpoint matches a single-process run of the same seed."""
    import glob
    import os

    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.parallel.mp_check import launch_chunks
    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(9)
    fixture = tmp_path / "fix"
    (fixture / "chunks").mkdir(parents=True)
    (fixture / "full").mkdir()
    names = [f"g{i}" for i in range(8)]
    for g in names:
        mat = rng.integers(0, 50, size=(6, 32)).astype(np.float64)
        write_kf(str(fixture / "chunks" / f"{g}.kf"),
                 [(f"{g}.part_{r}", mat[r]) for r in range(6)])
        fv = mat.sum(axis=0)
        write_kf(str(fixture / "full" / f"{g}.kf"), [(g, fv / fv.sum())])
    (fixture / "t.subtrees").write_text(
        "genome clade\n" + "".join(f"{g} 0\n" for g in names)
    )
    d = np.abs(rng.normal(size=(8, 8)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(fixture / "t_subtree_0.di_mtrx"), names, d)

    out1 = tmp_path / "o1"
    out2 = tmp_path / "o2"
    out1.mkdir(), out2.mkdir()
    try:
        launch_chunks(1, str(fixture), str(out1), local_devices=8)
        launch_chunks(2, str(fixture), str(out2), local_devices=4)
    except RuntimeError as e:
        if "collectives" in str(e).lower() or "gloo" in str(e).lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {e}")
        raise
    # sliced ingest actually engaged in the 2-process run
    logs = sorted(glob.glob(str(out2 / "train_model_*.log")))
    assert any("per-process genome slices" in open(l).read() for l in logs)
    _, meta1, p1 = load_checkpoint(str(out1 / "model_subtree_0.ckpt"))
    _, meta2, p2 = load_checkpoint(str(out2 / "model_subtree_0.ckpt"))
    assert meta1["best_epoch"] == meta2["best_epoch"]
    assert np.isclose(meta1["lowest_loss"], meta2["lowest_loss"], rtol=1e-2)
    import jax

    # Adam's rsqrt amplifies cross-process psum reduction-order noise on
    # near-zero second moments; the per-leaf check is therefore loose — the
    # sharp equalities above (best_epoch, lowest_loss) carry the parity
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-4)


def test_two_process_dense_classifier_trainer(tmp_path):
    """The dense classifier TRAINER (not just the runner) over a 2-process
    mesh: replicated host-padded staging, coordinator-only checkpoint and
    backbone_classes.out writes, result matches a single-process run."""
    import glob

    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.parallel.mp_check import launch_chunks
    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint

    rng = np.random.default_rng(13)
    fixture = tmp_path / "fix"
    (fixture / "kf").mkdir(parents=True)
    names = [f"g{i}" for i in range(6)]
    for n in names:
        v = rng.random(32)
        write_kf(str(fixture / "kf" / f"{n}.kf"), [(n, v / v.sum())])
    (fixture / "t.subtrees").write_text(
        "genome clade\n" + "".join(f"{n} {i % 2}\n" for i, n in enumerate(names))
    )
    out1 = tmp_path / "o1"
    out2 = tmp_path / "o2"
    out1.mkdir(), out2.mkdir()
    try:
        launch_chunks(1, str(fixture), str(out1), local_devices=8, mode="classifier")
        launch_chunks(2, str(fixture), str(out2), local_devices=4, mode="classifier")
    except RuntimeError as e:
        if "collectives" in str(e).lower() or "gloo" in str(e).lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {e}")
        raise
    _, m1, p1 = load_checkpoint(str(out1 / "classifier_model.ckpt"))
    _, m2, p2 = load_checkpoint(str(out2 / "classifier_model.ckpt"))
    assert m1["best_epoch"] == m2["best_epoch"]
    assert np.isclose(m1["lowest_loss"], m2["lowest_loss"], rtol=1e-2)
    import jax

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-4)
    # backbone_classes.out written exactly once (coordinator)
    assert (out2 / "backbone_classes.out").exists()


def test_two_process_sharded_counting(tmp_path):
    """Per-device partial histograms + psum across REAL processes: the
    multi-host analogue of sequence parallelism (SURVEY §2.3). Each process
    stages only its segment rows; counts must equal the numpy ground truth."""
    import json

    from kf2vecfsw_tpu.parallel.mp_check import launch_chunks

    out = tmp_path / "o"
    out.mkdir()
    fixture = tmp_path / "f"
    fixture.mkdir()
    try:
        launch_chunks(2, str(fixture), str(out), local_devices=4, mode="counting")
    except RuntimeError as e:
        if "collectives" in str(e).lower() or "gloo" in str(e).lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {e}")
        raise
    with open(out / "counting.json") as f:
        result = json.load(f)
    assert result["ok"]
    assert result["total"] > 0


def test_two_process_chunked_classifier_sliced_ingest(tmp_path):
    """The chunked CLASSIFIER trainer over a 2-process mesh with per-process
    sliced ingest: checkpoint matches a single-process run."""
    import glob

    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.parallel.mp_check import launch_chunks
    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint

    rng = np.random.default_rng(17)
    fixture = tmp_path / "fix"
    (fixture / "chunks").mkdir(parents=True)
    (fixture / "full").mkdir()
    names = [f"g{i}" for i in range(8)]
    for i, g in enumerate(names):
        mat = rng.integers(0, 50, size=(6, 32)).astype(np.float64)
        write_kf(str(fixture / "chunks" / f"{g}.kf"),
                 [(f"{g}.part_{r}", mat[r]) for r in range(6)])
        fv = mat.sum(axis=0)
        write_kf(str(fixture / "full" / f"{g}.kf"), [(g, fv / fv.sum())])
    (fixture / "t.subtrees").write_text(
        "genome clade\n" + "".join(f"{g} {i % 2}\n" for i, g in enumerate(names))
    )
    out1 = tmp_path / "o1"
    out2 = tmp_path / "o2"
    out1.mkdir(), out2.mkdir()
    try:
        launch_chunks(1, str(fixture), str(out1), local_devices=8, mode="chunks_classifier")
        launch_chunks(2, str(fixture), str(out2), local_devices=4, mode="chunks_classifier")
    except RuntimeError as e:
        if "collectives" in str(e).lower() or "gloo" in str(e).lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {e}")
        raise
    logs = sorted(glob.glob(str(out2 / "train_classifier_*.log")))
    assert any("per-process genome slices" in open(l).read() for l in logs)
    _, m1, p1 = load_checkpoint(str(out1 / "classifier_model.ckpt"))
    _, m2, p2 = load_checkpoint(str(out2 / "classifier_model.ckpt"))
    assert m1["best_epoch"] == m2["best_epoch"]
    assert np.isclose(m1["lowest_loss"], m2["lowest_loss"], rtol=1e-2)
    assert (out2 / "backbone_classes.out").exists()


def _dense_fixture(tmp_path, n=8, v=32, seed=19):
    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(seed)
    fixture = tmp_path / "fix"
    (fixture / "kf").mkdir(parents=True)
    names = [f"g{i}" for i in range(n)]
    for g in names:
        val = rng.random(v)
        write_kf(str(fixture / "kf" / f"{g}.kf"), [(g, val / val.sum())])
    (fixture / "t.subtrees").write_text(
        "genome clade\n" + "".join(f"{g} 0\n" for g in names)
    )
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(fixture / "t_subtree_0.di_mtrx"), names, d)
    return fixture


def _run_both(tmp_path, fixture, mode, ckpt="model_subtree_0.ckpt"):
    from kf2vecfsw_tpu.parallel.mp_check import launch_chunks
    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint

    out1 = tmp_path / "o1"
    out2 = tmp_path / "o2"
    out1.mkdir(), out2.mkdir()
    try:
        launch_chunks(1, str(fixture), str(out1), local_devices=8, mode=mode)
        launch_chunks(2, str(fixture), str(out2), local_devices=4, mode=mode)
    except RuntimeError as e:
        if "collectives" in str(e).lower() or "gloo" in str(e).lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {e}")
        raise
    _, m1, p1 = load_checkpoint(str(out1 / ckpt))
    _, m2, p2 = load_checkpoint(str(out2 / ckpt))
    assert m1["best_epoch"] == m2["best_epoch"]
    assert np.isclose(m1["lowest_loss"], m2["lowest_loss"], rtol=1e-2)
    import jax

    # biases ride noise-dominated gradients where Adam's rsqrt amplifies
    # cross-process psum reduction order into near-max (lr-sized) steps of
    # arbitrary sign — measured ~0.012 drift over 8 epochs vs 1e-7 on the
    # weights; the sharp equalities above carry the parity
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)
    return out1, out2


def test_two_process_dense_distance_trainer(tmp_path):
    """The flagship dense distance trainer (train_model_set_func itself,
    train_model_set.py:96 equivalent) over a real 2-process mesh."""
    fixture = _dense_fixture(tmp_path)
    out1, out2 = _run_both(tmp_path, fixture, "distance")
    # coordinator wrote the per-clade embeddings exactly once
    assert (out2 / "embeddings_subtree_0.csv").exists()


def test_two_process_fsw_trainer(tmp_path):
    """The FSW family (NeuralNetFSW: lookup -> batched-sort FSW embedding ->
    MLP) trained under a real 2-process mesh."""
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(23)
    fixture = tmp_path / "fix"
    (fixture / "npy").mkdir(parents=True)
    names = [f"g{i}" for i in range(8)]
    k, npts = 3, 16
    for g in names:
        kmers = rng.integers(0, 4, size=(npts, k)).astype(np.float32)
        freqs = rng.random((npts, 1)).astype(np.float32)
        freqs /= freqs.sum()
        np.save(str(fixture / "npy" / f"{g}_k{k}.npy"), np.hstack([kmers, freqs]))
    (fixture / "t.subtrees").write_text(
        "genome clade\n" + "".join(f"{g} 0\n" for g in names)
    )
    d = np.abs(rng.normal(size=(8, 8)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(fixture / "t_subtree_0.di_mtrx"), names, d)
    _run_both(tmp_path, fixture, "fsw")


def test_two_process_fsw_lazy_trainer(tmp_path):
    """The lazy sort-refresh FSW runner (train/fsw_lazy.py, block-structured
    refresh spans) under a real 2-process mesh: canonical full-vocab point
    sets so the shared-vocab path engages and -fsw_lazy_refresh applies."""
    from kf2vecfsw_tpu.kmer.vocab import (
        FSW_BASE_MAP,
        canonical_vocab_codes,
        codes_to_digit_matrix,
    )
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(29)
    fixture = tmp_path / "fix"
    (fixture / "npy").mkdir(parents=True)
    names = [f"g{i}" for i in range(8)]
    k = 3
    digits = codes_to_digit_matrix(canonical_vocab_codes(k), k, FSW_BASE_MAP).astype(
        np.float32
    )
    for g in names:
        freqs = rng.random((digits.shape[0], 1)).astype(np.float32)
        np.save(str(fixture / "npy" / f"{g}_k{k}.npy"), np.hstack([digits, freqs]))
    (fixture / "t.subtrees").write_text(
        "genome clade\n" + "".join(f"{g} 0\n" for g in names)
    )
    d = np.abs(rng.normal(size=(8, 8)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(fixture / "t_subtree_0.di_mtrx"), names, d)
    out1, _ = _run_both(tmp_path, fixture, "fsw_lazy")
    # the lazy runner actually engaged (log line from train/distance.py)
    logs = list(out1.glob("train_model_*.log"))
    assert any("lazy sort-refresh" in p.read_text() for p in logs)


def test_two_process_kill_and_resume(tmp_path):
    """Multi-process kill-mid-run + -resume: 2 processes train 8 epochs with
    autosaves, 'crash', then resume to 12; the final checkpoint must match
    an uninterrupted single-process 12-epoch run (also exercises the
    cross-process restored-epoch agreement guard in train/resume.py)."""
    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.parallel.mp_check import launch_chunks
    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint
    from kf2vecfsw_tpu.train.classifier import train_classifier_func
    from kf2vecfsw_tpu.parallel.mesh import make_mesh
    import glob
    import os

    rng = np.random.default_rng(29)
    fixture = tmp_path / "fix"
    (fixture / "kf").mkdir(parents=True)
    names = [f"g{i}" for i in range(6)]
    for i, g in enumerate(names):
        v = rng.random(32)
        write_kf(str(fixture / "kf" / f"{g}.kf"), [(g, v / v.sum())])
    (fixture / "t.subtrees").write_text(
        "genome clade\n" + "".join(f"{g} {i % 2}\n" for i, g in enumerate(names))
    )
    out2 = tmp_path / "o2"
    out2.mkdir()
    try:
        launch_chunks(2, str(fixture), str(out2), local_devices=4, mode="resume")
    except RuntimeError as e:
        if "collectives" in str(e).lower() or "gloo" in str(e).lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {e}")
        raise
    # uninterrupted single-process reference (same seed, 12 epochs) in-process
    out1 = tmp_path / "o1"
    out1.mkdir()
    files = sorted(glob.glob(str(fixture / "kf" / "*.kf")))
    train_classifier_func(str(fixture / "kf"), files, str(fixture / "t.subtrees"),
                          12, 16, 4, 1e-3, 3e-6, 2000, 28, False, str(out1),
                          log_every=10, autosave_every=4)
    _, m1, p1 = load_checkpoint(str(out1 / "classifier_model.ckpt"))
    _, m2, p2 = load_checkpoint(str(out2 / "classifier_model.ckpt"))
    assert m1["best_epoch"] == m2["best_epoch"]
    assert np.isclose(m1["lowest_loss"], m2["lowest_loss"], rtol=1e-2)
    import jax

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-4)
