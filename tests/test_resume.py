import glob
import os

import numpy as np
import pytest

from kf2vecfsw_tpu.io.kf import write_kf
from kf2vecfsw_tpu.train.distance import train_model_set_func
from kf2vecfsw_tpu.train.resume import load_trainer_state, save_trainer_state
from kf2vecfsw_tpu.tree.distance import write_di_mtrx


def _fixture(root):
    rng = np.random.default_rng(0)
    kf_dir = os.path.join(root, "kf")
    out_dir = os.path.join(root, "models")
    os.makedirs(kf_dir), os.makedirs(out_dir)
    names = ["g1", "g2", "g3", "g4"]
    for n in names:
        v = rng.random(32)
        write_kf(os.path.join(kf_dir, f"{n}.kf"), [(n, v / v.sum())])
    sub = os.path.join(root, "t.subtrees")
    with open(sub, "w") as f:
        f.write("genome clade\n" + "".join(f"{n} 0\n" for n in names))
    d = np.abs(rng.normal(size=(4, 4)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(os.path.join(root, "t_subtree_0.di_mtrx"), names, d)
    return kf_dir, out_dir, sub


def test_trainer_state_roundtrip(tmp_path):
    import jax

    from kf2vecfsw_tpu.models.mlp import init_dist_embed
    from kf2vecfsw_tpu.train.step import adam_init

    params = init_dist_embed(jax.random.PRNGKey(0), 8, 4, 2)
    opt = adam_init(params)
    path = str(tmp_path / "state.ckpt")
    save_trainer_state(path, 41, params, opt, params, 0.123, 17, extra={"highest_acc": 0.5})
    epoch, p2, o2, b2, lowest, best_epoch, extra = load_trainer_state(path)
    assert epoch == 41 and best_epoch == 17 and np.isclose(lowest, 0.123)
    assert extra == {"highest_acc": 0.5}
    for a, b in zip(np.asarray(params["fc1"]["w"]), p2["fc1"]["w"]):
        assert np.array_equal(np.asarray(a), b)


def test_resume_continues_training(tmp_path):
    kf_dir, out_dir, sub = _fixture(str(tmp_path))
    files = sorted(glob.glob(os.path.join(kf_dir, "*.kf")))
    common = dict(
        use_fsw=False, log_every=10, autosave_every=5,
    )
    # phase 1: 10 epochs with autosave every 5
    train_model_set_func(
        kf_dir, files, sub, str(tmp_path), 10, 16, 8, 2, 1e-3, 3e-6, 2000,
        None, 28, out_dir, **common,
    )
    state_path = os.path.join(out_dir, "trainer_state_subtree_0.ckpt")
    assert os.path.exists(state_path)
    epoch0 = load_trainer_state(state_path)[0]
    assert epoch0 == 9
    # phase 2: resume to 14 epochs -> starts at 10
    train_model_set_func(
        kf_dir, files, sub, str(tmp_path), 14, 16, 8, 2, 1e-3, 3e-6, 2000,
        None, 28, out_dir, resume=True, **common,
    )
    logs = sorted(glob.glob(os.path.join(out_dir, "train_model_*.log")))
    text = open(logs[-1]).read()
    assert "Resuming from epoch 10" in text
    assert "Epoch [14/14]" in text
    assert "Epoch [1/14]" not in text


def test_resume_rejects_mismatched_architecture(tmp_path):
    """Resuming with different model-size flags must fail fast, not silently
    train mismatched params under lying checkpoint metadata."""
    import glob

    import numpy as np
    import pytest

    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.train.distance import train_model_set_func
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(0)
    v, n = 32, 4
    names = [f"g{i}" for i in range(n)]
    kf_dir = tmp_path / "kf"
    out_dir = tmp_path / "models"
    kf_dir.mkdir()
    out_dir.mkdir()
    for name in names:
        vec = rng.random(v)
        write_kf(str(kf_dir / f"{name}.kf"), [(name, vec / vec.sum())])
    with open(tmp_path / "t.subtrees", "w") as f:
        f.write("genome clade\n" + "".join(f"{x} 0\n" for x in names))
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(tmp_path / "t_subtree_0.di_mtrx"), names, d)
    files = sorted(glob.glob(str(kf_dir / "*.kf")))

    common = dict(
        features_folder=str(kf_dir), feature_files=files,
        clades_info=str(tmp_path / "t.subtrees"), true_dist_dir=str(tmp_path),
        num_epochs=4, embedding_size=8, batch_size=4, lr0=1e-3, lr_min=3e-6,
        lr_decay=2000, clades_to_train=None, seed=28,
        model_filepath=str(out_dir), use_fsw=False, autosave_every=2,
    )
    train_model_set_func(hidden_size=16, **common)
    with pytest.raises(SystemExit, match="cannot -resume"):
        train_model_set_func(hidden_size=24, resume=True, **common)


def _ckpt_equal(path_a, path_b):
    import jax

    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint

    name_a, meta_a, pa = load_checkpoint(path_a)
    name_b, meta_b, pb = load_checkpoint(path_b)
    assert name_a == name_b
    assert meta_a["best_epoch"] == meta_b["best_epoch"], (meta_a, meta_b)
    la, lb = jax.tree.leaves(pa), jax.tree.leaves(pb)
    assert len(la) == len(lb)
    return all(np.allclose(np.asarray(a), np.asarray(b), atol=1e-7) for a, b in zip(la, lb))


def test_classifier_resume_matches_uninterrupted(tmp_path):
    """Kill-after-epoch-N + -resume reproduces the uninterrupted classifier
    run bit-for-bit: device spans key every epoch's permutation by absolute
    epoch index, so the restart replays the identical schedule."""
    from kf2vecfsw_tpu.train.classifier import train_classifier_func

    rng = np.random.default_rng(3)
    kf_dir = tmp_path / "kf"
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    for d in (kf_dir, out_a, out_b):
        d.mkdir()
    names = [f"g{i}" for i in range(6)]
    for n in names:
        v = rng.random(32)
        write_kf(str(kf_dir / f"{n}.kf"), [(n, v / v.sum())])
    sub = tmp_path / "t.subtrees"
    sub.write_text("genome clade\n" + "".join(f"{n} {i % 2}\n" for i, n in enumerate(names)))
    files = sorted(glob.glob(str(kf_dir / "*.kf")))
    common = dict(log_every=10, autosave_every=5)

    # A: 14 epochs uninterrupted
    train_classifier_func(str(kf_dir), files, str(sub), 14, 16, 4, 1e-3, 3e-6,
                          2000, 28, False, str(out_a), **common)
    # B: 10 epochs ("crash"), then resume to 14
    train_classifier_func(str(kf_dir), files, str(sub), 10, 16, 4, 1e-3, 3e-6,
                          2000, 28, False, str(out_b), **common)
    assert os.path.exists(out_b / "trainer_state_classifier.ckpt")
    train_classifier_func(str(kf_dir), files, str(sub), 14, 16, 4, 1e-3, 3e-6,
                          2000, 28, False, str(out_b), resume=True, **common)
    assert _ckpt_equal(str(out_a / "classifier_model.ckpt"),
                       str(out_b / "classifier_model.ckpt"))


def _chunk_fixture(root, n=4, v=32, rows=6):
    rng = np.random.default_rng(5)
    chunks_dir = os.path.join(root, "chunks")
    full_dir = os.path.join(root, "full")
    os.makedirs(chunks_dir), os.makedirs(full_dir)
    names = [f"g{i}" for i in range(n)]
    for g in names:
        mat = rng.integers(0, 50, size=(rows, v)).astype(np.float64)
        write_kf(
            os.path.join(chunks_dir, f"{g}.kf"),
            [(f"{g}.part_c1_{r}", mat[r]) for r in range(rows)],
        )
        fv = mat.sum(axis=0)
        write_kf(os.path.join(full_dir, f"{g}.kf"), [(g, fv / fv.sum())])
    sub = os.path.join(root, "t.subtrees")
    with open(sub, "w") as f:
        f.write("genome clade\n" + "".join(f"{g} 0\n" for g in names))
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(os.path.join(root, "t_subtree_0.di_mtrx"), names, d)
    return chunks_dir, full_dir, sub, names


import pytest


@pytest.mark.parametrize("host_path", [False, True])
def test_chunked_distance_resume_matches_uninterrupted(tmp_path, monkeypatch, host_path):
    """Device store path AND host streaming path (budget forced to 0): both
    key sampling by absolute epoch, so kill+resume replays the exact stream."""
    from kf2vecfsw_tpu.train.chunks import train_model_set_chunks_func

    if host_path:
        monkeypatch.setenv("KF2VEC_CHUNK_DEVICE_BUDGET", "0")
    chunks_dir, full_dir, sub, _ = _chunk_fixture(str(tmp_path))
    files = sorted(glob.glob(os.path.join(chunks_dir, "*.kf")))
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    out_a.mkdir(), out_b.mkdir()
    common = dict(log_every=10, autosave_every=5)

    train_model_set_chunks_func(chunks_dir, full_dir, files, sub, str(tmp_path),
                                12, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28, False,
                                str(out_a), **common)
    train_model_set_chunks_func(chunks_dir, full_dir, files, sub, str(tmp_path),
                                8, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28, False,
                                str(out_b), **common)
    assert os.path.exists(out_b / "trainer_state_chunks_subtree_0.ckpt")
    train_model_set_chunks_func(chunks_dir, full_dir, files, sub, str(tmp_path),
                                12, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28, False,
                                str(out_b), resume=True, **common)
    assert _ckpt_equal(str(out_a / "model_subtree_0.ckpt"),
                       str(out_b / "model_subtree_0.ckpt"))


@pytest.mark.parametrize("host_path", [False, True])
def test_chunked_classifier_resume_matches_uninterrupted(tmp_path, monkeypatch, host_path):
    from kf2vecfsw_tpu.train.chunks import train_classifier_chunks_func

    if host_path:
        monkeypatch.setenv("KF2VEC_CHUNK_DEVICE_BUDGET", "0")
    chunks_dir, full_dir, sub, names = _chunk_fixture(str(tmp_path))
    # two clades so the classifier has something to separate
    with open(sub, "w") as f:
        f.write("genome clade\n" + "".join(f"{g} {i % 2}\n" for i, g in enumerate(names)))
    files = sorted(glob.glob(os.path.join(chunks_dir, "*.kf")))
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    out_a.mkdir(), out_b.mkdir()
    common = dict(log_every=10, autosave_every=5)

    train_classifier_chunks_func(chunks_dir, full_dir, files, sub, 12, 16, 4,
                                 1e-3, 3e-6, 2000, 28, False, False, str(out_a), **common)
    train_classifier_chunks_func(chunks_dir, full_dir, files, sub, 8, 16, 4,
                                 1e-3, 3e-6, 2000, 28, False, False, str(out_b), **common)
    assert os.path.exists(out_b / "trainer_state_chunks_classifier.ckpt")
    train_classifier_chunks_func(chunks_dir, full_dir, files, sub, 12, 16, 4,
                                 1e-3, 3e-6, 2000, 28, False, False, str(out_b),
                                 resume=True, **common)
    assert _ckpt_equal(str(out_a / "classifier_model.ckpt"),
                       str(out_b / "classifier_model.ckpt"))
