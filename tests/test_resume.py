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
    save_trainer_state(path, 41, params, opt, params, 0.123, 17)
    epoch, p2, o2, b2, lowest, best_epoch = load_trainer_state(path)
    assert epoch == 41 and best_epoch == 17 and np.isclose(lowest, 0.123)
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
