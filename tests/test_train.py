import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kf2vecfsw_tpu.models.mlp import (
    classifier_apply,
    classifier_specs,
    dist_embed_apply,
    dist_embed_specs,
    init_classifier,
    init_dist_embed,
)
from kf2vecfsw_tpu.ops.losses import weighted_sqrt_mse
from kf2vecfsw_tpu.ops.pairwise import pairwise_l2_exact
from kf2vecfsw_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from kf2vecfsw_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from kf2vecfsw_tpu.train.step import ClassifierEpochRunner, DistanceEpochRunner, adam_init


def _toy_problem(key, n=10, v=32, h=16, e=8):
    params = init_dist_embed(key, v, h, e)
    feats = jax.random.normal(key, (n, v))
    d = jnp.abs(jax.random.normal(key, (n, n)))
    d = d + d.T
    d = d.at[jnp.diag_indices(n)].set(0)
    return params, feats, d


def test_distance_runner_mesh_invariance():
    # all mesh shapes run inside ONE test so the (1,1) reference always
    # exists (a parametrize + function-attribute stash silently skipped the
    # comparison under -k filters or test shuffling)
    def losses_for(mesh_shape):
        mesh = make_mesh(*mesh_shape)
        key = jax.random.PRNGKey(0)
        params, feats, dist = _toy_problem(key)
        specs = dist_embed_specs(MODEL_AXIS)
        params = shard_params(params, specs, mesh)
        opt = adam_init(params)
        runner = DistanceEpochRunner(mesh, dist_embed_apply, specs, 10, 4)
        losses = []
        for e in range(10):
            params, opt, loss = runner.run_epoch(
                params, opt, feats, dist, jax.random.fold_in(key, e), 1e-3
            )
            losses.append(float(loss))
        return losses

    ref = losses_for((1, 1))
    assert ref[-1] < ref[0]
    for shape in [(8, 1), (4, 2)]:
        # losses must agree across mesh shapes up to float reduction-order
        # noise (sharding-invariant training semantics)
        assert np.allclose(losses_for(shape), ref, rtol=1e-2), shape


def test_single_batch_epoch_matches_manual_loss():
    # with B >= N there is one batch; the epoch loss must equal the direct
    # reference loss formula on the permuted batch
    mesh = make_mesh(1, 1)
    key = jax.random.PRNGKey(1)
    params, feats, dist = _toy_problem(key, n=6)
    specs = dist_embed_specs(MODEL_AXIS)
    runner = DistanceEpochRunner(mesh, dist_embed_apply, specs, 6, 16)
    opt = adam_init(params)
    ekey = jax.random.fold_in(key, 0)
    _, _, loss = runner.run_epoch(params, opt, feats, dist, ekey, 0.0)
    perm = np.asarray(jax.random.permutation(ekey, 6))
    emb = dist_embed_apply(params, feats[perm])
    manual = float(
        weighted_sqrt_mse(pairwise_l2_exact(emb), dist[np.ix_(perm, perm)])
    )
    assert np.isclose(float(loss), manual, rtol=1e-5)


def test_classifier_runner_learns():
    mesh = make_mesh(8, 1)
    key = jax.random.PRNGKey(2)
    n, v, h, c = 12, 32, 16, 3
    specs = classifier_specs(MODEL_AXIS)
    params = shard_params(init_classifier(key, v, h, c), specs, mesh)
    opt = adam_init(params)
    feats = jax.random.normal(key, (n, v))
    labels = jnp.array(np.arange(n) % c)
    runner = ClassifierEpochRunner(mesh, classifier_apply, specs, n, 4)
    acc = 0.0
    for e in range(60):
        params, opt, loss, acc = runner.run_epoch(
            params, opt, feats, labels, jax.random.fold_in(key, e), 1e-2
        )
    assert float(acc) == 1.0


def test_eval_loss_partition():
    mesh = make_mesh(1, 1)
    key = jax.random.PRNGKey(3)
    params, feats, dist = _toy_problem(key, n=8)
    specs = dist_embed_specs(MODEL_AXIS)
    runner = DistanceEpochRunner(mesh, dist_embed_apply, specs, 8, 4)
    ev = runner.eval_loss(params, feats, dist, [0, 2, 5])
    emb = dist_embed_apply(params, feats[jnp.array([0, 2, 5])])
    manual = float(
        weighted_sqrt_mse(pairwise_l2_exact(emb), dist[np.ix_([0, 2, 5], [0, 2, 5])])
    )
    assert np.isclose(ev, manual, rtol=1e-5)


def test_train_model_set_test_set_holdout(tmp_path):
    """-test_set excludes the listed genomes from training and logs a test
    loss per epoch (train_model_set.py:213-216,309-314,539-571)."""
    import glob
    import os

    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.train.distance import train_model_set_func
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(0)
    v, n = 32, 6
    names = [f"g{i}" for i in range(n)]
    kf_dir = tmp_path / "kf"
    out_dir = tmp_path / "models"
    kf_dir.mkdir()
    out_dir.mkdir()
    for name in names:
        vec = rng.random(v)
        write_kf(str(kf_dir / f"{name}.kf"), [(name, vec / vec.sum())])
    with open(tmp_path / "t.subtrees", "w") as f:
        f.write("genome clade\n")
        for name in names:
            f.write(f"{name} 0\n")
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(tmp_path / "t_subtree_0.di_mtrx"), names, d)
    with open(tmp_path / "holdout.txt", "w") as f:
        f.write("g5.kf\n")

    train_model_set_func(
        str(kf_dir), sorted(glob.glob(str(kf_dir / "*.kf"))), str(tmp_path / "t.subtrees"),
        str(tmp_path), 6, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28, str(out_dir),
        test_ids_path=str(tmp_path / "holdout.txt"), use_fsw=False, log_every=1,
    )
    log_file = sorted(glob.glob(str(out_dir / "train_model_*.log")))[0]
    text = open(log_file).read()
    assert "Number of Train Samples: 5" in text
    assert "Number of Test Samples: 1" in text
    assert "Test loss:" in text
    # embeddings still cover the FULL backbone incl. the held-out genome
    emb = open(out_dir / "embeddings_subtree_0.csv").read().splitlines()
    assert len(emb) == n and any(l.startswith("g5\t") for l in emb)


def test_train_model_set_save_interval_snapshots(tmp_path):
    """-save_interval writes model_epoch_{n}/ snapshots (epoch%interval==0
    plus the final epoch) and re-embeds each (train_model_set.py:507-519,
    646-683) — span boundaries must align so snapshots see the right params."""
    import glob
    import os

    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.train.distance import train_model_set_func
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(1)
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
        f.write("genome clade\n")
        for name in names:
            f.write(f"{name} 0\n")
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(tmp_path / "t_subtree_0.di_mtrx"), names, d)

    train_model_set_func(
        str(kf_dir), sorted(glob.glob(str(kf_dir / "*.kf"))), str(tmp_path / "t.subtrees"),
        str(tmp_path), 7, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28, str(out_dir),
        save_interval=3, use_fsw=False, log_every=10,
    )
    # snapshots at epochs 0, 3, 6 (0-based; epoch%3==0) and final epoch 6
    subdirs = sorted(
        d for d in os.listdir(out_dir) if d.startswith("model_epoch_")
    )
    assert subdirs == ["model_epoch_1", "model_epoch_4", "model_epoch_7"], subdirs
    for sub in subdirs:
        assert os.path.exists(out_dir / sub / "model_subtree_0.ckpt")
        assert os.path.exists(out_dir / sub / "embeddings_subtree_0.csv")


def test_checkpoint_roundtrip(tmp_path):
    key = jax.random.PRNGKey(4)
    params = init_dist_embed(key, 16, 8, 4)
    path = str(tmp_path / "model_subtree_0.ckpt")
    save_checkpoint(path, "NeuralNet", {"model_input_size": 16, "model_hidden_size_fc1": 8, "model_embedding_size": 4}, params)
    name, meta, loaded = load_checkpoint(path)
    assert name == "NeuralNet"
    assert meta["model_input_size"] == 16
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_torch_checkpoint_import(tmp_path):
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "ref.ckpt")
    sd = {
        "fc1.weight": torch.randn(8, 16),
        "fc1.bias": torch.randn(8),
        "fc2.weight": torch.randn(4, 8),
        "fc2.bias": torch.randn(4),
    }
    torch.save(
        {
            "model_name": "NeuralNet",
            "model_input_size": 16,
            "model_hidden_size_fc1": 8,
            "model_embedding_size": 4,
            "state_dict": sd,
        },
        path,
    )
    name, meta, params = load_checkpoint(path)
    assert name == "NeuralNet"
    assert params["fc1"]["w"].shape == (16, 8)
    # forward parity vs torch under imported weights (SURVEY.md §7 gate 3)
    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    ours = np.asarray(dist_embed_apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x)))
    with torch.no_grad():
        h = torch.relu(torch.from_numpy(x) @ sd["fc1.weight"].T + sd["fc1.bias"])
        ref = (h @ sd["fc2.weight"].T + sd["fc2.bias"]).numpy()
    assert np.allclose(ours, ref, atol=1e-5)


def test_fsw_runner_mesh_invariance_model_axis_sharded_sort():
    """FSW training over (1,1) / (8,1) / (4,2) / (2,4) meshes must produce
    the same losses: with slices sharded P(model, None) inside shard_map,
    each model shard sorts only its local (B, C/n_model, N) projection block
    — the sort is genuinely model-axis-sharded — and the psum after fc1
    reassembles the same math as the replicated run."""
    from kf2vecfsw_tpu.models.fsw import (
        fsw_dist_embed_apply,
        fsw_dist_embed_specs,
        init_fsw_dist_embed,
    )

    key = jax.random.PRNGKey(3)
    k, base_dim, fswout, H, E, n, npts = 3, 2, 16, 16, 8, 8, 12
    kmers = jax.random.randint(key, (n, npts, k), 0, 4).astype(jnp.float32)
    w = jax.random.uniform(jax.random.fold_in(key, 1), (n, npts, 1))
    feats = np.asarray(jnp.concatenate([kmers, w], axis=-1))
    d = np.abs(np.random.default_rng(0).normal(size=(n, n))).astype(np.float32)
    d = d + d.T
    np.fill_diagonal(d, 0)

    def losses_for(mesh_shape):
        mesh = make_mesh(*mesh_shape)
        params = init_fsw_dist_embed(key, k, base_dim, fswout, H, E)
        specs = fsw_dist_embed_specs(MODEL_AXIS)
        params = shard_params(params, specs, mesh)
        opt = adam_init(params)
        runner = DistanceEpochRunner(mesh, fsw_dist_embed_apply, specs, n, 4)
        losses = []
        for e in range(6):
            params, opt, loss = runner.run_epoch(
                params, opt, jnp.asarray(feats), jnp.asarray(d),
                jax.random.fold_in(key, e), 1e-3,
            )
            losses.append(float(loss))
        return losses

    ref = losses_for((1, 1))
    assert ref[-1] < ref[0]
    for shape in [(8, 1), (4, 2), (2, 4)]:
        assert np.allclose(losses_for(shape), ref, rtol=1e-2), shape


def test_fsw_shared_runner_matches_pergenome_and_meshes():
    """The shared-vocab FSW apply must reproduce the per-genome runner's
    epoch losses batch-for-batch (same seed -> same permutations), and be
    mesh-invariant incl. model-axis sharding (the captured vocab-digit
    constant must behave as replicated inside shard_map)."""
    from kf2vecfsw_tpu.ingest.kmers import point_sets_to_vocab_weights
    from kf2vecfsw_tpu.models.fsw import (
        fsw_dist_embed_apply,
        fsw_dist_embed_specs,
        init_fsw_dist_embed,
        make_fsw_shared_apply,
    )
    from kf2vecfsw_tpu.train.distance import pad_point_sets
    from tests.test_models import _rand_point_set_mats

    key = jax.random.PRNGKey(7)
    k, base_dim, fswout, H, E, n = 4, 2, 16, 16, 8, 8
    mats = _rand_point_set_mats(3, k, n, 90, 130)  # V(k=4)=136: near-full sets
    feats_pg = pad_point_sets(mats)
    W = point_sets_to_vocab_weights(mats, k)
    d = np.abs(np.random.default_rng(1).normal(size=(n, n))).astype(np.float32)
    d = d + d.T
    np.fill_diagonal(d, 0)

    def losses_for(apply_fn, feats, mesh_shape):
        mesh = make_mesh(*mesh_shape)
        specs = fsw_dist_embed_specs(MODEL_AXIS)
        params = shard_params(init_fsw_dist_embed(key, k, base_dim, fswout, H, E), specs, mesh)
        opt = adam_init(params)
        runner = DistanceEpochRunner(mesh, apply_fn, specs, n, 4)
        losses = []
        for e in range(5):
            params, opt, loss = runner.run_epoch(
                params, opt, jnp.asarray(feats), jnp.asarray(d),
                jax.random.fold_in(key, e), 1e-3,
            )
            losses.append(float(loss))
        return losses

    shared = make_fsw_shared_apply(k)
    ref = losses_for(fsw_dist_embed_apply, feats_pg, (1, 1))
    assert ref[-1] < ref[0]
    assert np.allclose(losses_for(shared, W, (1, 1)), ref, rtol=1e-3)
    for shape in [(8, 1), (2, 4)]:
        assert np.allclose(losses_for(shared, W, shape), ref, rtol=1e-2), shape
