import glob
import os

import numpy as np
import pytest

from kf2vecfsw_tpu.io.kf import write_kf
from kf2vecfsw_tpu.train.chunks import (
    ChunkStore,
    DeviceChunkStore,
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


def test_device_chunk_store_sampling():
    """Every device-sampled vector must be a normalized contiguous span sum
    (SURVEY §5 device-resident re-aggregation) with the Siamese 2-row layout."""
    import tempfile

    import jax

    with tempfile.TemporaryDirectory() as td:
        chunks_dir, *_ = _make_fixture(td)
        store = ChunkStore(sorted(glob.glob(os.path.join(chunks_dir, "*.kf"))))
        assert DeviceChunkStore.fits(store.matrices)
        dstore = DeviceChunkStore(store.matrices)

        # all valid normalized span sums per genome
        valid: list[np.ndarray] = []
        for m in store.matrices:
            spans = []
            c = m.shape[0]
            for s in range(c):
                for e in range(s + 1, c + 1):
                    v = m[s:e].sum(axis=0).astype(np.float64)
                    spans.append(v / v.sum() * 1e4)
            valid.append(np.array(spans))

        gidx = np.array([0, 1, 2], dtype=np.int32)
        for trial in range(5):
            x = np.asarray(dstore.sample_batch(jax.random.PRNGKey(trial), gidx, draws=2))
            assert x.shape == (6, V)
            assert np.allclose(x.sum(axis=1), 1e4, rtol=1e-4)
            for row in range(6):
                g = gidx[row // 2]
                # f32 device normalization vs f64 host: allow small tolerance
                best = np.abs(valid[g] - x[row]).max(axis=1).min()
                assert best < 1e-2, f"row {row} is not a valid span sum of genome {g} ({best})"


def test_device_chunk_store_span_distribution():
    """Span lengths follow floor(Exp(c/5))+1 (mean ~ c/5 for large c)."""
    import jax

    c = 100
    key = jax.random.PRNGKey(0)
    lengths = []
    # one-hot rows per chunk index: the normalized span sum reveals exactly
    # which chunks the span covered
    eye = np.eye(c, dtype=np.uint16)
    dstore2 = DeviceChunkStore([eye], scaler=1.0)
    for t in range(300):
        vec = np.asarray(dstore2._sample_one(jax.random.fold_in(key, t), 0))
        nz = np.flatnonzero(vec > 0)
        assert nz.size >= 1
        assert np.all(np.diff(nz) == 1), "span must be contiguous"
        lengths.append(nz.size)
    mean = np.mean(lengths)
    # Exp(c/5) mean = 20 -> floor+1 ~ 20.5, with the over-c redraw pulling up
    assert 12 < mean < 35, mean


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


def test_chunked_trainer_rejects_mismatched_fullgenome_k(tmp_path):
    """k mismatch between -input_dir and -input_dir_fullgenomes must fail
    fast, not crash in the final pass after all epochs ran."""
    chunks_dir, full_dir, out_dir, sub_path, names = _make_fixture(str(tmp_path))
    # rewrite the full-genome .kf at a different width (wrong k)
    rng = np.random.default_rng(5)
    for name in names:
        bad = rng.random(8)
        write_kf(os.path.join(full_dir, f"{name}.kf"), [(name, bad / bad.sum())])
    with pytest.raises(ValueError, match="full-genome feature width"):
        train_model_set_chunks_func(
            chunks_dir, full_dir, sorted(glob.glob(os.path.join(chunks_dir, "*.kf"))),
            sub_path, str(tmp_path), 2, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28,
            False, out_dir,
        )


def test_chunk_store_uniform_sampler():
    import tempfile

    rng = np.random.default_rng(2)
    with tempfile.TemporaryDirectory() as td:
        chunks_dir, *_ = _make_fixture(td)
        store = ChunkStore(sorted(glob.glob(os.path.join(chunks_dir, "*.kf"))))
        x = store.sample_one_uniform(rng, 0)
        assert x.shape == (V,)
        assert np.isclose(x.sum(), 1e4, rtol=1e-4)


def test_chunked_span_runner_multi_device_mesh(tmp_path):
    """The device-store span runner shards the sampled batch over the mesh
    'data' axis (DataParallel equivalent); result must stay finite and close
    to the single-device run."""
    import jax
    import jax.numpy as jnp

    from kf2vecfsw_tpu.models.mlp import dist_embed_apply, init_dist_embed
    from kf2vecfsw_tpu.ops.losses import chunks_weighted_sqrt_mse
    from kf2vecfsw_tpu.ops.pairwise import pairwise_l2_exact
    from kf2vecfsw_tpu.parallel.mesh import make_mesh
    from kf2vecfsw_tpu.train.chunks import DeviceChunkStore, make_chunked_span_runner
    from kf2vecfsw_tpu.train.step import adam_init, adam_update, lr_schedule_args

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.default_rng(0)
    G, C, Vd, B = 8, 10, 32, 4
    mats = [rng.integers(0, 50, size=(C, Vd)).astype(np.uint16) for _ in range(G)]
    dist = np.abs(rng.normal(size=(G, G))).astype(np.float32)
    dist = dist + dist.T
    np.fill_diagonal(dist, 0)
    dist_dev = jax.device_put(dist)
    dstore = DeviceChunkStore(mats)

    def loss_from_x(p, x, idx, dmat):
        emb = dist_embed_apply(p, x)
        md = pairwise_l2_exact(emb)
        ridx = jnp.repeat(idx, 2)
        return chunks_weighted_sqrt_mse(md, dmat[jnp.ix_(ridx, ridx)])

    def lgs(params, opt, x, idx, lr, consts):
        loss, grads = jax.value_and_grad(loss_from_x)(params, x, idx, consts[0])
        params, opt = adam_update(params, grads, opt, lr)
        return params, opt, loss

    lr_args = lr_schedule_args(1e-3, 3e-6, 2000.0)
    key = jax.random.PRNGKey(0)

    results = {}
    for name, mesh in [("1dev", make_mesh(1, 1)), ("8dev", make_mesh(8, 1))]:
        params = init_dist_embed(jax.random.PRNGKey(1), Vd, 16, 8)
        opt = adam_init(params)
        run = make_chunked_span_runner(lgs, dstore, G, B, draws=2, consts=(dist_dev,), mesh=mesh)
        best = (jax.tree.map(jnp.copy, params), jnp.float32(np.inf), jnp.int32(-1))
        params, opt, best, lm = run(params, opt, best, key, 0, 4, lr_args)
        results[name] = np.asarray(lm)
        assert np.isfinite(results[name]).all()
    # same RNG stream, same math up to f32 reduce ordering
    assert np.allclose(results["1dev"], results["8dev"], rtol=1e-4, atol=1e-6)


def test_sharded_store_sampling_bit_identical():
    """The genome-sharded prefix store's shard_map sampler must produce
    bit-identical span vectors to the replicated sampler (same per-sample
    keys, same math; only the gather+psum assembly differs)."""
    import jax
    import jax.numpy as jnp

    from kf2vecfsw_tpu.parallel.mesh import make_mesh
    from kf2vecfsw_tpu.train.chunks import (
        DeviceChunkStore,
        sample_chunk_batch,
        sample_chunk_batch_sharded,
    )
    from kf2vecfsw_tpu.train.step import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(11)
    mats = [rng.integers(0, 40, size=(5 + i, 32)).astype(np.uint16) for i in range(6)]
    mesh = make_mesh(8, 1)
    ds_sharded = DeviceChunkStore(mats, mesh=mesh)
    ds_plain = DeviceChunkStore(mats)
    assert ds_sharded.sharded and not ds_plain.sharded
    key = jax.random.PRNGKey(3)
    gidx = jnp.array([0, 5, 3, 2], jnp.int32)
    plain = sample_chunk_batch(ds_plain.prefix, ds_plain.counts_dev, ds_plain.scaler, key, gidx, 2)
    sharded = shard_map(
        lambda pl, cl, k, gi: sample_chunk_batch_sharded(
            pl, cl, ds_sharded.scaler, k, gi, 2, ds_sharded.g_local
        ),
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=P(),
    )(ds_sharded.prefix, ds_sharded.counts_dev, key, gidx)
    assert np.array_equal(np.asarray(plain), np.asarray(sharded))


def test_sharded_store_lifts_device_budget(tmp_path, monkeypatch):
    """A store too big for ONE device's budget trains via the device path
    when sharded across the 8-device mesh (VERDICT #8: sharding lifts the
    per-device budget n_data-fold)."""
    import glob

    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.train.chunks import DeviceChunkStore, train_model_set_chunks_func
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx
    from kf2vecfsw_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(4)
    chunks_dir = tmp_path / "chunks"
    full_dir = tmp_path / "full"
    out_dir = tmp_path / "m"
    for d in (chunks_dir, full_dir, out_dir):
        d.mkdir()
    names = [f"g{i}" for i in range(8)]
    v, rows = 64, 6
    for g in names:
        mat = rng.integers(0, 50, size=(rows, v)).astype(np.float64)
        write_kf(str(chunks_dir / f"{g}.kf"),
                 [(f"{g}.part_{r}", mat[r]) for r in range(rows)])
        fv = mat.sum(axis=0)
        write_kf(str(full_dir / f"{g}.kf"), [(g, fv / fv.sum())])
    with open(tmp_path / "t.subtrees", "w") as f:
        f.write("genome clade\n" + "".join(f"{g} 0\n" for g in names))
    d = np.abs(rng.normal(size=(8, 8)))
    d = d + d.T
    np.fill_diagonal(d, 0)
    write_di_mtrx(str(tmp_path / "t_subtree_0.di_mtrx"), names, d)

    # budget below the full store size but above 1/8th of it
    nbytes = DeviceChunkStore.nbytes([m.astype(np.uint16) for m in
                                      [rng.integers(0, 50, size=(rows, v))] * 8])
    monkeypatch.setenv("KF2VEC_CHUNK_DEVICE_BUDGET", str(max(nbytes // 4, 1)))
    mesh = make_mesh(8, 1)
    mats = [rng.integers(0, 50, size=(rows, v)).astype(np.uint16) for _ in range(8)]
    assert not DeviceChunkStore.fits(mats, None)
    assert DeviceChunkStore.fits(mats, mesh)

    files = sorted(glob.glob(str(chunks_dir / "*.kf")))
    train_model_set_chunks_func(
        str(chunks_dir), str(full_dir), files, str(tmp_path / "t.subtrees"),
        str(tmp_path), 4, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28, False,
        str(out_dir), mesh=mesh, log_every=10,
    )
    log = sorted(glob.glob(str(out_dir / "train_model_*.log")))[0]
    assert "device-resident prefix sums" in open(log).read()
