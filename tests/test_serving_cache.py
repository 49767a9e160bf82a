"""Device-resident serving cache (infer/cache.py): hit/miss semantics,
file-change invalidation, and byte-budget LRU eviction.

The cache exists because the serving e2e path (reference classify.py:83-90,
query.py:118-134 reload the model every invocation) was transfer-bound on
slow host<->device links; correctness here means a stale checkpoint is NEVER
served after the file changes, and the cache never holds more than its
budget."""

import os
import time

import numpy as np
import pytest

from kf2vecfsw_tpu.infer.cache import DeviceFileCache, cached_checkpoint
from kf2vecfsw_tpu.models.mlp import init_classifier
from kf2vecfsw_tpu.train.checkpoint import save_checkpoint

import jax


def _touch(path, payload=b"x"):
    with open(path, "wb") as f:
        f.write(payload)


def test_hit_and_miss(tmp_path):
    p = str(tmp_path / "a.bin")
    _touch(p)
    cache = DeviceFileCache(budget_bytes=lambda: 1 << 20)
    calls = []

    def build():
        calls.append(1)
        return np.zeros(16, np.float32)

    v1 = cache.get(p, build)
    v2 = cache.get(p, build)
    assert v1 is v2
    assert len(calls) == 1
    assert cache.hits == 1 and cache.misses == 1


def test_invalidation_on_file_change(tmp_path):
    p = str(tmp_path / "a.bin")
    _touch(p, b"one")
    cache = DeviceFileCache(budget_bytes=lambda: 1 << 20)
    v1 = cache.get(p, lambda: np.zeros(4))
    # size change always invalidates even if mtime granularity collides
    _touch(p, b"three!!!")
    v2 = cache.get(p, lambda: np.ones(4))
    assert v2 is not v1
    assert np.all(np.asarray(v2) == 1)
    assert cache.misses == 2


def test_lru_eviction_under_budget(tmp_path):
    # budget fits exactly two 400-byte values; inserting a third evicts the
    # least recently USED (a is touched between b and c, so b goes)
    paths = []
    for name in "abc":
        p = str(tmp_path / f"{name}.bin")
        _touch(p, name.encode())
        paths.append(p)
    cache = DeviceFileCache(budget_bytes=lambda: 800)
    builds = {p: 0 for p in paths}

    def build_for(p):
        def build():
            builds[p] += 1
            return np.zeros(100, np.float32)  # 400 bytes

        return build

    cache.get(paths[0], build_for(paths[0]))
    cache.get(paths[1], build_for(paths[1]))
    cache.get(paths[0], build_for(paths[0]))  # a now most recent
    cache.get(paths[2], build_for(paths[2]))  # evicts b
    assert cache.nbytes <= 800
    cache.get(paths[0], build_for(paths[0]))
    assert builds[paths[0]] == 1  # a survived
    cache.get(paths[1], build_for(paths[1]))
    assert builds[paths[1]] == 2  # b was evicted and rebuilt


def test_oversized_value_served_but_not_cached(tmp_path):
    p = str(tmp_path / "big.bin")
    _touch(p)
    cache = DeviceFileCache(budget_bytes=lambda: 10)
    v = cache.get(p, lambda: np.zeros(100, np.float32))
    assert v.size == 100
    assert len(cache) == 0 and cache.nbytes == 0


def test_cached_checkpoint_device_resident_and_invalidates(tmp_path):
    key = jax.random.PRNGKey(0)
    ck = str(tmp_path / "classifier_model.ckpt")
    save_checkpoint(
        ck,
        "NeuralNetClassifierOnly",
        {"model_input_size": 8, "model_hidden_size_fc1": 4, "model_class_count": 2},
        init_classifier(key, 8, 4, 2),
    )
    name1, meta1, params1 = cached_checkpoint(ck)
    assert name1 == "NeuralNetClassifierOnly"
    assert all(isinstance(leaf, jax.Array) for leaf in jax.tree.leaves(params1))
    name2, _, params2 = cached_checkpoint(ck)
    assert params2 is params1  # hit

    # rewrite with different weights -> must be picked up
    time.sleep(0.01)  # ensure mtime_ns advances even on coarse filesystems
    save_checkpoint(
        ck,
        "NeuralNetClassifierOnly",
        {"model_input_size": 8, "model_hidden_size_fc1": 4, "model_class_count": 2},
        init_classifier(jax.random.PRNGKey(1), 8, 4, 2),
    )
    _, _, params3 = cached_checkpoint(ck)
    l1 = jax.tree.leaves(params1)[0]
    l3 = jax.tree.leaves(params3)[0]
    assert not np.allclose(np.asarray(l1), np.asarray(l3))


def test_missing_file_raises(tmp_path):
    cache = DeviceFileCache()
    with pytest.raises(FileNotFoundError):
        cache.get(str(tmp_path / "nope"), lambda: 1)


def test_phase_collector_thread_safety_and_counts():
    import threading

    from kf2vecfsw_tpu.utils import phases

    with phases.collect() as ph:

        def work():
            for _ in range(50):
                with phases.phase("p"):
                    pass
                phases.count("dispatches")

        ts = [threading.Thread(target=work) for _ in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
    assert ph["dispatches"] == 200
    assert ph["p"] >= 0.0
    # inactive collector: zero effect
    with phases.phase("q"):
        pass
    phases.count("q")
    assert "q" not in ph


def test_read_kf_files_cached_matches_and_invalidates(tmp_path):
    from kf2vecfsw_tpu.infer.cache import read_kf_files_cached
    from kf2vecfsw_tpu.io.kf import read_kf_files, write_kf

    rng = np.random.default_rng(3)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"q{i}.kf")
        write_kf(p, [(f"q{i}", rng.random(16))])
        paths.append(p)
    names_ref, mat_ref = read_kf_files(paths, dtype=np.float32)
    names1, mat1 = read_kf_files_cached(paths, dtype=np.float32)
    assert names1 == names_ref
    np.testing.assert_array_equal(mat1, mat_ref)
    # warm pass: identical
    names2, mat2 = read_kf_files_cached(paths, dtype=np.float32)
    assert names2 == names_ref
    np.testing.assert_array_equal(mat2, mat_ref)
    # rewrite one file -> picked up
    time.sleep(0.01)
    write_kf(paths[2], [("q2", np.ones(16))])
    _, mat3 = read_kf_files_cached(paths, dtype=np.float32)
    assert np.allclose(mat3[2], 1.0)


def test_query_matrix_serving_byte_parity(tmp_path, monkeypatch):
    """classify+query through the device-resident query matrix (default)
    must emit byte-identical classes.out / APPLES matrices / embeddings to
    the legacy per-block host path (KF2VEC_NO_QUERY_MATRIX=1), including a
    multi-row (chunked-style) query file."""
    from kf2vecfsw_tpu.infer import cache
    from kf2vecfsw_tpu.infer.classify import classify_func
    from kf2vecfsw_tpu.infer.query import query_func
    from kf2vecfsw_tpu.io.kf import write_kf
    from kf2vecfsw_tpu.models.mlp import init_classifier, init_dist_embed
    from kf2vecfsw_tpu.train.checkpoint import save_checkpoint
    from kf2vecfsw_tpu.train.distance import f32_row

    rng = np.random.default_rng(5)
    v, e, nb = 32, 8, 6
    qdir = tmp_path / "q"
    mdir = tmp_path / "m"
    qdir.mkdir()
    mdir.mkdir()
    files = []
    for i in range(5):
        p = str(qdir / f"q{i}.kf")
        write_kf(p, [(f"q{i}", rng.random(v))])
        files.append(p)
    # one multi-row file: rows named like chunk windows
    p = str(qdir / "multi.kf")
    write_kf(p, [(f"multi", rng.random(v)) for _ in range(3)])
    files.append(p)

    key = jax.random.PRNGKey(0)
    save_checkpoint(
        str(mdir / "classifier_model.ckpt"),
        "NeuralNetClassifierOnly",
        {"model_input_size": v, "model_hidden_size_fc1": 8, "model_class_count": 2},
        init_classifier(key, v, 8, 2),
    )
    for c in (0, 1):
        save_checkpoint(
            str(mdir / f"model_subtree_{c}.ckpt"),
            "NeuralNet",
            {"model_input_size": v, "model_hidden_size_fc1": 8, "model_embedding_size": e},
            init_dist_embed(jax.random.PRNGKey(c), v, 8, e),
        )
        with open(mdir / f"embeddings_subtree_{c}.csv", "w") as f:
            for i in range(nb):
                f.write(f"g{i}\t" + f32_row(rng.normal(size=e).astype(np.float32)))

    outs = {}
    for tag, env in (("cached", None), ("legacy", "1")):
        odir = tmp_path / f"o_{tag}"
        odir.mkdir()
        cache.clear_all()
        if env is None:
            monkeypatch.delenv("KF2VEC_NO_QUERY_MATRIX", raising=False)
        else:
            monkeypatch.setenv("KF2VEC_NO_QUERY_MATRIX", env)
        classify_func(str(qdir), files, str(mdir), 28, str(odir))
        query_func(str(qdir), files, str(mdir), str(odir), 28, str(odir))
        outs[tag] = {
            f: open(odir / f, "rb").read()
            for f in sorted(os.listdir(odir))
            if f.endswith((".out", ".csv", ".emb"))
        }
    assert sorted(outs["cached"]) == sorted(outs["legacy"])
    for f in outs["cached"]:
        assert outs["cached"][f] == outs["legacy"][f], f
    cache.clear_all()


def test_cached_embeddings_bucket_pads_anchor_rows(tmp_path):
    """Anchor matrices are row-padded to the geometric item bucket so every
    clade's backbone size shares one of a handful of compiled query-step
    shapes (previously each distinct anchor count was a fresh ~15-30 s XLA
    compile per serving process). Names keep the REAL count — query crops
    distance columns to len(names)."""
    from kf2vecfsw_tpu.infer.cache import cached_embeddings
    from kf2vecfsw_tpu.train.step import bucket_items

    rng = np.random.default_rng(0)
    for n in (21, 26, 31):
        emb = rng.normal(size=(n, 16)).astype(np.float32)
        p = str(tmp_path / f"embeddings_subtree_{n}.csv")
        with open(p, "w") as f:
            for i in range(n):
                f.write(f"g{i:03d}\t" + "\t".join(str(x) for x in emb[i]) + "\n")
        names, dev = cached_embeddings(p)
        assert len(names) == n
        assert dev.shape == (bucket_items(n), 16)
        got = np.asarray(dev)
        np.testing.assert_allclose(got[:n], emb, rtol=1e-6)
        assert not got[n:].any()  # zero padding
    # 21..31 collapse onto exactly two buckets (24 and 32)
    assert {bucket_items(n) for n in range(21, 32)} == {24, 32}
