"""Lazy-permutation FSW path (models/fsw.py fsw_lazy_*, train/fsw_lazy.py).

Pins: (1) at a fresh permutation the lazy forward AND every parameter
gradient (including the learnable frequencies, which flow through the
stop-gradient jvp term) match the exact shared-vocab path; (2) the lazy
runner at refresh_steps=1 reproduces the exact runner's span losses;
(3) stale refresh intervals still descend; (4) mesh invariance including
model-axis-sharded (delta, gdelta) planes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kf2vecfsw_tpu.models import fsw as fswmod
from kf2vecfsw_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from kf2vecfsw_tpu.train.fsw_lazy import FSWLazyEpochRunner
from kf2vecfsw_tpu.train.step import DistanceEpochRunner, adam_init

K, BASE_DIM, FSWOUT, H, E = 3, 3, 24, 16, 8


def _setup(n_items=8, seed=0):
    from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_size

    V = canonical_vocab_size(K)
    rng = np.random.default_rng(seed)
    W = rng.random((n_items, V)).astype(np.float32)
    W[W < 0.3] = 0.0  # absent k-mers
    params = fswmod.init_fsw_dist_embed(
        jax.random.PRNGKey(5), K, BASE_DIM, FSWOUT, H, E
    )
    return jnp.asarray(W), params, V


def test_lazy_forward_and_grads_match_shared_at_fresh_perm():
    W, params, V = _setup()
    digits = fswmod._vocab_digits_dev(K)
    shared_apply = fswmod.make_fsw_shared_apply(K)

    points = params["lookup"][digits].reshape(V, -1)
    delta, gdelta = fswmod.fsw_lazy_refresh(params["fsw"], points, digits, W, group=8)
    assert delta.shape == (W.shape[0], FSWOUT, K, 4)  # compact, V-independent
    out_lazy = fswmod.fsw_lazy_apply(params, delta, gdelta)
    out_sh = shared_apply(params, W)
    assert np.allclose(np.asarray(out_lazy), np.asarray(out_sh), atol=1e-4), (
        np.abs(np.asarray(out_lazy) - np.asarray(out_sh)).max()
    )

    # full parameter gradients: refresh INSIDE the differentiated function the
    # way the runner uses it (refresh at the step itself = fresh permutation)
    def loss_lazy(p):
        pts = p["lookup"][digits].reshape(V, -1)
        d, gd = fswmod.fsw_lazy_refresh(p["fsw"], pts, digits, W, group=8)
        # S/g2 are data wrt the step params (frozen at refresh)
        d, gd = jax.lax.stop_gradient((d, gd))
        return jnp.sum(fswmod.fsw_lazy_apply(p, d, gd) ** 2)

    def loss_sh(p):
        return jnp.sum(shared_apply(p, W) ** 2)

    g_lazy = jax.grad(loss_lazy)(params)
    g_sh = jax.grad(loss_sh)(params)
    flat_l, _ = jax.tree.flatten(g_lazy)
    flat_s, _ = jax.tree.flatten(g_sh)
    for a, b in zip(flat_l, flat_s):
        scale = max(np.abs(np.asarray(b)).max(), 1e-6)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3 * scale), (
            np.abs(np.asarray(a) - np.asarray(b)).max(),
            scale,
        )


def test_lazy_freqs_gradient_nonzero_and_matches():
    """The frequencies' gradient must survive the lazy restructuring (it
    flows only through the (xi - stop_grad(xi)) * ddelta/dxi term)."""
    W, params, V = _setup(seed=3)
    digits = fswmod._vocab_digits_dev(K)
    shared_apply = fswmod.make_fsw_shared_apply(K)

    def loss_lazy(p):
        pts = p["lookup"][digits].reshape(V, -1)
        d, gd = jax.lax.stop_gradient(
            fswmod.fsw_lazy_refresh(p["fsw"], pts, digits, W, group=8)
        )
        return jnp.sum(fswmod.fsw_lazy_apply(p, d, gd) ** 2)

    gf_lazy = np.asarray(jax.grad(loss_lazy)(params)["fsw"]["freqs"])
    gf_sh = np.asarray(
        jax.grad(lambda p: jnp.sum(shared_apply(p, W) ** 2))(params)["fsw"]["freqs"]
    )
    assert np.abs(gf_sh).max() > 0
    assert np.allclose(gf_lazy, gf_sh, atol=2e-3 * np.abs(gf_sh).max()), (
        np.abs(gf_lazy - gf_sh).max()
    )


def _run_span(runner, params, opt, W, dist, key, span=3):
    lr_args = (1e-3, 1e-4, 2000.0, 0.1, 100)
    best = (jax.tree.map(jnp.copy, params), jnp.float32(np.inf), jnp.int32(-1))
    Wp = runner.pad_items(W)
    dp = runner.pad_dist(dist)
    params, opt, best, losses = runner.run_epoch_span(
        params, opt, best, Wp, dp, key, 0, span, lr_args
    )
    return np.asarray(losses)


def _dist_for(n, seed=7):
    rng = np.random.default_rng(seed)
    d = np.abs(rng.normal(size=(n, n))).astype(np.float32)
    d = d + d.T
    np.fill_diagonal(d, 0.0)
    return jnp.asarray(d)


def test_lazy_runner_refresh1_equals_exact_runner():
    W, params0, V = _setup()
    dist = _dist_for(8)
    mesh = make_mesh(1, 1)
    specs = fswmod.fsw_dist_embed_specs(MODEL_AXIS)
    params = shard_params(params0, specs, mesh)
    key = jax.random.PRNGKey(11)

    exact = DistanceEpochRunner(
        mesh, fswmod.make_fsw_shared_apply(K), specs, 8, 4
    )
    lazy = FSWLazyEpochRunner(mesh, K, specs, 8, 4, refresh_steps=1)
    losses_e = _run_span(exact, params, adam_init(params), W, dist, key)
    losses_l = _run_span(lazy, params, adam_init(params), W, dist, key)
    assert np.allclose(losses_e, losses_l, rtol=1e-4, atol=1e-6), (
        losses_e,
        losses_l,
    )


def test_lazy_runner_stale_refresh_descends():
    W, params0, V = _setup(n_items=8, seed=9)
    dist = _dist_for(8, seed=9)
    mesh = make_mesh(1, 1)
    specs = fswmod.fsw_dist_embed_specs(MODEL_AXIS)
    params = shard_params(params0, specs, mesh)
    lazy = FSWLazyEpochRunner(mesh, K, specs, 8, 4, refresh_steps=4)
    losses = _run_span(lazy, params, adam_init(params), W, dist, jax.random.PRNGKey(2), span=8)
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("shape", [(8, 1), (2, 4)])
def test_lazy_runner_mesh_invariance(shape):
    """Losses must not depend on the mesh, including model-axis sharding of
    the slices and the (delta, gdelta) planes."""
    W, params0, V = _setup()
    dist = _dist_for(8)
    specs = fswmod.fsw_dist_embed_specs(MODEL_AXIS)
    key = jax.random.PRNGKey(4)

    mesh1 = make_mesh(1, 1)
    lazy1 = FSWLazyEpochRunner(mesh1, K, specs, 8, 4, refresh_steps=2)
    p1 = shard_params(params0, specs, mesh1)
    ref = _run_span(lazy1, p1, adam_init(p1), W, dist, key, span=4)

    mesh2 = make_mesh(*shape)
    lazy2 = FSWLazyEpochRunner(mesh2, K, specs, 8, 4, refresh_steps=2)
    p2 = shard_params(params0, specs, mesh2)
    got = _run_span(lazy2, p2, adam_init(p2), W, dist, key, span=4)
    # model-sharded psum reorders float sums; same tolerance as the exact
    # path's mesh-invariance tests (test_train.py)
    assert np.allclose(ref, got, rtol=1e-2), (ref, got)


def test_lazy_trainer_cli_surface(tmp_path):
    """train_model_set_func with fsw_lazy_refresh trains, exports, and the
    checkpoint is queryable by the exact per-genome forward."""
    import os

    from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_codes, codes_to_digit_matrix, FSW_BASE_MAP
    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint
    from kf2vecfsw_tpu.train.distance import train_model_set_func
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(0)
    n = 6
    names = [f"g{i}" for i in range(n)]
    feat_dir = tmp_path / "feats"
    out_dir = tmp_path / "models"
    dist_dir = tmp_path / "dist"
    for d in (feat_dir, out_dir, dist_dir):
        os.makedirs(d)
    # full-vocab point sets => the shared path (and so the lazy path) engages
    codes = canonical_vocab_codes(K)
    digits = codes_to_digit_matrix(codes, K, FSW_BASE_MAP).astype(np.float32)
    files = []
    for nm in names:
        freqs = rng.random((digits.shape[0], 1)).astype(np.float32)
        mat = np.concatenate([digits, freqs], axis=1)
        p = str(feat_dir / f"{nm}.npy")
        np.save(p, mat)
        files.append(p)
    with open(tmp_path / "subtrees.csv", "w") as f:
        for nm in names:
            f.write(f"{nm}\t0\n")
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0.0)
    write_di_mtrx(str(dist_dir / "true_distance_matrix_subtree_0.di_mtrx"), names, d)

    saved = train_model_set_func(
        str(feat_dir), files, str(tmp_path / "subtrees.csv"), str(dist_dir),
        num_epochs=4, hidden_size=16, embedding_size=8, batch_size=4,
        lr0=1e-3, lr_min=1e-4, lr_decay=2000.0, clades_to_train=None, seed=1,
        model_filepath=str(out_dir), base_dim=BASE_DIM, fswout_dim=FSWOUT,
        fsw_lazy_refresh=2,
    )
    assert saved and os.path.exists(saved[0])
    name, meta, params = load_checkpoint(saved[0])
    assert name == "NeuralNetFSW"
    # lazy-trained params drive the exact per-genome forward
    X = np.concatenate([digits, rng.random((digits.shape[0], 1)).astype(np.float32)], axis=1)
    emb = fswmod.fsw_dist_embed_apply(jax.device_put(params), jnp.asarray(X[None]))
    assert np.isfinite(np.asarray(emb)).all()


def test_lazy_applicable_gate_is_per_device(monkeypatch):
    """The compact S plane is V-independent, so the gate is the REFRESH's
    (group, C_local, V) sort transients: slice rows shard over the model
    axis, so a refresh too big for one device re-fits on a sharded mesh,
    and on a roomy device the group stays at the measured sweet spot 8."""
    from kf2vecfsw_tpu.train.fsw_lazy import (
        fsw_lazy_budget_bytes,
        lazy_applicable,
        pick_refresh_group,
        refresh_transient_bytes,
    )

    n, C, V = 32, 512, 131072
    # real 16-GiB-v5e-class budget: the k=9 regime that round 4's resident
    # (n, C, V) plane gated OFF single-device (8.6 GB) is now applicable —
    # the group shrinks until one group's transients fit
    assert lazy_applicable(n, C, V)
    g1 = pick_refresh_group(C, V, n_model=1)
    assert g1 >= 1
    assert refresh_transient_bytes(C, V, g1) <= fsw_lazy_budget_bytes()
    # sharding slice rows over a model mesh relaxes the transient -> larger
    # groups (fewer sort dispatches per refresh)
    assert pick_refresh_group(C, V, n_model=4) >= g1
    # small vocab: full group 8 on one device
    assert pick_refresh_group(C, 8192, n_model=1) == 8

    # a mocked tiny-HBM device: group=1 does not fit single-device but fits
    # across a 4-way model mesh (the re-engagement story, now transient-based)
    t1 = refresh_transient_bytes(C, V, 1)
    t4 = refresh_transient_bytes(-(-C // 4), V, 1)
    monkeypatch.setenv("KF2VEC_HBM_BYTES", str(int((t1 + t4) / 2 / (3 / 8))))
    assert not lazy_applicable(n, C, V, n_model=1)
    assert lazy_applicable(n, C, V, n_model=4)


def test_lazy_run_epoch_keeps_refresh_cadence():
    """The per-epoch driver (test-set runs) must refresh every refresh_steps
    TRAINING steps across run_epoch calls — not once per epoch — and must
    reproduce the block-structured span path exactly at a constant LR."""
    W, params0, V = _setup(n_items=8, seed=3)
    dist = _dist_for(8, seed=3)
    mesh = make_mesh(1, 1)
    specs = fswmod.fsw_dist_embed_specs(MODEL_AXIS)
    params = shard_params(params0, specs, mesh)
    base = jax.random.PRNGKey(5)
    span = 4
    # n_batches = 8/4 = 2; refresh_steps=4 -> refresh every 2 epochs
    lazy_span = FSWLazyEpochRunner(mesh, K, specs, 8, 4, refresh_steps=4)
    losses_span = _run_span(
        lazy_span, params, adam_init(params), W, dist, base, span=span
    )

    lazy = FSWLazyEpochRunner(mesh, K, specs, 8, 4, refresh_steps=4)
    refreshes = []
    inner = lazy._refresh_jit
    lazy._refresh_jit = lambda p, f: refreshes.append(1) or inner(p, f)
    p, o = params, adam_init(params)
    Wp, dp = lazy.pad_items(W), lazy.pad_dist(dist)
    from kf2vecfsw_tpu.train.step import device_step_lr

    losses = []
    for e in range(span):
        # the span computes its LR on device; feed run_epoch the identical value
        lr_e = float(device_step_lr(jnp.int32(e), 1e-3, 1e-4, 2000.0, 0.1, 100))
        p, o, loss = lazy.run_epoch(p, o, Wp, dp, jax.random.fold_in(base, e), lr_e)
        losses.append(float(loss))
    assert len(refreshes) == 2, refreshes  # epochs 0 and 2 only
    assert np.allclose(losses, losses_span, rtol=1e-4, atol=1e-6), (
        losses, losses_span,
    )


def _mini_fsw_library(tmp_path, rng):
    """Shared fixture for the auto-enable tests: full-vocab FSW point sets
    for 6 genomes, one clade, a true-distance matrix."""
    import os

    from kf2vecfsw_tpu.kmer.vocab import (
        FSW_BASE_MAP,
        canonical_vocab_codes,
        codes_to_digit_matrix,
    )
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    n = 6
    names = [f"g{i}" for i in range(n)]
    feat_dir = tmp_path / "feats"
    out_dir = tmp_path / "models"
    dist_dir = tmp_path / "dist"
    for d in (feat_dir, out_dir, dist_dir):
        os.makedirs(d)
    codes = canonical_vocab_codes(K)
    digits = codes_to_digit_matrix(codes, K, FSW_BASE_MAP).astype(np.float32)
    files = []
    for nm in names:
        freqs = rng.random((digits.shape[0], 1)).astype(np.float32)
        np.save(str(feat_dir / f"{nm}.npy"), np.concatenate([digits, freqs], axis=1))
        files.append(str(feat_dir / f"{nm}.npy"))
    with open(tmp_path / "subtrees.csv", "w") as f:
        for nm in names:
            f.write(f"{nm}\t0\n")
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0.0)
    write_di_mtrx(str(dist_dir / "true_distance_matrix_subtree_0.di_mtrx"), names, d)
    return feat_dir, out_dir, dist_dir, files


def _run_trainer(tmp_path, files, feat_dir, out_dir, dist_dir, **kw):
    from kf2vecfsw_tpu.train.distance import train_model_set_func

    return train_model_set_func(
        str(feat_dir), files, str(tmp_path / "subtrees.csv"), str(dist_dir),
        num_epochs=2, hidden_size=16, embedding_size=8, batch_size=4,
        lr0=1e-3, lr_min=1e-4, lr_decay=2000.0, clades_to_train=None, seed=1,
        model_filepath=str(out_dir), base_dim=BASE_DIM, fswout_dim=FSWOUT,
        **kw,
    )


def _trainer_log(out_dir):
    import glob
    import os

    logs = sorted(glob.glob(os.path.join(str(out_dir), "train_model_*.log")))
    assert logs
    return "".join(open(p).read() for p in logs)


def test_lazy_auto_enables_at_default_flags(tmp_path):
    """A user typing the reference's own flags (no -fsw_lazy_refresh) gets
    the lazy path at the auto cadence when the plane fits (verdict r3 #4)."""
    rng = np.random.default_rng(2)
    feat_dir, out_dir, dist_dir, files = _mini_fsw_library(tmp_path, rng)
    saved = _run_trainer(tmp_path, files, feat_dir, out_dir, dist_dir)
    assert saved
    log = _trainer_log(out_dir)
    assert "FSW lazy sort-refresh path" in log
    assert "auto-enabled" in log


def test_lazy_explicit_zero_forces_exact(tmp_path):
    rng = np.random.default_rng(2)
    feat_dir, out_dir, dist_dir, files = _mini_fsw_library(tmp_path, rng)
    saved = _run_trainer(
        tmp_path, files, feat_dir, out_dir, dist_dir, fsw_lazy_refresh=0
    )
    assert saved
    log = _trainer_log(out_dir)
    assert "FSW lazy sort-refresh path" not in log


def test_lazy_auto_falls_back_when_over_budget(tmp_path, monkeypatch):
    """Auto must silently use the exact path when the plane exceeds the
    per-device budget (tiny fake HBM via KF2VEC_HBM_BYTES)."""
    rng = np.random.default_rng(2)
    feat_dir, out_dir, dist_dir, files = _mini_fsw_library(tmp_path, rng)
    monkeypatch.setenv("KF2VEC_HBM_BYTES", "1024")
    try:
        saved = _run_trainer(tmp_path, files, feat_dir, out_dir, dist_dir)
    finally:
        monkeypatch.delenv("KF2VEC_HBM_BYTES")
    assert saved
    log = _trainer_log(out_dir)
    assert "FSW lazy sort-refresh path" not in log
    assert "auto-check" in log


# -- per-genome lazy (VERDICT r4 item 8) --------------------------------------

def _pergenome_setup(n_items=8, N=40, seed=2):
    """Padded (n, N, K+1) point sets with per-item sizes (zero-weight
    padding rows) and arbitrary (non-canonical) k-mer codes."""
    rng = np.random.default_rng(seed)
    X = np.zeros((n_items, N, K + 1), np.float32)
    for i in range(n_items):
        n_pts = int(rng.integers(N // 2, N + 1))
        X[i, :n_pts, :K] = rng.integers(0, 4, size=(n_pts, K))
        X[i, :n_pts, K] = rng.random(n_pts) + 0.05
    params = fswmod.init_fsw_dist_embed(
        jax.random.PRNGKey(5), K, BASE_DIM, FSWOUT, H, E
    )
    return jnp.asarray(X), params


def test_pergenome_lazy_matches_exact_at_fresh_perm():
    """fsw_lazy_refresh_pergenome + the SAME compact fsw_lazy_apply equal
    the exact per-genome forward (and its parameter gradients) at a fresh
    permutation — the same contract the shared path pins."""
    X, params = _pergenome_setup()

    S, g2 = fswmod.fsw_lazy_refresh_pergenome(
        params["fsw"], params["lookup"], X, group=4
    )
    assert S.shape == (X.shape[0], FSWOUT, K, 4)  # V/N-independent plane
    out_lazy = fswmod.fsw_lazy_apply(params, S, g2)
    out_ex = fswmod.fsw_dist_embed_apply(params, X)
    assert np.allclose(np.asarray(out_lazy), np.asarray(out_ex), atol=1e-4), (
        np.abs(np.asarray(out_lazy) - np.asarray(out_ex)).max()
    )

    def loss_lazy(p):
        s, gd = jax.lax.stop_gradient(
            fswmod.fsw_lazy_refresh_pergenome(p["fsw"], p["lookup"], X, group=4)
        )
        return jnp.sum(fswmod.fsw_lazy_apply(p, s, gd) ** 2)

    def loss_ex(p):
        return jnp.sum(fswmod.fsw_dist_embed_apply(p, X) ** 2)

    g_lazy = jax.tree.flatten(jax.grad(loss_lazy)(params))[0]
    g_ex = jax.tree.flatten(jax.grad(loss_ex)(params))[0]
    for a, b in zip(g_lazy, g_ex):
        scale = max(np.abs(np.asarray(b)).max(), 1e-6)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3 * scale), (
            np.abs(np.asarray(a) - np.asarray(b)).max(), scale,
        )


def test_pergenome_runner_refresh1_equals_exact_runner():
    X, params0 = _pergenome_setup()
    dist = _dist_for(8)
    mesh = make_mesh(1, 1)
    specs = fswmod.fsw_dist_embed_specs(MODEL_AXIS)
    params = shard_params(params0, specs, mesh)
    key = jax.random.PRNGKey(11)

    from kf2vecfsw_tpu.train.fsw_lazy import FSWLazyPerGenomeRunner

    exact = DistanceEpochRunner(
        mesh, fswmod.fsw_dist_embed_apply, specs, 8, 4
    )
    lazy = FSWLazyPerGenomeRunner(mesh, K, specs, 8, 4, refresh_steps=1)
    losses_e = _run_span(exact, params, adam_init(params), X, dist, key)
    losses_l = _run_span(lazy, params, adam_init(params), X, dist, key)
    assert np.allclose(losses_e, losses_l, rtol=1e-4, atol=1e-6), (
        losses_e, losses_l,
    )


def test_pergenome_runner_stale_refresh_descends_and_mesh_invariant():
    X, params0 = _pergenome_setup(seed=9)
    dist = _dist_for(8, seed=9)
    specs = fswmod.fsw_dist_embed_specs(MODEL_AXIS)
    key = jax.random.PRNGKey(2)

    from kf2vecfsw_tpu.train.fsw_lazy import FSWLazyPerGenomeRunner

    mesh1 = make_mesh(1, 1)
    p1 = shard_params(params0, specs, mesh1)
    lazy1 = FSWLazyPerGenomeRunner(mesh1, K, specs, 8, 4, refresh_steps=4)
    losses = _run_span(lazy1, p1, adam_init(p1), X, dist, key, span=8)
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()

    mesh2 = make_mesh(2, 4)
    p2 = shard_params(params0, specs, mesh2)
    lazy2 = FSWLazyPerGenomeRunner(mesh2, K, specs, 8, 4, refresh_steps=4)
    got = _run_span(lazy2, p2, adam_init(p2), X, dist, key, span=8)
    assert np.allclose(losses, got, rtol=1e-2), (losses, got)


def test_pergenome_lazy_trainer_cli_surface(tmp_path):
    """Small point sets keep the shared-vocab gate OFF, so the trainer must
    engage the PER-GENOME lazy runner (the round-5 extension of the auto
    path) and still export a queryable NeuralNetFSW checkpoint."""
    import os

    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint
    from kf2vecfsw_tpu.train.distance import train_model_set_func
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    rng = np.random.default_rng(0)
    n = 6
    names = [f"g{i}" for i in range(n)]
    feat_dir = tmp_path / "feats"
    out_dir = tmp_path / "models"
    dist_dir = tmp_path / "dist"
    for d in (feat_dir, out_dir, dist_dir):
        os.makedirs(d)
    files = []
    for nm in names:
        n_pts = int(rng.integers(4, 9))  # N <= 8 < V/3: per-genome path
        mat = np.concatenate(
            [
                rng.integers(0, 4, size=(n_pts, K)).astype(np.float32),
                rng.random((n_pts, 1)).astype(np.float32),
            ],
            axis=1,
        )
        p = str(feat_dir / f"{nm}.npy")
        np.save(p, mat)
        files.append(p)
    with open(tmp_path / "subtrees.csv", "w") as f:
        for nm in names:
            f.write(f"{nm}\t0\n")
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0.0)
    write_di_mtrx(str(dist_dir / "true_distance_matrix_subtree_0.di_mtrx"), names, d)

    saved = train_model_set_func(
        str(feat_dir), files, str(tmp_path / "subtrees.csv"), str(dist_dir),
        num_epochs=4, hidden_size=16, embedding_size=8, batch_size=4,
        lr0=1e-3, lr_min=1e-4, lr_decay=2000.0, clades_to_train=None, seed=1,
        model_filepath=str(out_dir), base_dim=BASE_DIM, fswout_dim=FSWOUT,
        fsw_lazy_refresh=2,
    )
    assert saved and os.path.exists(saved[0])
    name, meta, params = load_checkpoint(saved[0])
    assert name == "NeuralNetFSW"
    logs = [f for f in os.listdir(out_dir) if f.endswith(".log")]
    text = "".join(open(os.path.join(out_dir, f)).read() for f in logs)
    assert "per-genome sort orders" in text  # the per-genome runner engaged
    X = np.concatenate(
        [
            rng.integers(0, 4, size=(5, K)).astype(np.float32),
            rng.random((5, 1)).astype(np.float32),
        ],
        axis=1,
    )
    emb = fswmod.fsw_dist_embed_apply(jax.device_put(params), jnp.asarray(X[None]))
    assert np.isfinite(np.asarray(emb)).all()


def test_refresh_dperm_and_unsort_paths_agree(monkeypatch):
    """The refresh has two internal forms — D_perm contraction (small
    vocabs) and the per-group unsort (giant vocabs, gated by HBM budget).
    Both must produce the same (S, g2)."""
    W, params, V = _setup(seed=6)
    digits = fswmod._vocab_digits_dev(K)
    points = params["lookup"][digits].reshape(V, -1)

    s_fast, g_fast = fswmod.fsw_lazy_refresh(
        params["fsw"], points, digits, W, group=4
    )
    monkeypatch.setenv("KF2VEC_HBM_BYTES", "1024")  # forces the unsort path
    assert fswmod._dperm_budget_bytes() == 128
    s_slow, g_slow = jax.jit(
        lambda fp, pts, Wx: fswmod.fsw_lazy_refresh(fp, pts, digits, Wx, group=4)
    )(params["fsw"], points, W)
    assert np.allclose(np.asarray(s_fast), np.asarray(s_slow), atol=1e-5), (
        np.abs(np.asarray(s_fast) - np.asarray(s_slow)).max()
    )
    assert np.allclose(np.asarray(g_fast), np.asarray(g_slow), atol=1e-5)


def test_pergenome_lazy_trainer_at_k11(tmp_path):
    """k > 9: the shared-vocab gate is off by vocab size (V=2M > 1<<18), so
    FSW training at k=11 must run the per-genome lazy runner — the regime
    the round-5 extension exists for. The canonical vocab matrix is never
    materialized on this path (it would be ~92 MB of digits)."""
    import os

    from kf2vecfsw_tpu.models.fsw import shared_vocab_applicable
    from kf2vecfsw_tpu.train.checkpoint import load_checkpoint
    from kf2vecfsw_tpu.train.distance import train_model_set_func
    from kf2vecfsw_tpu.tree.distance import write_di_mtrx

    k = 11
    assert not shared_vocab_applicable(k, 10**6, 4)

    rng = np.random.default_rng(1)
    n = 6
    names = [f"g{i}" for i in range(n)]
    feat_dir = tmp_path / "feats"
    out_dir = tmp_path / "models"
    dist_dir = tmp_path / "dist"
    for d in (feat_dir, out_dir, dist_dir):
        os.makedirs(d)
    files = []
    for nm in names:
        n_pts = int(rng.integers(8, 17))
        mat = np.concatenate(
            [
                rng.integers(0, 4, size=(n_pts, k)).astype(np.float32),
                rng.random((n_pts, 1)).astype(np.float32),
            ],
            axis=1,
        )
        p = str(feat_dir / f"{nm}_k{k}.npy")
        np.save(p, mat)
        files.append(p)
    with open(tmp_path / "subtrees.csv", "w") as f:
        for nm in names:
            f.write(f"{nm}\t0\n")
    d = np.abs(rng.normal(size=(n, n)))
    d = d + d.T
    np.fill_diagonal(d, 0.0)
    write_di_mtrx(str(dist_dir / "true_distance_matrix_subtree_0.di_mtrx"), names, d)

    saved = train_model_set_func(
        str(feat_dir), files, str(tmp_path / "subtrees.csv"), str(dist_dir),
        num_epochs=4, hidden_size=16, embedding_size=8, batch_size=4,
        lr0=1e-3, lr_min=1e-4, lr_decay=2000.0, clades_to_train=None, seed=1,
        model_filepath=str(out_dir), base_dim=2, fswout_dim=24,
        fsw_lazy_refresh=2,
    )
    assert saved and os.path.exists(saved[0])
    name, meta, params = load_checkpoint(saved[0])
    assert name == "NeuralNetFSW" and meta["fsw_k"] == k
    logs = [f for f in os.listdir(out_dir) if f.endswith(".log")]
    text = "".join(open(os.path.join(out_dir, f)).read() for f in logs)
    assert "per-genome sort orders" in text
