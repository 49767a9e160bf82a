import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kf2vecfsw_tpu.models.fsw import (
    fsw_dist_embed_apply,
    fsw_embed,
    init_fsw_dist_embed,
    init_fsw_params,
)
from kf2vecfsw_tpu.models.mlp import (
    classifier_apply,
    dist_embed_apply,
    init_classifier,
    init_dist_embed,
)
from kf2vecfsw_tpu.ops.losses import chunks_weighted_sqrt_mse, nll_loss, weighted_sqrt_mse
from kf2vecfsw_tpu.ops.pairwise import cdist_exact_blocked, pairwise_l2_exact, squared_clamped
from kf2vecfsw_tpu.train.schedule import step_lr


def test_dist_embed_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    params = init_dist_embed(key, 32, 16, 8)
    x = jax.random.normal(key, (5, 32))
    out = dist_embed_apply(params, x)
    assert out.shape == (5, 8)
    assert np.allclose(out, dist_embed_apply(params, x))


def test_classifier_log_softmax():
    key = jax.random.PRNGKey(1)
    params = init_classifier(key, 32, 16, 4)
    x = jax.random.normal(key, (3, 32))
    lp = classifier_apply(params, x)
    assert np.allclose(np.exp(np.asarray(lp)).sum(axis=1), 1.0, atol=1e-5)


def test_pairwise_matches_numpy():
    x = np.random.default_rng(0).normal(size=(7, 5)).astype(np.float32)
    ours = np.asarray(pairwise_l2_exact(jnp.asarray(x)))
    ref = np.sqrt(((x[:, None] - x[None]) ** 2).sum(-1))
    assert np.allclose(ours, ref, atol=1e-6)
    blocked = np.asarray(cdist_exact_blocked(jnp.asarray(x), jnp.asarray(x), 3))
    assert np.allclose(blocked, ref, atol=1e-6)


def test_pairwise_gradient_no_nan_on_diagonal():
    x = jnp.ones((4, 3))

    def f(x):
        return jnp.sum(pairwise_l2_exact(x))

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_squared_clamped():
    d = jnp.array([0.0005, 0.1, 2.0])
    out = np.asarray(squared_clamped(d))
    assert out[0] == 0.0  # 2.5e-7 < 1e-6 -> 0 (query.py:172-176)
    assert np.isclose(out[2], 4.0)


def test_losses_match_reference_formulas():
    rng = np.random.default_rng(0)
    td = np.abs(rng.normal(size=(4, 4))).astype(np.float32)
    md = np.abs(rng.normal(size=(4, 4))).astype(np.float32)
    ours = float(weighted_sqrt_mse(jnp.asarray(md), jnp.asarray(td)))
    ref = np.mean((md - np.sqrt(td)) ** 2 / (td + 1e-6))
    assert np.isclose(ours, ref, rtol=1e-5)
    ours_c = float(chunks_weighted_sqrt_mse(jnp.asarray(md), jnp.asarray(td)))
    ref_c = np.mean((md - np.sqrt(td)) ** 2 / (td + 1000.0))
    assert np.isclose(ours_c, ref_c, rtol=1e-5)


def test_nll_loss():
    lp = jnp.log(jnp.array([[0.7, 0.3], [0.2, 0.8]]))
    loss = float(nll_loss(lp, jnp.array([0, 1])))
    assert np.isclose(loss, -(np.log(0.7) + np.log(0.8)) / 2, rtol=1e-6)


def test_step_lr_matches_reference_update_rule():
    # reference: update at end of epochs 0, 100, 200 (train_model_set.py:585-590)
    lr0, lr_min, decay = 1e-5, 3e-6, 2000.0
    assert step_lr(0, lr0, lr_min, decay) == lr0
    assert np.isclose(step_lr(1, lr0, lr_min, decay), lr_min + lr0)
    assert np.isclose(step_lr(100, lr0, lr_min, decay), lr_min + lr0)
    assert np.isclose(step_lr(101, lr0, lr_min, decay), lr_min + lr0 * 0.1 ** (100 / decay))
    assert np.isclose(step_lr(250, lr0, lr_min, decay), lr_min + lr0 * 0.1 ** (200 / decay))


# -- FSW embedding invariants (SURVEY.md §7: property tests, not lib parity) --


def _rand_set(key, n, d):
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (n, d))
    w = jax.random.uniform(kw, (n,)) + 0.01
    return x, w / w.sum()


def test_fsw_permutation_invariance():
    key = jax.random.PRNGKey(0)
    fsw = init_fsw_params(key, 6, 32)
    x, w = _rand_set(key, 20, 6)
    e1 = fsw_embed(fsw, x, w)
    perm = jax.random.permutation(jax.random.PRNGKey(9), 20)
    e2 = fsw_embed(fsw, x[perm], w[perm])
    assert np.allclose(e1, e2, atol=1e-5)


def test_fsw_zero_weight_padding_insensitive():
    key = jax.random.PRNGKey(0)
    fsw = init_fsw_params(key, 6, 32)
    x, w = _rand_set(key, 20, 6)
    e1 = fsw_embed(fsw, x, w)
    xp = jnp.concatenate([x, jax.random.normal(key, (7, 6))])
    wp = jnp.concatenate([w, jnp.zeros(7)])
    e2 = fsw_embed(fsw, xp, wp)
    assert np.allclose(e1, e2, atol=1e-5)


def test_fsw_weight_scale_invariance():
    # the embedding is of the normalized measure
    key = jax.random.PRNGKey(2)
    fsw = init_fsw_params(key, 4, 16)
    x, w = _rand_set(key, 15, 4)
    e1 = fsw_embed(fsw, x, w)
    e2 = fsw_embed(fsw, x, w * 7.5)
    assert np.allclose(e1, e2, atol=1e-5)


def test_fsw_distance_sensitivity():
    # different point sets should produce different embeddings
    key = jax.random.PRNGKey(3)
    fsw = init_fsw_params(key, 4, 64)
    x1, w = _rand_set(key, 10, 4)
    x2 = x1 + 0.5
    e1 = fsw_embed(fsw, x1, w)
    e2 = fsw_embed(fsw, x2, w)
    assert float(jnp.abs(e1 - e2).max()) > 1e-3


def test_fsw_slice_chunking_equivalence():
    key = jax.random.PRNGKey(4)
    fsw = init_fsw_params(key, 4, 48)
    x, w = _rand_set(key, 12, 4)
    e1 = fsw_embed(fsw, x, w, slice_chunk=16)
    e2 = fsw_embed(fsw, x, w, slice_chunk=128)
    assert np.allclose(e1, e2, atol=1e-5)


def test_fsw_dist_embed_forward_and_grad():
    key = jax.random.PRNGKey(5)
    k, base_dim, fswout, H, E = 5, 3, 24, 16, 8
    params = init_fsw_dist_embed(key, k, base_dim, fswout, H, E)
    # batch of 2 point sets, 10 k-mers each, last col = weights
    kmers = jax.random.randint(key, (2, 10, k), 0, 4).astype(jnp.float32)
    w = jax.random.uniform(key, (2, 10, 1))
    X = jnp.concatenate([kmers, w], axis=-1)
    out = fsw_dist_embed_apply(params, X)
    assert out.shape == (2, E)

    def loss(p):
        return jnp.sum(fsw_dist_embed_apply(p, X) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # lookup + slices must receive gradient
    assert float(jnp.abs(g["lookup"]).max()) > 0
    assert float(jnp.abs(g["fsw"]["slices"]).max()) > 0


def test_fsw_auto_slice_chunk_k9_regime():
    """The k=9 .npy regime (N~131072 points): the auto budget must engage
    chunking (unchunked transients would be 4*16*512*131072*4 = 17 GiB) and
    pick a power-of-2 chunk whose transients fit fsw_sort_budget_bytes()."""
    from kf2vecfsw_tpu.models import fsw as fswmod

    chunk = fswmod._auto_slice_chunk(16, 131072, 512)
    assert 0 < chunk < 512 and (chunk & (chunk - 1)) == 0
    per_slice = 4 * 16 * 131072 * 4
    assert chunk * per_slice <= fswmod.fsw_sort_budget_bytes()
    # N=8192 (k=7 regime) stays unchunked — one fused sort
    assert fswmod._auto_slice_chunk(16, 8192, 512) == 0


def test_fsw_budget_forced_chunking_matches_unchunked(monkeypatch):
    """Forcing the sort budget down must route the apply through lax.map
    slice chunks and reproduce the unchunked forward AND parameter
    gradients (the k=9 giant-clade path, exercised at small dims)."""
    from kf2vecfsw_tpu.models import fsw as fswmod

    key = jax.random.PRNGKey(11)
    k, base_dim, fswout, H, E = 4, 3, 64, 16, 8
    B, N = 3, 32
    params = fswmod.init_fsw_dist_embed(key, k, base_dim, fswout, H, E)
    kmers = jax.random.randint(key, (B, N, k), 0, 4).astype(jnp.float32)
    w = jax.random.uniform(key, (B, N, 1))
    X = jnp.concatenate([kmers, w], axis=-1)

    def loss(p, chunk):
        return jnp.sum(fswmod.fsw_dist_embed_apply(p, X, slice_chunk=chunk) ** 2)

    out_ref = fswmod.fsw_dist_embed_apply(params, X, slice_chunk=0)
    g_ref = jax.grad(lambda p: loss(p, 0))(params)

    # budget that allows only 32 slices per chunk (the floor)
    per_slice = 4 * B * N * 4
    monkeypatch.setattr(fswmod, "fsw_sort_budget_bytes", lambda: per_slice * 32)
    auto = fswmod._auto_slice_chunk(B, N, fswout)
    assert auto == 32
    out_c = fswmod.fsw_dist_embed_apply(params, X)  # slice_chunk=None -> auto
    g_c = jax.grad(lambda p: loss(p, auto))(params)
    assert np.allclose(np.asarray(out_ref), np.asarray(out_c), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_c)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), (
            np.abs(np.asarray(a) - np.asarray(b)).max()
        )


# -- shared-vocab FSW path (models/fsw.py: fsw_embed_shared) -----------------


def _rand_point_set_mats(seed, k, n_genomes, n_lo, n_hi):
    """Random sparse FSW matrices: subsets of the canonical vocab with
    normalized frequencies, in the exact get_kmers (N, k+1) encoding."""
    from kf2vecfsw_tpu.kmer.vocab import (
        FSW_BASE_MAP,
        canonical_vocab_codes,
        codes_to_digit_matrix,
    )

    rng = np.random.default_rng(seed)
    vocab = canonical_vocab_codes(k)
    mats = []
    for _ in range(n_genomes):
        n = int(rng.integers(n_lo, n_hi + 1))
        sel = np.sort(rng.choice(len(vocab), size=n, replace=False))
        digits = codes_to_digit_matrix(vocab[sel], k, FSW_BASE_MAP).astype(np.float32)
        freqs = rng.random(n).astype(np.float32) + 0.01
        freqs /= freqs.sum()
        mats.append(np.column_stack((digits, freqs.astype(np.float32))))
    return mats


def test_fsw_shared_matches_pergenome_forward_and_grad():
    """The shared-vocab forward (one sort for the whole batch) must
    reproduce the per-genome forward AND all parameter gradients: zero
    weights on absent k-mers are exact no-ops in the sinc quantile form."""
    from kf2vecfsw_tpu.ingest.kmers import point_sets_to_vocab_weights
    from kf2vecfsw_tpu.models import fsw as fswmod
    from kf2vecfsw_tpu.train.distance import pad_point_sets

    k, base_dim, fswout, H, E = 4, 3, 48, 16, 8
    mats = _rand_point_set_mats(0, k, 3, 40, 100)
    X = jnp.asarray(pad_point_sets(mats))
    W = jnp.asarray(point_sets_to_vocab_weights(mats, k))
    params = fswmod.init_fsw_dist_embed(jax.random.PRNGKey(5), k, base_dim, fswout, H, E)
    shared_apply = fswmod.make_fsw_shared_apply(k)

    out_pg = fswmod.fsw_dist_embed_apply(params, X)
    out_sh = shared_apply(params, W)
    assert np.allclose(np.asarray(out_pg), np.asarray(out_sh), atol=1e-4), (
        np.abs(np.asarray(out_pg) - np.asarray(out_sh)).max()
    )

    g_pg = jax.grad(lambda p: jnp.sum(fswmod.fsw_dist_embed_apply(p, X) ** 2))(params)
    g_sh = jax.grad(lambda p: jnp.sum(shared_apply(p, W) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_pg), jax.tree.leaves(g_sh)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), (
            np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_fsw_shared_slice_chunking_equivalence():
    from kf2vecfsw_tpu.ingest.kmers import point_sets_to_vocab_weights
    from kf2vecfsw_tpu.models import fsw as fswmod

    k, base_dim, fswout = 4, 3, 48
    mats = _rand_point_set_mats(1, k, 2, 30, 60)
    W = jnp.asarray(point_sets_to_vocab_weights(mats, k))
    params = fswmod.init_fsw_dist_embed(jax.random.PRNGKey(6), k, base_dim, fswout, 16, 8)
    digits = fswmod._vocab_digits_dev(k)
    e1 = fswmod.fsw_dist_embed_apply_shared(params, W, digits, slice_chunk=16)
    e2 = fswmod.fsw_dist_embed_apply_shared(params, W, digits, slice_chunk=0)
    assert np.allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_shared_vocab_gate():
    from kf2vecfsw_tpu.models.fsw import shared_vocab_applicable
    from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_size

    # flagship: k=7, full-genome point sets (N ~ V=8192) -> shared
    assert shared_vocab_applicable(7, 8192, 16)
    # k=9 full genomes (N ~ V=131072) -> shared
    assert shared_vocab_applicable(9, 131072, 16)
    # short contigs: point sets a tiny fraction of the vocab -> per-genome
    assert not shared_vocab_applicable(7, 512, 16)
    # k=10 vocab exceeds the transient budget -> per-genome
    assert canonical_vocab_size(10) > 1 << 18
    assert not shared_vocab_applicable(10, 4 << 20, 16)
    # giant batches would make the sort arity unwieldy -> per-genome
    assert not shared_vocab_applicable(7, 8192, 256)


def test_point_sets_to_vocab_weights_roundtrip():
    """Every (digits, freq) row must land in its own vocab column with the
    exact frequency, and absent columns stay zero."""
    from kf2vecfsw_tpu.ingest.kmers import point_sets_to_vocab_weights
    from kf2vecfsw_tpu.kmer.vocab import canonical_vocab_size

    k = 3
    mats = _rand_point_set_mats(2, k, 4, 5, 20)
    W = point_sets_to_vocab_weights(mats, k)
    assert W.shape == (4, canonical_vocab_size(k))
    for i, m in enumerate(mats):
        assert np.isclose(W[i].sum(), m[:, k].sum())
        assert (W[i] > 0).sum() == m.shape[0]


def test_point_sets_to_vocab_weights_duplicates_sum_and_range_check():
    """Duplicate rows of one k-mer are coincident atoms: their mass SUMS
    (exactly one atom of combined mass under the quantile form); rows with
    digits outside 0..3 raise ValueError so the trainer's documented
    per-genome fallback engages instead of crashing or silently aliasing."""
    import pytest

    from kf2vecfsw_tpu.ingest.kmers import point_sets_to_vocab_weights

    k = 3
    base = _rand_point_set_mats(4, k, 1, 6, 7)[0]
    dup = np.concatenate([base, base[:2]], axis=0)  # first two k-mers twice
    W_base = point_sets_to_vocab_weights([base], k)[0]
    W_dup = point_sets_to_vocab_weights([dup], k)[0]
    cols = np.nonzero(W_dup != W_base)[0]
    assert len(cols) == 2
    assert np.allclose(W_dup[cols], 2 * W_base[cols])
    assert np.isclose(W_dup.sum(), base[:, k].sum() + base[:2, k].sum())

    # shared forward on the summed weights == per-genome forward on the
    # duplicated point set (telescoping sinc identity)
    from kf2vecfsw_tpu.models.fsw import (
        fsw_dist_embed_apply,
        init_fsw_dist_embed,
        make_fsw_shared_apply,
    )

    params = init_fsw_dist_embed(jax.random.PRNGKey(0), k, 3, 24, 16, 8)
    out_pg = fsw_dist_embed_apply(params, jnp.asarray(dup)[None])
    out_sh = make_fsw_shared_apply(k)(params, jnp.asarray(W_dup)[None])
    assert np.allclose(np.asarray(out_pg), np.asarray(out_sh), atol=1e-4)

    bad_hi = base.copy()
    bad_hi[0, 0] = 4.0
    with pytest.raises(ValueError):
        point_sets_to_vocab_weights([bad_hi], k)
    bad_lo = base.copy()
    bad_lo[0, 1] = -1.0
    with pytest.raises(ValueError):
        point_sets_to_vocab_weights([bad_lo], k)


def test_pad_point_sets_fixed_length():
    """n_fixed pins the padded point-set length (the query loader pads to
    the vocab size at k<=9 so all subtree blocks share one compiled
    forward); ignored when smaller than the longest set."""
    from kf2vecfsw_tpu.train.distance import pad_point_sets

    mats = [np.ones((5, 4), np.float32), np.ones((9, 4), np.float32)]
    out = pad_point_sets(mats, n_fixed=32)
    assert out.shape == (2, 32, 4)
    assert np.all(out[0, 5:] == 0) and np.all(out[1, 9:] == 0)
    # too-small n_fixed falls back to the geometric bucket
    assert pad_point_sets(mats, n_fixed=4).shape[1] >= 9
