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
    pick a power-of-2 chunk whose transients fit FSW_SORT_BUDGET_BYTES."""
    from kf2vecfsw_tpu.models import fsw as fswmod

    chunk = fswmod._auto_slice_chunk(16, 131072, 512)
    assert 0 < chunk < 512 and (chunk & (chunk - 1)) == 0
    per_slice = 4 * 16 * 131072 * 4
    assert chunk * per_slice <= fswmod.FSW_SORT_BUDGET_BYTES
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
    monkeypatch.setattr(fswmod, "FSW_SORT_BUDGET_BYTES", per_slice * 32)
    auto = fswmod._auto_slice_chunk(B, N, fswout)
    assert auto == 32
    out_c = fswmod.fsw_dist_embed_apply(params, X)  # slice_chunk=None -> auto
    g_c = jax.grad(lambda p: loss(p, auto))(params)
    assert np.allclose(np.asarray(out_ref), np.asarray(out_c), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_c)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), (
            np.abs(np.asarray(a) - np.asarray(b)).max()
        )
