"""Model-zoo smoke tests: shapes, determinism, finite gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from kf2vecfsw_tpu.models import zoo
from kf2vecfsw_tpu.ops.losses import contigs_weighted_sqrt_mse, lambda_weighted_sqrt_mse


def _finite_grads(loss_fn, params):
    g = jax.grad(loss_fn)(params)
    return all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_mlp_depths():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16))
    for sizes in ([16, 8, 4], [16, 12, 8, 4], [16, 12, 10, 8, 4]):
        params = zoo.init_mlp(key, sizes)
        out = zoo.mlp_apply(params, x)
        assert out.shape == (4, sizes[-1])
        assert _finite_grads(lambda p: jnp.sum(zoo.mlp_apply(p, x) ** 2), params)


def test_classifier_variants():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (5, 16))
    p1 = zoo.init_classifier_embed(key, 16, 8, 6, 3)
    emb, lp = zoo.classifier_embed_apply(p1, x)
    assert emb.shape == (5, 6) and lp.shape == (5, 3)
    assert np.allclose(np.exp(np.asarray(lp)).sum(1), 1, atol=1e-5)
    p2 = zoo.init_classifier_forked(key, 16, 8, 6, 3)
    emb, lp = zoo.classifier_forked_apply(p2, x)
    assert emb.shape == (5, 6) and lp.shape == (5, 3)


def test_dropout_and_bn():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (6, 16))
    p = zoo.init_mlp_dropout(key, [16, 8, 4])
    eval_out = zoo.mlp_dropout_apply(p, x, train=False)
    assert np.allclose(eval_out, zoo.mlp_apply(p, x))
    train_out = zoo.mlp_dropout_apply(p, x, key=key, train=True)
    assert train_out.shape == (6, 4)

    params, state = zoo.init_mlp_bn(key, [16, 8, 4])
    out, new_state = zoo.mlp_bn_apply(params, state, x, train=True)
    assert out.shape == (6, 4)
    assert not np.allclose(new_state["bn1"]["mean"], state["bn1"]["mean"])
    out_eval, _ = zoo.mlp_bn_apply(params, new_state, x, train=False)
    assert out_eval.shape == (6, 4)


def test_cnn_variants():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (3, 16))
    for double in (False, True):
        p = zoo.init_cnn(key, 16, 8, 4, double=double)
        out = zoo.cnn_apply(p, x)
        assert out.shape == (3, 4)


def test_transformer_classifier():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (7, 16))
    p = zoo.init_classifier_trans(key, 16, 8, 32, 3, n_heads=4, ffn_size=16)
    emb, trans, lp = zoo.classifier_trans_apply(p, x, n_heads=4)
    assert emb.shape == (7, 32) and trans.shape == (7, 32) and lp.shape == (7, 3)
    assert np.allclose(np.exp(np.asarray(lp)).sum(1), 1, atol=1e-4)


def test_birnn():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (3, 9, 6))  # (B, T, D)
    p = zoo.init_birnn(key, 6, 5, 2, 4)
    out = zoo.birnn_apply(p, x)
    assert out.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_weight_init_uniform():
    key = jax.random.PRNGKey(6)
    p = zoo.init_mlp(key, [8, 4, 2])
    p2 = zoo.weight_init_uniform(p, key)
    assert float(p2["fc1"]["w"].min()) >= 0.0
    assert float(p2["fc1"]["w"].max()) <= 0.001
    assert np.all(np.asarray(p2["fc1"]["b"]) == 0)


def test_unused_losses():
    rng = np.random.default_rng(0)
    td = np.abs(rng.normal(size=(4, 4))).astype(np.float32)
    md = np.abs(rng.normal(size=(4, 4))).astype(np.float32)
    ma = np.abs(rng.normal(size=(4, 4))).astype(np.float32)
    v = float(contigs_weighted_sqrt_mse(jnp.asarray(md), jnp.asarray(td), jnp.asarray(ma)))
    assert np.isfinite(v)
    lam = jnp.ones(4)
    v2 = float(lambda_weighted_sqrt_mse(jnp.asarray(md), jnp.asarray(td), lam))
    assert np.isfinite(v2)


def test_weight_init_uniform_touches_only_linear_layers():
    """The reference weight_init fires only on nn.Linear: BatchNorm
    scale/bias and LSTM cell tensors must keep their init (an ndim-based
    sweep previously zeroed BN scales, collapsing BN layers to their bias)."""
    key = jax.random.PRNGKey(7)
    p, _ = zoo.init_mlp_bn(key, [8, 6, 4, 2])
    p2 = zoo.weight_init_uniform(p, key)
    assert np.all(np.asarray(p2["bn1"]["scale"]) == np.asarray(p["bn1"]["scale"]))
    assert np.all(np.asarray(p2["bn1"]["scale"]) == 1.0)
    assert float(p2["fc1"]["w"].max()) <= 0.001
    assert np.all(np.asarray(p2["fc1"]["b"]) == 0)

    pr = zoo.init_birnn(key, 8, 4, 1, 3)
    pr2 = zoo.weight_init_uniform(pr, key)
    wi = np.asarray(pr["layers"][0]["fwd"]["wi"]["w"])
    assert np.array_equal(np.asarray(pr2["layers"][0]["fwd"]["wi"]["w"]), wi)
    assert float(pr2["fc"]["w"].max()) <= 0.001
