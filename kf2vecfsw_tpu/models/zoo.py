"""Experimental model zoo.

JAX equivalents of the reference's *defined-but-unused* architectures
(models.py: BiRNN :13-32, NeuralNetClassifier :70-89,
NeuralNetClassifierForked :92-113, NeuralNetClassifierTrans :136-171,
NeuralNet_2layer :176-192, CNN_network/_2 :197-266, NeuralNet_3layer
:269-291, NeuralNet_4layer :294-320, NeuralNet_2l_drop :323-348,
NeuralNet_2l_bn :351-373). None are reachable from the reference CLI; they
are provided for capability parity and research use.

All models are pure pytrees: ``init_*(key, ...) -> params`` and
``*_apply(params, x, ...) -> out``. Stochastic/stateful layers take explicit
inputs (dropout rng, batchnorm state) in functional style.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mlp import _linear_init


# -- multi-layer MLP embedders (NeuralNet_{2,3,4}layer) ------------------------


def init_mlp(key, sizes: list[int]):
    """sizes = [in, h1, ..., out]; ReLU between layers, linear head."""
    keys = jax.random.split(key, len(sizes) - 1)
    return {
        f"fc{i + 1}": _linear_init(keys[i], sizes[i], sizes[i + 1])
        for i in range(len(sizes) - 1)
    }


def mlp_apply(params, x):
    n = len(params)
    for i in range(n):
        layer = params[f"fc{i + 1}"]
        x = x @ layer["w"] + layer["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


# -- classifier with embedding head (NeuralNetClassifier :70-89) ---------------


def init_classifier_embed(key, input_size, hidden_size, embedding_size, num_classes):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": _linear_init(k1, input_size, hidden_size),
        "fc2": _linear_init(k2, hidden_size, embedding_size),
        "fc3": _linear_init(k3, embedding_size, num_classes),
    }


def classifier_embed_apply(params, x):
    h = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    emb = h @ params["fc2"]["w"] + params["fc2"]["b"]
    logits = jax.nn.relu(emb) @ params["fc3"]["w"] + params["fc3"]["b"]
    return emb, jax.nn.log_softmax(logits, axis=-1)


# -- forked classifier (NeuralNetClassifierForked :92-113) ---------------------


def init_classifier_forked(key, input_size, hidden_size, embedding_size, num_classes):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": _linear_init(k1, input_size, hidden_size),
        "fc2": _linear_init(k2, hidden_size, embedding_size),
        "fc3": _linear_init(k3, hidden_size, num_classes),
    }


def classifier_forked_apply(params, x):
    h = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    emb = h @ params["fc2"]["w"] + params["fc2"]["b"]
    logits = h @ params["fc3"]["w"] + params["fc3"]["b"]
    return emb, jax.nn.log_softmax(logits, axis=-1)


# -- dropout MLP (NeuralNet_2l_drop :323-348) ----------------------------------


def init_mlp_dropout(key, sizes: list[int]):
    return init_mlp(key, sizes)


def mlp_dropout_apply(params, x, key=None, rate: float = 0.2, train: bool = False):
    n = len(params)
    for i in range(n):
        layer = params[f"fc{i + 1}"]
        x = x @ layer["w"] + layer["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
            if train and key is not None:
                key, sub = jax.random.split(key)
                keep = jax.random.bernoulli(sub, 1 - rate, x.shape)
                x = jnp.where(keep, x / (1 - rate), 0.0)
    return x


# -- batchnorm MLP (NeuralNet_2l_bn :351-373) ----------------------------------


def init_mlp_bn(key, sizes: list[int]):
    params = init_mlp(key, sizes)
    state = {}
    for i in range(1, len(sizes) - 1):
        h = sizes[i]
        params[f"bn{i}"] = {"scale": jnp.ones(h), "bias": jnp.zeros(h)}
        state[f"bn{i}"] = {"mean": jnp.zeros(h), "var": jnp.ones(h)}
    return params, state


def mlp_bn_apply(params, state, x, train: bool = False, momentum: float = 0.9, eps: float = 1e-5):
    n = sum(1 for k in params if k.startswith("fc"))
    new_state = dict(state)
    for i in range(n):
        layer = params[f"fc{i + 1}"]
        x = x @ layer["w"] + layer["b"]
        if i < n - 1:
            bn = params[f"bn{i + 1}"]
            st = state[f"bn{i + 1}"]
            if train:
                mean = jnp.mean(x, axis=0)
                var = jnp.var(x, axis=0)
                # torch BatchNorm1d normalizes with the BIASED batch var but
                # tracks the UNBIASED (n/(n-1)) var in running stats
                n_rows = x.shape[0]
                var_unbiased = var * (n_rows / max(n_rows - 1, 1))
                new_state[f"bn{i + 1}"] = {
                    "mean": momentum * st["mean"] + (1 - momentum) * mean,
                    "var": momentum * st["var"] + (1 - momentum) * var_unbiased,
                }
            else:
                mean, var = st["mean"], st["var"]
            x = (x - mean) * jax.lax.rsqrt(var + eps) * bn["scale"] + bn["bias"]
            x = jax.nn.relu(x)
    return x, new_state


# -- "CNN" networks (CNN_network/_2 :197-266) -----------------------------------
# Conv1d(kernel_size=1) over the feature-as-channel axis with a length-1
# spatial dim is algebraically a dense channel-mixing Linear; implemented as
# such (the idiomatic XLA form — one MXU matmul instead of a conv).


def init_cnn(key, input_size, hidden_size, embedding_size, double: bool = False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mid = 2 * input_size if double else input_size
    params = {
        "conv1": _linear_init(k1, input_size, mid),
        "fc1": _linear_init(k3, mid, hidden_size),
        "fc2": _linear_init(k4, hidden_size, embedding_size),
    }
    if double:
        params["conv2"] = _linear_init(k2, mid, mid)
    return params


def cnn_apply(params, x):
    h = jax.nn.sigmoid(x @ params["conv1"]["w"] + params["conv1"]["b"])
    if "conv2" in params:
        h = jax.nn.sigmoid(h @ params["conv2"]["w"] + params["conv2"]["b"])
    h = jax.nn.celu(h @ params["fc1"]["w"] + params["fc1"]["b"])
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


# -- transformer classifier (NeuralNetClassifierTrans :136-171) -----------------
# The reference attends ACROSS THE BATCH (out.unsqueeze(0) makes the batch
# the sequence): one post-norm TransformerEncoderLayer (nhead=16, relu FFN).


def init_classifier_trans(
    key, input_size, hidden_size, embedding_size, num_classes,
    n_heads: int = 16, ffn_size: int = 2048,
):
    ks = jax.random.split(key, 8)
    d = embedding_size
    return {
        "fc1": _linear_init(ks[0], input_size, hidden_size),
        "fc2": _linear_init(ks[1], hidden_size, d),
        "attn": {
            "qkv": _linear_init(ks[2], d, 3 * d),
            "out": _linear_init(ks[3], d, d),
        },
        "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "ffn1": _linear_init(ks[4], d, ffn_size),
        "ffn2": _linear_init(ks[5], ffn_size, d),
        "ln2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "fc3": _linear_init(ks[6], d, num_classes),
    }


def _layernorm(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def classifier_trans_apply(params, x, n_heads: int = 16):
    h = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    emb = h @ params["fc2"]["w"] + params["fc2"]["b"]  # (B, d)

    d = emb.shape[-1]
    nh = n_heads
    if d % nh:
        # torch raises at construction; here reshape(-1, nh, hd) would
        # silently absorb the remainder into the BATCH dim and mix rows
        raise ValueError(f"embedding size {d} not divisible by n_heads {nh}")
    hd = d // nh
    qkv = emb @ params["attn"]["qkv"]["w"] + params["attn"]["qkv"]["b"]
    q, k_, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(-1, nh, hd).transpose(1, 0, 2)
    k_ = k_.reshape(-1, nh, hd).transpose(1, 0, 2)
    v = v.reshape(-1, nh, hd).transpose(1, 0, 2)
    scores = jnp.einsum("hqd,hkd->hqk", q, k_) / jnp.sqrt(hd).astype(q.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("hqk,hkd->hqd", attn, v).transpose(1, 0, 2).reshape(-1, d)
    ctx = ctx @ params["attn"]["out"]["w"] + params["attn"]["out"]["b"]
    h2 = _layernorm(emb + ctx, params["ln1"])
    ffn = jax.nn.relu(h2 @ params["ffn1"]["w"] + params["ffn1"]["b"])
    ffn = ffn @ params["ffn2"]["w"] + params["ffn2"]["b"]
    trans = _layernorm(h2 + ffn, params["ln2"])

    logits = trans @ params["fc3"]["w"] + params["fc3"]["b"]
    return emb, trans, jax.nn.log_softmax(logits, axis=-1)


# -- bidirectional LSTM classifier (BiRNN :13-32) --------------------------------


def init_birnn(key, input_size, hidden_size, num_layers, num_classes):
    ks = jax.random.split(key, 4 * num_layers + 1)
    layers = []
    idx = 0
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else 2 * hidden_size
        cell = {}
        for direction in ("fwd", "bwd"):
            cell[direction] = {
                "wi": _linear_init(ks[idx], d_in, 4 * hidden_size),
                "wh": _linear_init(ks[idx + 1], hidden_size, 4 * hidden_size),
            }
            idx += 2
        layers.append(cell)
    return {"layers": layers, "fc": _linear_init(ks[-1], 2 * hidden_size, num_classes)}


def _lstm_scan(cell, xs, hidden_size):
    def step(carry, x):
        h, c = carry
        gates = x @ cell["wi"]["w"] + cell["wi"]["b"] + h @ cell["wh"]["w"] + cell["wh"]["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    B = xs.shape[1]
    init = (jnp.zeros((B, hidden_size)), jnp.zeros((B, hidden_size)))
    _, hs = jax.lax.scan(step, init, xs)
    return hs


def birnn_apply(params, x):
    """x: (B, T, D) -> (B, num_classes) from the last timestep."""
    xs = x.transpose(1, 0, 2)  # (T, B, D)
    hidden_size = params["layers"][0]["fwd"]["wh"]["w"].shape[0]
    for cell in params["layers"]:
        fwd = _lstm_scan(cell["fwd"], xs, hidden_size)
        bwd = _lstm_scan(cell["bwd"], xs[::-1], hidden_size)[::-1]
        xs = jnp.concatenate([fwd, bwd], axis=-1)
    last = xs[-1]
    return last @ params["fc"]["w"] + params["fc"]["b"]


# -- init helpers (weight_inits.py:5-24, parameter_inits.py:7-13) ----------------


_LINEAR_KEY = None  # compiled lazily (avoid importing re at module import)


def weight_init_uniform(params, key, low: float = 0.0, high: float = 0.001):
    """Reinitialize LINEAR layers only: weights ~ U(low, high), biases 0
    (the reference's optional weight_init, commented out at
    train_model_set.py:381, fires via isinstance(m, nn.Linear)). Linear =
    an {fc*, ffn*, qkv, out}-named {"w","b"} dict with a 2-D weight;
    BatchNorm scale/bias, LSTM cell and conv tensors stay at their init,
    matching the torch visitor (an ndim-based sweep previously zeroed BN
    scales — making every BN layer output its zero bias — and
    re-randomized recurrent weights torch would leave alone)."""
    import re

    global _LINEAR_KEY
    if _LINEAR_KEY is None:
        _LINEAR_KEY = re.compile(r"^(fc\d*|ffn\d+|qkv|out)$")
    counter = [0]

    def walk(node, name):
        if (
            isinstance(node, dict)
            and set(node) == {"w", "b"}
            and _LINEAR_KEY.match(name or "")
            and node["w"].ndim == 2
        ):
            counter[0] += 1
            k = jax.random.fold_in(key, counter[0])
            return {
                "w": jax.random.uniform(k, node["w"].shape, node["w"].dtype, low, high),
                "b": jnp.zeros_like(node["b"]),
            }
        if isinstance(node, dict):
            return {kk: walk(vv, kk) for kk, vv in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(vv, name) for vv in node)
        return node

    return walk(params, "")


def new_parameter(shape):
    """All-ones parameter tensor (parameter_inits.py:7-13)."""
    return jnp.ones(shape, jnp.float32)
