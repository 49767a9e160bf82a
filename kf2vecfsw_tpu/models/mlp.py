"""Model definitions as pure JAX pytrees.

TPU-native equivalents of the reference's used nn.Modules (models.py):
- DistEmbed   = NeuralNet (models.py:35-49): Linear(V,H) -> ReLU -> Linear(H,E)
- Classifier  = NeuralNetClassifierOnly (models.py:117-132):
                Linear(V,H) -> ReLU -> Linear(H,C) -> log_softmax

Parameters are plain dicts of jnp arrays. Each apply function takes an
optional ``model_axis``: when set (inside shard_map over a 2-D mesh), the
hidden dimension H is sharded Megatron-style — fc1 is column-parallel,
fc2/fc3 row-parallel with a psum over the model axis — so the same code runs
single-chip and tensor-parallel.

Init matches torch.nn.Linear defaults (U(-1/sqrt(fan_in), +1/sqrt(fan_in))
for weights and biases) so convergence behavior is comparable; exact RNG
streams necessarily differ across frameworks (SURVEY.md §7 "training parity").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _linear_init(key, n_in: int, n_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(n_in)
    w = jax.random.uniform(kw, (n_in, n_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (n_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_dist_embed(key, input_size: int, hidden_size: int, embedding_size: int):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _linear_init(k1, input_size, hidden_size),
        "fc2": _linear_init(k2, hidden_size, embedding_size),
    }


def dist_embed_apply(params, x, model_axis: str | None = None):
    h = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jax.nn.relu(h)
    out = h @ params["fc2"]["w"]
    if model_axis is not None:
        out = jax.lax.psum(out, model_axis)
    return out + params["fc2"]["b"]


def dist_embed_specs(model_axis: str | None):
    """PartitionSpecs for tensor-parallel DistEmbed params (hidden sharded)."""
    m = model_axis
    return {
        "fc1": {"w": P(None, m), "b": P(m)},
        "fc2": {"w": P(m, None), "b": P()},
    }


def init_classifier(key, input_size: int, hidden_size: int, num_classes: int):
    k1, k3 = jax.random.split(key)
    return {
        "fc1": _linear_init(k1, input_size, hidden_size),
        "fc3": _linear_init(k3, hidden_size, num_classes),
    }


def classifier_apply(params, x, model_axis: str | None = None):
    h = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jax.nn.relu(h)
    logits = h @ params["fc3"]["w"]
    if model_axis is not None:
        logits = jax.lax.psum(logits, model_axis)
    logits = logits + params["fc3"]["b"]
    return jax.nn.log_softmax(logits, axis=-1)


def classifier_specs(model_axis: str | None):
    m = model_axis
    return {
        "fc1": {"w": P(None, m), "b": P(m)},
        "fc3": {"w": P(m, None), "b": P()},
    }


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
