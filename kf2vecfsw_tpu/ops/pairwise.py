"""Exact pairwise L2 distances.

The reference forces torch.cdist's non-matmul path
(compute_mode='donot_use_mm_for_euclid_dist', utils.py:240-247) for numerical
safety near zero. We keep exact-difference semantics: distances are computed
from explicit diffs, blocked over rows so memory stays bounded for large
backbone exports; the small in-training B x B case is a single fused VPU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _safe_sqrt(sq: jax.Array) -> jax.Array:
    """sqrt with a zero (sub)gradient at 0, like torch.cdist's backward: the
    diagonal of a self-distance matrix is exactly 0 and must not poison
    gradients with sqrt'(0) = inf."""
    positive = sq > 0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)


def pairwise_l2_exact(x: jax.Array) -> jax.Array:
    """All-pairs exact L2 over rows of x: (B, E) -> (B, B)."""
    diff = x[:, None, :] - x[None, :, :]
    return _safe_sqrt(jnp.sum(diff * diff, axis=-1))


def _cdist_block(x_blk: jax.Array, y: jax.Array) -> jax.Array:
    diff = x_blk[:, None, :] - y[None, :, :]
    return _safe_sqrt(jnp.sum(diff * diff, axis=-1))


@functools.partial(jax.jit, static_argnums=(2,))
def cdist_exact_blocked(x: jax.Array, y: jax.Array, block: int = 128) -> jax.Array:
    """Exact cdist (N, E) x (M, E) -> (N, M), row-blocked to bound memory at
    block*M*E floats."""
    n = x.shape[0]
    n_pad = -(-n // block) * block
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    blocks = xp.reshape(n_pad // block, block, -1)
    out = jax.lax.map(lambda b: _cdist_block(b, y), blocks)
    return out.reshape(n_pad, y.shape[0])[:n]


def squared_clamped(dist: jax.Array, threshold: float = 1.0e-6) -> jax.Array:
    """square + clamp-below-threshold-to-0, matching the APPLES-compat export
    (train_model_set.py:624-628, query.py:171-176)."""
    sq = jnp.square(dist)
    return jnp.where(sq < threshold, 0.0, sq)
