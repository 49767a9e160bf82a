"""Training losses (reference: losses.py).

- weighted_sqrt_mse: Loss.my_mse_loss (losses.py:13-49):
  mean( (d_model - sqrt(d_true))^2 / (d_true + 1e-6) )
- chunks_weighted_sqrt_mse: Loss_chunks (losses.py:58-117): same with
  weight 1/(d_true + 1000)
- nll_loss: torch nn.NLLLoss over log_softmax outputs
  (train_classifier_model.py:278)

All losses take an optional pair/sample mask so padded batch entries drop out
while preserving the reference's mean-over-actual-elements semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(values, mask):
    if mask is None:
        return jnp.mean(values)
    total = jnp.sum(jnp.where(mask, values, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def weighted_sqrt_mse(model_dist, true_dist, pair_mask=None, weight_offset: float = 1e-6):
    weight = 1.0 / (true_dist + weight_offset)
    v = (model_dist - jnp.sqrt(true_dist)) ** 2 * weight
    return _masked_mean(v, pair_mask)


def chunks_weighted_sqrt_mse(model_dist, true_dist, pair_mask=None):
    return weighted_sqrt_mse(model_dist, true_dist, pair_mask, weight_offset=1000.0)


def nll_loss(log_probs, labels, sample_mask=None):
    picked = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    return _masked_mean(picked, sample_mask)


# -- defined-but-unused reference losses (capability parity) -------------------


def contigs_weighted_sqrt_mse(model_dist, true_dist, ma_dist, a_const: float = 0.0):
    """Loss_for_contigs (losses.py:120-182): within-genome pairs
    (d_true == 0) are weighted by A/(ma+1e-6), between-genome pairs by
    1/(sqrt(d_true)+1e-6); target is sqrt(d_true)."""
    sqrt_true = jnp.sqrt(true_dist)
    within = sqrt_true == 0.0
    weight = jnp.where(
        within, a_const / (ma_dist + 1e-6), 1.0 / (sqrt_true + 1e-6)
    )
    return jnp.mean((model_dist - sqrt_true) ** 2 * weight)


def lambda_weighted_sqrt_mse(model_dist, true_dist, lam):
    """Loss_wlambda (losses.py:184-253): per-sample learnable weights lam
    applied on both axes of the weighted squared error, normalized by the
    off-diagonal element count."""
    weight = 1.0 / (true_dist + 1e-6)
    v = (model_dist - jnp.sqrt(true_dist)) ** 2 * weight
    s = jnp.sum(lam[None, :] * v, axis=1)
    left = jnp.sum(lam * s)
    n = v.size - v.shape[0]
    return left / jnp.maximum(n, 1)
