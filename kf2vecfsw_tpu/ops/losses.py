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
