"""Standalone loss functions.

``label_smoothing_loss`` matches reference
bevformer/losses/label_smoothing.py:9-40 (present in the reference registry,
unused by the released configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                         smoothing: float = 0.1,
                         weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """KL(smooth_onehot || softmax(logits)), mean over (weighted) elements."""
    num_classes = logits.shape[-1]
    conf = 1.0 - smoothing
    low = smoothing / max(num_classes - 1, 1)
    onehot = jax.nn.one_hot(labels, num_classes)
    target = onehot * conf + (1.0 - onehot) * low
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -(target * logp).sum(-1)
    if weights is not None:
        return (loss * weights).sum() / jnp.maximum(weights.sum(), 1.0)
    return loss.mean()
