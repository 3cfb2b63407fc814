"""Sine/learned positional embeddings (models/utils/position_embedding.py
equivalent) — the sine variant the reference keeps alongside the learned one.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_positional_encoding(h: int, w: int, num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             scale: float = 2 * math.pi) -> jnp.ndarray:
    """DETR SinePositionalEncoding over an all-valid mask: [H, W, 2*num_feats]."""
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = temperature ** (
        2 * (jnp.arange(num_feats, dtype=jnp.float32) // 2) / num_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
