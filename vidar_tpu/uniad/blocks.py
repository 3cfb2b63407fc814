"""Post-norm transformer blocks used across the UniAD heads.

Functional equivalents of ``torch.nn.TransformerEncoderLayer`` /
``TransformerDecoderLayer`` (post-norm, ReLU FFN) which the reference builds
its interaction modules from
(UniAD/projects/mmdet3d_plugin/uniad/dense_heads/motion_head_plugin/
modules.py:175-280, planning_head.py:63-64).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import TorchLinear


class TorchEncoderLayer(nn.Module):
    """nn.TransformerEncoderLayer: self-attn -> add&norm -> FFN -> add&norm."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            dropout_rate=self.dropout, dtype=self.dtype,
            name='self_attn')(x, x, x, mask=mask,
                              deterministic=deterministic)
        x = nn.LayerNorm(name='norm1')(
            x + nn.Dropout(self.dropout)(a, deterministic=deterministic))
        h = TorchLinear(self.feedforward, dtype=self.dtype, name='linear1')(x)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = TorchLinear(self.embed_dims, dtype=self.dtype, name='linear2')(h)
        return nn.LayerNorm(name='norm2')(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))


class TorchDecoderLayer(nn.Module):
    """nn.TransformerDecoderLayer: self-attn, cross-attn, FFN (post-norm)."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, memory, *, self_mask=None, cross_mask=None,
                 deterministic: bool = True):
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            dropout_rate=self.dropout, dtype=self.dtype,
            name='self_attn')(x, x, x, mask=self_mask,
                              deterministic=deterministic)
        x = nn.LayerNorm(name='norm1')(
            x + nn.Dropout(self.dropout)(a, deterministic=deterministic))
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            dropout_rate=self.dropout, dtype=self.dtype,
            name='cross_attn')(x, memory, memory, mask=cross_mask,
                               deterministic=deterministic)
        x = nn.LayerNorm(name='norm2')(
            x + nn.Dropout(self.dropout)(a, deterministic=deterministic))
        h = TorchLinear(self.feedforward, dtype=self.dtype, name='linear1')(x)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = TorchLinear(self.embed_dims, dtype=self.dtype, name='linear2')(h)
        return nn.LayerNorm(name='norm3')(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic))


class TorchDecoder(nn.Module):
    """Stack of ``TorchDecoderLayer`` (nn.TransformerDecoder, no final norm)."""
    num_layers: int = 3
    embed_dims: int = 256
    num_heads: int = 8
    feedforward: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, memory, *, cross_mask=None,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            x = TorchDecoderLayer(
                self.embed_dims, self.num_heads, self.feedforward,
                self.dropout, dtype=self.dtype, name=f'layers_{i}')(
                    x, memory, cross_mask=cross_mask,
                    deterministic=deterministic)
        return x


class FuserMLP(nn.Module):
    """Linear -> ReLU -> Linear fuser (the reference's *_fuser Sequentials)."""
    hidden: int
    out: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden, dtype=self.dtype, name='fc0')(x)
        return TorchLinear(self.out, dtype=self.dtype, name='fc1')(nn.relu(x))


class LinLNReLU(nn.Module):
    """Linear -> LayerNorm -> ReLU block (mode_fuser / out heads)."""
    out: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.out, dtype=self.dtype, name='fc')(x)
        return nn.relu(nn.LayerNorm(name='ln')(x))
