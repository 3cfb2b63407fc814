"""Shared building blocks: torch-parity initializers, FFN, positional encoding.

Initializer parity matters because the released reference checkpoints were
trained from these distributions (mmcv defaults): torch ``nn.Linear`` default
init is kaiming-uniform(a=sqrt(5)) for the kernel — U(-1/sqrt(fan_in),
1/sqrt(fan_in)) — and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the bias; mmcv
``xavier_init(distribution='uniform')`` is U(-a, a), a = sqrt(6/(fan_in +
fan_out)), bias 0.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Flax kernel shape is [in, out]; torch fan_in = shape[0]."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def normal_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class TorchLinear(nn.Module):
    """nn.Linear with torch default initialization."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        dense = nn.Dense(self.features, use_bias=self.use_bias,
                         kernel_init=torch_linear_kernel_init,
                         bias_init=torch_linear_bias_init(in_features),
                         dtype=self.dtype, name='linear')
        return dense(x)


class XavierLinear(nn.Module):
    """nn.Linear with mmcv xavier_init(distribution='uniform', bias=0)."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dense = nn.Dense(self.features,
                         kernel_init=xavier_uniform_init,
                         bias_init=nn.initializers.zeros,
                         dtype=self.dtype, name='linear')
        return dense(x)


class FFN(nn.Module):
    """mmcv FFN: Linear -> ReLU -> Dropout -> Linear -> Dropout (+ identity).

    (reference config: feedforward_channels=512, ffn_dropout=0.1,
    projects/configs/vidar_pretrain/nusc_1_8_subset/vidar_1_8_nusc_3future.py:213-216)
    """
    feedforward_channels: int
    embed_dims: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, identity=None, *, deterministic: bool = True):
        if identity is None:
            identity = x
        h = TorchLinear(self.feedforward_channels, dtype=self.dtype,
                        name='fc1')(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = TorchLinear(self.embed_dims, dtype=self.dtype, name='fc2')(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return identity + h


class LearnedPositionalEncoding(nn.Module):
    """mmdet LearnedPositionalEncoding: concat(col_embed[x], row_embed[y]).

    Produces a [bs, H, W, 2*num_feats] (channels-last) positional map; the
    reference layout is [bs, 2*num_feats, H, W]
    (config: projects/configs/.../vidar_1_8_nusc_3future.py:247-252).
    """
    num_feats: int = 128
    row_num_embed: int = 200
    col_num_embed: int = 200

    @nn.compact
    def __call__(self, bs: int):
        # torch nn.Embedding default init: N(0, 1).
        row = self.param('row_embed', normal_init,
                         (self.row_num_embed, self.num_feats))
        col = self.param('col_embed', normal_init,
                         (self.col_num_embed, self.num_feats))
        h, w = self.row_num_embed, self.col_num_embed
        x_embed = jnp.broadcast_to(col[None, :, :], (h, w, self.num_feats))
        y_embed = jnp.broadcast_to(row[:, None, :], (h, w, self.num_feats))
        pos = jnp.concatenate([x_embed, y_embed], axis=-1)  # [H, W, 2F]
        return jnp.broadcast_to(pos[None], (bs, h, w, 2 * self.num_feats))


class MLP(nn.Module):
    """Sequential Linear/ReLU stack with optional trailing LayerNorm.

    Used for can_bus embedding (reference:
    projects/mmdet3d_plugin/bevformer/modules/transformer.py:75-82 and
    dense_heads/vidar_head_base.py:105-112).
    """
    hidden: Sequence[int]
    final_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.hidden):
            x = TorchLinear(f, dtype=self.dtype, name=f'fc{i}')(x)
            x = nn.relu(x)
        if self.final_norm:
            x = nn.LayerNorm(name='norm')(x)
        return x
