"""Future-prediction decoder (autoregressive BEV forecasting).

Re-derivation of reference
projects/mmdet3d_plugin/bevformer/modules/vidar_decoder.py:25-280 and
vidar_transformer.py:27-113: each layer runs deformable self-attention at the
target-frame query coordinates (``tgt_points``), deformable cross-attention
over the flattened multi-frame BEV memory at the history-aligned coordinates
(``ref_points``, one level per memory frame), optional latent rendering, FFN.
The released configs disable latent rendering in this decoder (keep_idx
resolves to no layer, config vidar_1_8_nusc_3future.py:36 + decoder strip at
vidar_decoder.py:41-48), which we express as ``latent_render_lids=()``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .attention import PredictionMSDeformableAttention
from .latent_rendering import LatentRendering
from .layers import FFN


class PredictionTransformerLayer(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    num_memory_frames: int = 1
    with_latent_render: bool = False
    latent_render_cfg: Optional[dict] = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, prev_feats, tgt_points, ref_points, bev_pos,
                 bev_h: int, bev_w: int, *, deterministic: bool = True):
        """
        Args:
          query: [bs, H*W, C] target-frame BEV queries.
          prev_feats: [bs, F, H*W, C] memory BEV frames.
          tgt_points: [bs, H*W, 2] in [0,1] — self-attn reference points.
          ref_points: [bs, H*W, F, 2] in [0,1] — per-memory-frame cross-attn
            reference points.
          bev_pos: [bs, H*W, C].
        """
        bs, n, c = query.shape
        f = prev_feats.shape[1]

        query = PredictionMSDeformableAttention(
            embed_dims=self.embed_dims, num_levels=1,
            dtype=self.dtype, name='attentions_0')(
                query, None, tgt_points[:, :, None, :], ((bev_h, bev_w),),
                query_pos=bev_pos, deterministic=deterministic)
        query = nn.LayerNorm(name='norms_0')(query)

        memory = prev_feats.reshape(bs, f * n, c)
        shapes = tuple((bev_h, bev_w) for _ in range(f))
        query = PredictionMSDeformableAttention(
            embed_dims=self.embed_dims, num_levels=f,
            dtype=self.dtype, name='attentions_1')(
                query, memory, ref_points, shapes,
                query_pos=bev_pos, deterministic=deterministic)
        query = nn.LayerNorm(name='norms_1')(query)

        if self.with_latent_render:
            cfg = self.latent_render_cfg or {}
            lr = LatentRendering(dtype=self.dtype, name='latent_render', **cfg)
            query = lr(query.reshape(bs, bev_h, bev_w, c)).reshape(bs, n, c)

        query = FFN(self.feedforward_channels, self.embed_dims,
                    self.ffn_dropout, dtype=self.dtype, name='ffns_0')(
                        query, deterministic=deterministic)
        query = nn.LayerNorm(name='norms_2')(query)
        return query


class PredictionDecoder(nn.Module):
    """Stack of PredictionTransformerLayer, returning all intermediates."""
    num_layers: int = 3
    embed_dims: int = 256
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    num_memory_frames: int = 1
    latent_render_lids: Tuple[int, ...] = ()
    latent_render_cfg: Optional[dict] = None
    return_intermediate: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bev_query, prev_feats, tgt_points, ref_points, bev_pos,
                 bev_h: int, bev_w: int, *, deterministic: bool = True):
        intermediate = []
        query = bev_query
        for lid in range(self.num_layers):
            query = PredictionTransformerLayer(
                embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                ffn_dropout=self.ffn_dropout,
                num_memory_frames=self.num_memory_frames,
                with_latent_render=(lid in self.latent_render_lids),
                latent_render_cfg=self.latent_render_cfg,
                dtype=self.dtype, name=f'layers_{lid}')(
                    query, prev_feats, tgt_points, ref_points, bev_pos,
                    bev_h, bev_w, deterministic=deterministic)
            if self.return_intermediate:
                intermediate.append(query)
        if self.return_intermediate:
            return jnp.stack(intermediate)  # [layers, bs, H*W, C]
        return query[None]
