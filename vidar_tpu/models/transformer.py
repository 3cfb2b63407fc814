"""Perception transformer: camera features + prev BEV -> current BEV.

Re-derivation of reference
projects/mmdet3d_plugin/bevformer/modules/transformer.py:101-195
(get_bev_features) and dense_heads/vidar_bevformer_head.py:24-62 (the
encoder-only BEV head): learned BEV queries + positional encoding, ego-motion
shift of the TSA reference points, rotation of the previous BEV by the yaw
delta, can-bus embedding added to the queries, camera/level embeddings added to
the flattened image features, then the 6-layer encoder.

The ego-motion ``shift`` ([bs, 2] BEV-grid fractions) and rotation angle are
precomputed host-side by the data layer (the reference does this numpy math
inside forward, transformer.py:120-134) and arrive as batch arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .encoder import BEVFormerEncoder
from .layers import MLP, LearnedPositionalEncoding, normal_init
from ..ops.rotate import rotate_bev


class PerceptionTransformer(nn.Module):
    """Holds level/cam embeddings + can-bus MLP + the encoder."""
    embed_dims: int = 256
    num_feature_levels: int = 4
    num_cams: int = 6
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    rotate_prev_bev: bool = True
    use_shift: bool = True
    use_can_bus: bool = True
    can_bus_norm: bool = True
    use_cams_embeds: bool = True
    rotate_center: Tuple[int, int] = (100, 100)
    encoder_num_layers: int = 6
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    sca_capacity_ratio: float = 0.5
    remat: bool = False
    ffn_dropout: float = 0.1
    rotate_mode: str = 'nearest'  # torchvision parity; 'bilinear' available
    dtype: jnp.dtype | None = None

    def setup(self):
        self.level_embeds = self.param(
            'level_embeds', normal_init,
            (self.num_feature_levels, self.embed_dims))
        self.cams_embeds = self.param(
            'cams_embeds', normal_init, (self.num_cams, self.embed_dims))
        self.can_bus_mlp = MLP((self.embed_dims // 2, self.embed_dims),
                               final_norm=self.can_bus_norm,
                               dtype=self.dtype, name='can_bus_mlp')
        self.encoder = BEVFormerEncoder(
            num_layers=self.encoder_num_layers,
            embed_dims=self.embed_dims,
            num_cams=self.num_cams,
            pc_range=self.pc_range,
            bev_h=self.bev_h, bev_w=self.bev_w,
            feedforward_channels=self.embed_dims * 2,
            ffn_dropout=self.ffn_dropout,
            sca_num_levels=self.num_feature_levels,
            sca_capacity_ratio=self.sca_capacity_ratio,
            latent_render_lids=self.latent_render_lids,
            latent_render_cfg=self.latent_render_cfg,
            remat=self.remat,
            dtype=self.dtype, name='encoder')

    def get_bev_features(self, mlvl_feats, bev_queries, bev_pos, can_bus,
                         shift, rotate_angle, lidar2img, img_hw,
                         prev_bev, prev_bev_exists, *,
                         deterministic: bool = True,
                         return_intermediate: bool = False):
        """
        Args:
          mlvl_feats: list of [bs, cams, h_l, w_l, C] feature maps (NHWC).
          bev_queries: [H*W, C] learned queries (from the BEV head).
          bev_pos: [bs, H*W, C] positional embedding.
          can_bus: [bs, 18] rebased can-bus vector of the current frame.
          shift: [bs, 2] ego-motion shift (grid fractions, x/y).
          rotate_angle: [bs] yaw delta in degrees (can_bus[-1]).
          lidar2img: [bs, cams, 4, 4].
          img_hw: static padded image (H, W).
          prev_bev: [bs, H*W, C]; contents ignored where ~prev_bev_exists.
          prev_bev_exists: [bs] bool.
        Returns:
          [bs, H*W, C] BEV features (or [layers, bs, H*W, C]).
        """
        bs = mlvl_feats[0].shape[0]
        bev_queries = jnp.broadcast_to(
            bev_queries[None], (bs,) + bev_queries.shape)

        shift = shift * float(self.use_shift)

        if prev_bev is not None and self.rotate_prev_bev:
            pb = prev_bev.reshape(bs, self.bev_h, self.bev_w, -1)
            pb = rotate_bev(pb, rotate_angle, center=self.rotate_center,
                            mode=self.rotate_mode)
            prev_bev = pb.reshape(bs, self.bev_h * self.bev_w, -1)
        if prev_bev is None:
            prev_bev = jnp.zeros_like(bev_queries)
            prev_bev_exists = jnp.zeros((bs,), bool)

        can_bus_emb = self.can_bus_mlp(can_bus.astype(
            bev_queries.dtype))  # [bs, C]
        bev_queries = bev_queries + can_bus_emb[:, None, :] * float(
            self.use_can_bus)

        feats = []
        spatial_shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            b, cams, h, w, c = feat.shape
            f = feat.reshape(b, cams, h * w, c)
            if self.use_cams_embeds:
                f = f + self.cams_embeds[None, :, None, :].astype(f.dtype)
            f = f + self.level_embeds[None, None, None, lvl].astype(f.dtype)
            feats.append(f)
            spatial_shapes.append((h, w))
        cam_value = jnp.concatenate(feats, axis=2)  # [bs, cams, V, C]

        return self.encoder(
            bev_queries, cam_value, tuple(spatial_shapes), bev_pos,
            lidar2img, img_hw, prev_bev, prev_bev_exists, shift,
            deterministic=deterministic,
            return_intermediate=return_intermediate)

    def __call__(self, *args, **kwargs):
        return self.get_bev_features(*args, **kwargs)


class BEVEncoderHead(nn.Module):
    """Encoder-only BEV head (the reference's ViDARBEVFormerHead only_bev path).

    Owns the learned BEV query embedding and the positional encoding
    (reference vidar_bevformer_head.py:43-62).
    """
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_cams: int = 6
    num_feature_levels: int = 4
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    encoder_num_layers: int = 6
    sca_capacity_ratio: float = 0.5
    rotate_mode: str = 'nearest'
    remat: bool = False
    dtype: jnp.dtype | None = None

    def setup(self):
        self.bev_embedding = self.param(
            'bev_embedding', normal_init,
            (self.bev_h * self.bev_w, self.embed_dims))
        self.positional_encoding = LearnedPositionalEncoding(
            num_feats=self.embed_dims // 2,
            row_num_embed=self.bev_h, col_num_embed=self.bev_w,
            name='positional_encoding')
        self.transformer = PerceptionTransformer(
            embed_dims=self.embed_dims,
            num_feature_levels=self.num_feature_levels,
            num_cams=self.num_cams,
            bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range,
            latent_render_lids=self.latent_render_lids,
            latent_render_cfg=self.latent_render_cfg,
            encoder_num_layers=self.encoder_num_layers,
            sca_capacity_ratio=self.sca_capacity_ratio,
            rotate_mode=self.rotate_mode,
            remat=self.remat,
            dtype=self.dtype, name='transformer')

    def __call__(self, mlvl_feats, can_bus, shift, rotate_angle, lidar2img,
                 img_hw, prev_bev, prev_bev_exists, *,
                 deterministic: bool = True, return_intermediate=False):
        bs = mlvl_feats[0].shape[0]
        bev_pos = self.positional_encoding(bs)  # [bs, H, W, C]
        bev_pos = bev_pos.reshape(bs, self.bev_h * self.bev_w, -1)
        return self.transformer.get_bev_features(
            mlvl_feats, self.bev_embedding, bev_pos, can_bus, shift,
            rotate_angle, lidar2img, img_hw, prev_bev, prev_bev_exists,
            deterministic=deterministic,
            return_intermediate=return_intermediate)
