"""BEVFormer spatiotemporal encoder (TPU formulation).

Re-derivation of reference projects/mmdet3d_plugin/bevformer/modules/encoder.py
(BEVFormerEncoder.get_reference_points:53-92, point_sampling:94-156,
forward:158-253) and encoder_v2.py (BEVFormerLayerV2 op order self_attn ->
norm -> cross_attn -> norm -> [latent_render] -> ffn -> norm; latent rendering
kept only at ``latent_render_lids``, default layer 2, with the prev-BEV queue
refreshed after that layer: encoder.py:241-245).

Differences from the reference by design:
  * reference points / pillar projection are precomputed as static constants +
    one fp32 einsum against the per-frame ``lidar2img`` batch array — no numpy
    in the traced path;
  * "prev BEV exists" is a traced boolean (per batch) selecting between the
    [prev, cur] value queue and the [cur, cur] fallback, instead of Python
    None-branching — required for `lax.scan` over history frames.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .attention import (TemporalSelfAttention, SpatialCrossAttention,
                        sca_compaction)
from ..ops.msda import pack_raw_levels, fused_tables_feasible
from .latent_rendering import LatentRendering
from .layers import FFN


def reference_points_3d(bev_h: int, bev_w: int, z_range: float,
                        num_points_in_pillar: int) -> np.ndarray:
    """Pillar reference points, [D, H*W, 3] normalised to [0, 1].

    (reference encoder.py:68-78; zs = linspace(0.5, Z-0.5, D)/Z with Z the
    pillar height in meters.)
    """
    d = num_points_in_pillar
    zs = np.linspace(0.5, z_range - 0.5, d, dtype=np.float32) / z_range
    xs = (np.arange(bev_w, dtype=np.float32) + 0.5) / bev_w
    ys = (np.arange(bev_h, dtype=np.float32) + 0.5) / bev_h
    gx, gy = np.meshgrid(xs, ys)  # [H, W]
    gx = gx.reshape(-1)
    gy = gy.reshape(-1)
    out = np.stack([
        np.broadcast_to(gx[None], (d, bev_h * bev_w)),
        np.broadcast_to(gy[None], (d, bev_h * bev_w)),
        np.broadcast_to(zs[:, None], (d, bev_h * bev_w)),
    ], axis=-1)
    return out  # [D, N, 3]


def reference_points_2d(bev_h: int, bev_w: int) -> np.ndarray:
    """BEV-plane reference points [H*W, 2] in [0, 1] (reference encoder.py:81-92)."""
    ys = (np.arange(bev_h, dtype=np.float32) + 0.5) / bev_h
    xs = (np.arange(bev_w, dtype=np.float32) + 0.5) / bev_w
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1)


def point_sampling(ref_3d: jnp.ndarray, pc_range: Sequence[float],
                   lidar2img: jnp.ndarray, img_hw: Tuple[int, int]):
    """Project pillar points into every camera (fp32 island).

    Args:
      ref_3d: [D, N, 3] in [0, 1].
      lidar2img: [bs, num_cams, 4, 4] fp32.
      img_hw: padded image (H, W) used for normalisation.

    Returns:
      ref_cam: [num_cams, bs, N, D, 2] in [0, 1]
      bev_mask: [num_cams, bs, N, D] bool
    (reference encoder.py:94-156 — always fp32, TF32 off.)
    """
    pc = pc_range
    ref = ref_3d.astype(jnp.float32)
    xyz = jnp.stack([
        ref[..., 0] * (pc[3] - pc[0]) + pc[0],
        ref[..., 1] * (pc[4] - pc[1]) + pc[1],
        ref[..., 2] * (pc[5] - pc[2]) + pc[2],
    ], axis=-1)  # [D, N, 3]
    homo = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], -1)  # [D,N,4]

    # [bs, cams, 4, 4] x [D, N, 4] -> [bs, cams, D, N, 4]
    proj = jnp.einsum('bcij,dnj->bcdni', lidar2img.astype(jnp.float32), homo)
    eps = 1e-5
    z = proj[..., 2:3]
    mask = z > eps
    xy = proj[..., 0:2] / jnp.maximum(z, eps)
    h, w = img_hw
    x = xy[..., 0] / w
    y = xy[..., 1] / h
    mask = (mask[..., 0] & (y > 0.0) & (y < 1.0) & (x > 0.0) & (x < 1.0))

    ref_cam = jnp.stack([x, y], -1)  # [bs, cams, D, N, 2]
    ref_cam = ref_cam.transpose(1, 0, 3, 2, 4)  # [cams, bs, N, D, 2]
    bev_mask = mask.transpose(1, 0, 3, 2)  # [cams, bs, N, D]
    return ref_cam, bev_mask


def sca_overflow_count(lidar2img, img_hw, bev_h: int, bev_w: int,
                       pc_range, capacity_ratio: float,
                       num_points_in_pillar: int = 4):
    """Worst-case dropped-visible-query count for the SCA static capacity.

    The fixed-capacity compaction (``attention.sca_compaction``) silently
    drops visible queries ranked past ``cap`` — a parity loss the reference
    can never hit (its dynamic rebatching keeps every visible query,
    spatial_cross_attention.py:135-166). This recomputes per-camera
    visibility from the batch calibration (pure geometry, ~1 M FLOPs) and
    returns max(visible - cap, 0) over every (frame, camera) — wired into
    the standard train metrics so overflow is visible in every log line.

    Args:
      lidar2img: [..., cams, 4, 4] (any leading batch/frame dims).
      img_hw: padded image (H, W).
    Returns: scalar int32 — 0 iff no visible query was dropped anywhere.
    """
    n = bev_h * bev_w
    if not (0 < capacity_ratio < 1):
        return jnp.zeros((), jnp.int32)
    cap = int(n * capacity_ratio)
    ref_3d = jnp.asarray(reference_points_3d(
        bev_h, bev_w, pc_range[5] - pc_range[2], num_points_in_pillar))
    l2i = lidar2img.reshape((-1,) + lidar2img.shape[-3:])
    _, bev_mask = point_sampling(ref_3d, pc_range, l2i, img_hw)
    vis = jnp.any(bev_mask, axis=-1).sum(axis=2)  # [cams, bs*frames]
    return jnp.maximum(vis.max() - cap, 0).astype(jnp.int32)


class BEVFormerLayer(nn.Module):
    """One encoder layer: TSA -> LN -> SCA -> LN -> [latent render] -> FFN -> LN."""
    embed_dims: int = 256
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    num_cams: int = 6
    sca_num_levels: int = 4
    sca_num_points: int = 8
    sca_capacity_ratio: float = 0.5
    tsa_num_points: int = 4
    with_latent_render: bool = False
    latent_render_cfg: Optional[dict] = None
    bev_h: int = 200
    bev_w: int = 200
    spatial_shapes: Tuple[Tuple[int, int], ...] = ()
    deterministic: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, value_pair, ref_2d_pair, cam_value, ref_cam,
                 bev_mask, bev_pos, sca_compact=None, sca_packed_raw=None):
        bs = query.shape[0]
        bev_h, bev_w = self.bev_h, self.bev_w
        spatial_shapes = self.spatial_shapes
        deterministic = self.deterministic
        query = TemporalSelfAttention(
            embed_dims=self.embed_dims, num_points=self.tsa_num_points,
            dtype=self.dtype, name='attentions_0')(
                query, value_pair, ref_2d_pair, bev_h, bev_w,
                query_pos=bev_pos, deterministic=deterministic)
        query = nn.LayerNorm(name='norms_0')(query)
        query = SpatialCrossAttention(
            embed_dims=self.embed_dims, num_cams=self.num_cams,
            deform_num_levels=self.sca_num_levels,
            deform_num_points=self.sca_num_points,
            capacity_ratio=self.sca_capacity_ratio,
            dtype=self.dtype, name='attentions_1')(
                query, cam_value, ref_cam, bev_mask, spatial_shapes,
                compact=sca_compact, packed_raw=sca_packed_raw,
                deterministic=deterministic)
        query = nn.LayerNorm(name='norms_1')(query)
        if self.with_latent_render:
            cfg = self.latent_render_cfg or {}
            lr = LatentRendering(dtype=self.dtype, name='latent_render', **cfg)
            query = lr(query.reshape(bs, bev_h, bev_w, -1))
            query = query.reshape(bs, bev_h * bev_w, -1)
        query = FFN(self.feedforward_channels, self.embed_dims,
                    self.ffn_dropout, dtype=self.dtype, name='ffns_0')(
                        query, deterministic=deterministic)
        query = nn.LayerNorm(name='norms_2')(query)
        return query


class BEVFormerEncoder(nn.Module):
    """6-layer spatiotemporal encoder with latent rendering at ``latent_render_lids``."""
    num_layers: int = 6
    embed_dims: int = 256
    num_cams: int = 6
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_points_in_pillar: int = 4
    bev_h: int = 200
    bev_w: int = 200
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    sca_num_levels: int = 4
    sca_num_points: int = 8
    sca_capacity_ratio: float = 0.5
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bev_query, cam_value, spatial_shapes, bev_pos,
                 lidar2img, img_hw, prev_bev, prev_bev_exists, shift,
                 *, deterministic: bool = True, return_intermediate=False):
        """
        Args:
          bev_query: [bs, H*W, C]
          cam_value: [bs, cams, V, C] multi-level flattened camera features.
          spatial_shapes: static ((h, w), ...) per level.
          bev_pos: [bs, H*W, C]
          lidar2img: [bs, cams, 4, 4]
          img_hw: static (H, W) of the padded input image.
          prev_bev: [bs, H*W, C] (contents ignored where ~prev_bev_exists)
          prev_bev_exists: [bs] bool (traced)
          shift: [bs, 2] ego-motion shift in BEV grid fractions.
        """
        bs, n, c = bev_query.shape
        z_range = self.pc_range[5] - self.pc_range[2]
        ref_3d = jnp.asarray(reference_points_3d(
            self.bev_h, self.bev_w, z_range, self.num_points_in_pillar))
        ref_2d = jnp.asarray(reference_points_2d(self.bev_h, self.bev_w))
        ref_2d = jnp.broadcast_to(ref_2d[None], (bs, n, 2))

        ref_cam, bev_mask = point_sampling(ref_3d, self.pc_range, lidar2img,
                                           img_hw)

        exists = prev_bev_exists.reshape(bs, 1, 1)
        exists4 = prev_bev_exists.reshape(bs, 1, 1, 1)
        shift_ref_2d = ref_2d + shift[:, None, :]
        ref_prev = jnp.where(exists, shift_ref_2d, ref_2d)
        # [bs, 2, N, 1, 2]: slot 0 = prev refs (shifted), slot 1 = cur refs.
        ref_pair = jnp.stack([ref_prev, ref_2d], axis=1)[:, :, :, None, :]

        prev_slot = jnp.where(exists, prev_bev, bev_query)
        value_pair = jnp.stack([prev_slot, bev_query], axis=1)
        # when no prev exists, TSA must see [cur_layer_query, cur_layer_query]
        # rather than the frozen initial bev_query — tracked via this flag.
        use_queue = exists4

        query = bev_query
        intermediate = []
        # the SCA compaction plan is geometry-only — build it once per
        # frame and share it across all layers (saves the per-layer
        # partition + reference gathers).
        cap = (int(n * self.sca_capacity_ratio)
               if 0 < self.sca_capacity_ratio < 1 else n)
        sca_compact = (sca_compaction(ref_cam, bev_mask, cap)
                       if cap < n else None)
        # The SCA value (camera features) is frame-constant too: corner-pack
        # it ONCE here and let each layer fold only its value_proj into the
        # packed rows (ops/msda.pack_raw_levels docstring). CPU keeps the
        # XLA path (the fused kernel would run interpreted there).
        # TRAINING keeps the per-layer path: hoisting makes the shared
        # packed_raw an input of all 6 remat'd layers, and its cotangent
        # pipeline (per-layer f32 table-grad transpose copy 551 MB + bf16
        # round 275 MB + fold-adjoint matmul, x6 concurrently scheduled)
        # dominated the flagship train-step OOM; the per-layer path's
        # cross-layer cotangent is the 95 MB value-space gradient instead.
        sca_packed_raw = None
        if (deterministic and jax.default_backend() != 'cpu'
                and self.embed_dims % 8 == 0
                and fused_tables_feasible(tuple(spatial_shapes),
                                          self.embed_dims // 8)):
            bsc, cams, v_len, cdim = cam_value.shape
            sca_packed_raw = pack_raw_levels(
                cam_value.reshape(bsc * cams, v_len, cdim),
                tuple(spatial_shapes))
        layer_cls = BEVFormerLayer
        if self.remat:
            layer_cls = nn.remat(BEVFormerLayer, static_argnums=())
        for lid in range(self.num_layers):
            layer_value_pair = jnp.where(
                use_queue, value_pair,
                jnp.stack([query, query], axis=1))
            query = layer_cls(
                embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                ffn_dropout=self.ffn_dropout,
                num_cams=self.num_cams,
                sca_num_levels=self.sca_num_levels,
                sca_num_points=self.sca_num_points,
                sca_capacity_ratio=self.sca_capacity_ratio,
                with_latent_render=(lid in self.latent_render_lids),
                latent_render_cfg=self.latent_render_cfg,
                bev_h=self.bev_h, bev_w=self.bev_w,
                spatial_shapes=tuple(spatial_shapes),
                deterministic=deterministic,
                dtype=self.dtype, name=f'layers_{lid}')(
                    query, layer_value_pair, ref_pair, cam_value, ref_cam,
                    bev_mask, bev_pos, sca_compact, sca_packed_raw)
            if lid in self.latent_render_lids:
                # refresh the current slot of the TSA queue after latent
                # rendering (reference encoder.py:241-245).
                value_pair = jnp.where(
                    use_queue,
                    jnp.stack([value_pair[:, 0], query], axis=1),
                    value_pair)
            if return_intermediate:
                intermediate.append(query)
        if return_intermediate:
            return jnp.stack(intermediate)
        return query
