"""BEVFormerV2 family (registered-but-unused reference stack, SURVEY §2.2):

* ``ResNetFusion``        <- modules/transformerV2.py:16-52 — concat per-frame
  BEV maps, N residual conv blocks, linear+LayerNorm back to embed_dims.
* ``PerceptionTransformerBEVEncoder`` <- transformerV2.py:55-173 — single-frame
  BEV encoding: no temporal shift, no prev-BEV rotation (shift=0, prev=None).
* ``PerceptionTransformerV2``         <- transformerV2.py:176-353 — per-frame
  BEV encodes over a ``frames`` window (history/future slots detached), fused
  by ResNetFusion, then the DETR decoder with reference points from a learned
  linear over the query embedding.
* ``BEVFormerV2``         <- detectors/bevformerV2.py:18-269 — per-frame
  *independent* no-grad history encoding (NOT the V1 recurrence), fusion, DETR
  head; optional mono-head hook weighted by ``mono_loss_weight``
  (bevformerV2.py:120-153, 219-224).

Norm note: the reference's fusion blocks use SyncBN; here GroupNorm(32) — a
batch-independent TPU-native substitution (these components back no released
checkpoint, so import parity is not required).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNet
from .fpn import FPN
from .grid_mask import grid_mask
from .transformer import BEVEncoderHead
from .detection import BEVFormerHead
from .layers import TorchLinear
from ..data.structures import ViDARBatch


def _gn_groups(channels: int) -> int:
    for g in (32, 16, 8, 4, 2):
        if channels % g == 0:
            return g
    return 1


class _BasicBlock(nn.Module):
    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ident = x
        y = nn.Conv(self.channels, (3, 3), use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        y = nn.GroupNorm(num_groups=_gn_groups(self.channels), name='norm1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = nn.GroupNorm(num_groups=_gn_groups(self.channels), name='norm2')(y)
        if ident.shape[-1] != self.channels:
            ident = nn.Conv(self.channels, (3, 3), use_bias=False,
                            dtype=self.dtype, name='downsample_conv')(ident)
            ident = nn.GroupNorm(num_groups=_gn_groups(self.channels), name='downsample_norm')(ident)
        return nn.relu(y + ident)


class ResNetFusion(nn.Module):
    """Fuse ``num_frames`` BEV maps: [bs, H, W, F*C] -> [bs, H*W, out]."""
    out_channels: int
    inter_channels: int
    num_layer: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bev_list):
        x = jnp.concatenate(bev_list, axis=-1)  # [bs, H, W, F*C]
        for i in range(self.num_layer):
            x = _BasicBlock(self.inter_channels, dtype=self.dtype,
                            name=f'layer{i}')(x)
        bs, h, w, c = x.shape
        x = x.reshape(bs, h * w, c)
        x = TorchLinear(self.out_channels, name='out_proj')(x)
        return nn.LayerNorm(name='out_norm')(x)


class BEVFormerV2(nn.Module):
    """V2 detector: independent per-frame BEV encode + fusion + DETR head.

    ``frames``: relative frame offsets like the reference's (-2, -1, 0) —
    slot 0 must be present; non-zero slots are encoded without gradient
    (bevformerV2.py:165-185) and missing slots are filled by neighbour copy
    (transformerV2.py:312-323).
    """
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_cams: int = 6
    num_classes: int = 10
    num_query: int = 900
    backbone_depth: int = 101
    backbone_dcn: Tuple[bool, ...] = (False, False, True, True)
    frozen_stages: int = 1
    use_grid_mask: bool = False
    frames: Tuple[int, ...] = (0,)
    num_fusion: int = 3
    inter_channels: Optional[int] = None
    encoder_num_layers: int = 6
    mono_loss_weight: float = 1.0
    dtype: jnp.dtype | None = None

    def setup(self):
        self.img_backbone = ResNet(
            depth=self.backbone_depth, out_indices=(1, 2, 3),
            frozen_stages=self.frozen_stages,
            stage_with_dcn=self.backbone_dcn,
            dtype=self.dtype, name='img_backbone')
        self.img_neck = FPN(out_channels=self.embed_dims, num_outs=4,
                            dtype=self.dtype, name='img_neck')
        # single-frame encoder head: shift/rotation disabled is expressed by
        # passing zero shift / no prev bev at call time
        self.bev_head = BEVEncoderHead(
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range, num_cams=self.num_cams,
            latent_render_lids=(), latent_render_cfg=None,
            encoder_num_layers=self.encoder_num_layers,
            dtype=self.dtype, name='pts_bbox_head_bev')
        if len(self.frames) > 1:
            inter = (self.inter_channels if self.inter_channels is not None
                     else len(self.frames) * self.embed_dims)
            self.fusion = ResNetFusion(
                out_channels=self.embed_dims, inter_channels=inter,
                num_layer=self.num_fusion, dtype=self.dtype, name='fusion')
        self.det_head = BEVFormerHead(
            num_classes=self.num_classes, num_query=self.num_query,
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range, dtype=self.dtype,
            name='pts_bbox_head_det')

    def _encode_frame(self, images_t, batch: ViDARBatch, t_idx, img_hw,
                      deterministic=True):
        bs, cams, h, w, _ = images_t.shape
        x = images_t.reshape(bs * cams, h, w, 3)
        feats = self.img_neck(self.img_backbone(x))
        mlvl = []
        for f in feats:
            _, fh, fw, c = f.shape
            mlvl.append(f.reshape(bs, cams, fh, fw, c))
        zero_shift = jnp.zeros((bs, 2), jnp.float32)
        no_prev = jnp.zeros((bs,), bool)
        return self.bev_head(
            mlvl, batch.can_bus[:, t_idx], zero_shift,
            jnp.zeros((bs,), jnp.float32), batch.lidar2img[:, t_idx],
            img_hw, None, no_prev, deterministic=deterministic)

    def __call__(self, batch: ViDARBatch, *, train: bool = True):
        img_hw = batch.images.shape[3:5]
        t_total = batch.num_image_frames
        images = batch.images
        if train and self.use_grid_mask:
            bs, _, cams, h, w, c = images.shape
            flat = images.reshape(-1, h, w, c)
            flat = grid_mask(self.make_rng('aug'), flat)
            images = flat.reshape(bs, t_total, cams, h, w, c)

        # frame slots: last image frame is offset 0, earlier frames are the
        # negative offsets (clamped into the available window)
        bev_per_frame = []
        for off in self.frames:
            t_idx = max(0, min(t_total - 1, t_total - 1 + off))
            frozen = off != 0
            bev = self._encode_frame(
                jax.lax.stop_gradient(images[:, t_idx]) if frozen
                else images[:, t_idx],
                batch, t_idx, img_hw, deterministic=not train or frozen)
            bev_per_frame.append(jax.lax.stop_gradient(bev) if frozen
                                 else bev)

        if len(self.frames) > 1:
            bs = images.shape[0]
            maps = [b.reshape(bs, self.bev_h, self.bev_w, -1)
                    for b in bev_per_frame]
            bev = self.fusion(maps)
        else:
            bev = bev_per_frame[0]

        return self.det_head(bev, deterministic=not train)

    def loss(self, preds, gt_bboxes, gt_labels, num_valid_gt,
             mono_losses=None):
        losses = self.det_head.loss(preds, gt_bboxes, gt_labels, num_valid_gt)
        if mono_losses is not None:
            for k, v in mono_losses.items():
                losses[f'{k}_mono'] = v * self.mono_loss_weight
        return losses

    def get_bboxes(self, preds):
        return self.det_head.get_bboxes(preds)
