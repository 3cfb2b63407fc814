"""Pansegformer: BEV map panoptic segmentation head (lanes / drivable).

Layer-for-layer TPU-native counterpart of the reference seg stack
(UniAD/projects/mmdet3d_plugin/uniad/dense_heads/panseg_head.py:24-1200,
seg_head_plugin/seg_detr_head.py:18-650,
seg_head_plugin/seg_deformable_transformer.py:28-360,
seg_head_plugin/seg_mask_head.py:18-420, seg_head_plugin/seg_assigner.py).

Architecture (base_e2e.py:242-330): a 6-layer deformable encoder over the
BEV map, a 6-layer deformable-DETR decoder with box refinement over 300
thing queries, a 1-slot stuff query, and attention mask heads
(``SegMaskHead``: 4 thing layers / 6 stuff layers with self-attn) whose
per-head attention logits are projected into segmentation masks.

TPU re-design:
  * single BEV level, static shapes; the encoder's reference points are the
    fixed pixel-center grid (seg_deformable_transformer.py:155-194 with
    valid_ratios == 1 everywhere — no padding masks on a dense BEV).
  * Hungarian matching reuses ``core.bbox.hungarian_assign`` (host scipy /
    jittable auction); the `HungarianAssigner_filter` max_pos=3 train-time
    mask subset becomes a fixed-capacity top-k gather.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.bbox import focal_loss_cost, hungarian_assign, sigmoid_focal_loss
from ..models.layers import TorchLinear, FFN, xavier_uniform_init
from ..models.position_embedding import sine_positional_encoding
from ..models.attention import PredictionMSDeformableAttention
from .blocks import LinLNReLU


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# Deformable transformer (seg_deformable_transformer.py:28-360)
# ---------------------------------------------------------------------------

class SegEncoderLayer(nn.Module):
    """('self_attn(MSDA)', 'norm', 'ffn', 'norm')."""
    embed_dims: int = 256
    feedforward: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, ref_points, spatial_shapes, pos=None, *,
                 deterministic: bool = True):
        x = PredictionMSDeformableAttention(
            self.embed_dims, num_levels=1, num_points=4, dtype=self.dtype,
            name='attn')(x, x, ref_points, spatial_shapes, query_pos=pos,
                         deterministic=deterministic)
        x = nn.LayerNorm(name='norm0')(x)
        x = FFN(self.feedforward, self.embed_dims, self.dropout,
                dtype=self.dtype, name='ffn')(x, deterministic=deterministic)
        return nn.LayerNorm(name='norm1')(x)


class SegDecoderLayer(nn.Module):
    """('self_attn(MHA)', 'norm', 'cross_attn(MSDA)', 'norm', 'ffn', 'norm')."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, memory, ref_points, spatial_shapes,
                 query_pos=None, *, deterministic: bool = True):
        q = query + query_pos if query_pos is not None else query
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            dropout_rate=self.dropout, dtype=self.dtype,
            name='self_attn')(q, q, query, deterministic=deterministic)
        query = nn.LayerNorm(name='norm0')(
            query + nn.Dropout(self.dropout)(a, deterministic=deterministic))
        query = PredictionMSDeformableAttention(
            self.embed_dims, num_levels=1, num_points=4, dtype=self.dtype,
            name='cross_attn')(query, memory, ref_points, spatial_shapes,
                               query_pos=query_pos,
                               deterministic=deterministic)
        query = nn.LayerNorm(name='norm1')(query)
        query = FFN(self.feedforward, self.embed_dims, self.dropout,
                    dtype=self.dtype, name='ffn')(
                        query, deterministic=deterministic)
        return nn.LayerNorm(name='norm2')(query)


# ---------------------------------------------------------------------------
# Mask decoder (seg_mask_head.py:18-420)
# ---------------------------------------------------------------------------

class MaskAttention(nn.Module):
    """Cross-attention whose per-head logits also emit a mask
    (seg_mask_head.py:86-156)."""
    embed_dims: int = 256
    num_heads: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, key, value):
        b, n, c = query.shape
        l = key.shape[1]
        hd = c // self.num_heads
        scale = hd ** -0.5
        q = TorchLinear(c, dtype=self.dtype, name='q')(query).reshape(
            b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = TorchLinear(c, dtype=self.dtype, name='k')(key).reshape(
            b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = TorchLinear(c, dtype=self.dtype, name='v')(value).reshape(
            b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale  # [B, H, N, L]

        per_head = attn.transpose(0, 2, 3, 1)  # [B, N, L, H]
        m = nn.relu(TorchLinear(self.num_heads, dtype=self.dtype,
                                name='linear_l1')(per_head))
        mask = nn.relu(TorchLinear(1, dtype=self.dtype, name='linear')(m))

        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        x = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = TorchLinear(c, dtype=self.dtype, name='proj')(x)
        return x, mask  # mask: [B, N, L, 1]


class MaskBlock(nn.Module):
    """LN + (optional self-attn) + MaskAttention + MLP
    (seg_mask_head.py:214-295)."""
    embed_dims: int = 256
    num_heads: int = 8
    self_attn: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, key, value, *, deterministic: bool = True):
        if self.self_attn:
            q = nn.LayerNorm(name='norm_sa')(query)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.embed_dims,
                dtype=self.dtype, name='sa')(q, q, q,
                                             deterministic=deterministic)
            query = query + a
        x, mask = MaskAttention(self.embed_dims, self.num_heads,
                                dtype=self.dtype, name='attn')(
            nn.LayerNorm(name='norm1')(query), key, value)
        query = query + x
        h = nn.LayerNorm(name='norm2')(query)
        h = TorchLinear(self.embed_dims * 4, dtype=self.dtype,
                        name='mlp_fc1')(h)
        h = TorchLinear(self.embed_dims, dtype=self.dtype,
                        name='mlp_fc2')(nn.gelu(h))
        return query + h, mask


class AttentionTail(nn.Module):
    """Mask-only attention layer (seg_mask_head.py:158-212)."""
    embed_dims: int = 256
    num_heads: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, key):
        b, n, c = query.shape
        l = key.shape[1]
        hd = c // self.num_heads
        scale = hd ** -0.5
        q = TorchLinear(c, dtype=self.dtype, name='q')(query).reshape(
            b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = TorchLinear(c, dtype=self.dtype, name='k')(key).reshape(
            b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale
        per_head = attn.transpose(0, 2, 3, 1)
        m = nn.relu(TorchLinear(self.num_heads, dtype=self.dtype,
                                name='linear_l1')(per_head))
        return nn.relu(TorchLinear(1, dtype=self.dtype, name='linear')(m))


class SegMaskHead(nn.Module):
    """Stack of MaskBlocks + AttentionTail (seg_mask_head.py:310-420)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_layers: int = 4
    self_attn: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, memory, memory_pos, query, query_pos, *,
                 deterministic: bool = True):
        masks, inter_q = [], []
        key = memory + memory_pos if memory_pos is not None else memory
        for i in range(self.num_layers):
            q_in = query + query_pos if query_pos is not None else query
            query, mask = MaskBlock(
                self.embed_dims, self.num_heads, self.self_attn,
                dtype=self.dtype, name=f'blocks_{i}')(
                    q_in, key, memory, deterministic=deterministic)
            masks.append(mask)
            inter_q.append(query)
        attn = AttentionTail(self.embed_dims, self.num_heads,
                             dtype=self.dtype, name='attnen')(
            query + query_pos if query_pos is not None else query, key)
        return attn, masks, inter_q


# ---------------------------------------------------------------------------
# Head
# ---------------------------------------------------------------------------

class PansegformerHead(nn.Module):
    """Things/stuff panoptic BEV segmentation (panseg_head.py:24-1200)."""
    embed_dims: int = 256
    num_query: int = 300
    num_things_classes: int = 3
    num_stuff_classes: int = 1
    num_enc_layers: int = 6
    num_dec_layers: int = 6
    num_thing_mask_layers: int = 4
    num_stuff_mask_layers: int = 6
    bev_h: int = 200
    bev_w: int = 200
    feedforward: int = 1024
    with_box_refine: bool = True
    max_pos: int = 3  # HungarianAssigner_filter max_pos (train masks)
    num_mask_queries: int = 32  # fixed-capacity top-k for mask decoding
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.embed_dims
        self.query_embedding = self.param(
            'query_embedding', nn.initializers.normal(1.0),
            (self.num_query, 2 * d))
        self.stuff_query = self.param(
            'stuff_query', nn.initializers.normal(1.0),
            (self.num_stuff_classes, 2 * d))
        self.reference_points_fc = nn.Dense(
            2, kernel_init=xavier_uniform_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name='reference_points_fc')
        self.enc_layers = [
            SegEncoderLayer(d, self.feedforward, dtype=self.dtype,
                            name=f'encoder_{i}')
            for i in range(self.num_enc_layers)]
        self.dec_layers = [
            SegDecoderLayer(d, feedforward=self.feedforward,
                            dtype=self.dtype, name=f'decoder_{i}')
            for i in range(self.num_dec_layers)]
        self.cls_branches = [
            TorchLinear(self.num_things_classes, dtype=self.dtype,
                        name=f'cls_branches_{i}')
            for i in range(self.num_dec_layers)]
        self.reg_branches = [
            _RegBranch4(d, dtype=self.dtype, name=f'reg_branches_{i}')
            for i in range(self.num_dec_layers)]
        self.things_mask_head = SegMaskHead(
            d, num_layers=self.num_thing_mask_layers, dtype=self.dtype,
            name='things_mask_head')
        self.stuff_mask_head = SegMaskHead(
            d, num_layers=self.num_stuff_mask_layers, self_attn=True,
            dtype=self.dtype, name='stuff_mask_head')
        self.cls_thing_branches = [
            TorchLinear(self.num_things_classes, dtype=self.dtype,
                        name=f'cls_thing_branches_{i}')
            for i in range(self.num_thing_mask_layers)]
        self.cls_stuff_branches = [
            TorchLinear(1, dtype=self.dtype, name=f'cls_stuff_branches_{i}')
            for i in range(self.num_stuff_mask_layers)]

    def _encoder_ref_points(self, bs: int):
        h, w = self.bev_h, self.bev_w
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
        ref = jnp.stack([gx, gy], -1).reshape(1, h * w, 1, 2)
        return jnp.broadcast_to(ref, (bs, h * w, 1, 2))

    def __call__(self, bev, *, with_masks: bool = False,
                 deterministic: bool = True):
        """bev: [B, HW, D]. Returns the outs dict incl. ``args_tuple``
        consumed by the motion head (panseg_head.py:245-271). With
        ``with_masks`` the thing/stuff mask decoders run on the
        ``num_mask_queries`` top-scoring thing queries (fixed-capacity
        stand-in for the reference's matched-query subset)."""
        bs = bev.shape[0]
        d = self.embed_dims
        shapes = ((self.bev_h, self.bev_w),)
        pos = sine_positional_encoding(self.bev_h, self.bev_w,
                                       d // 2).reshape(1, -1, d)
        pos = jnp.broadcast_to(pos, (bs, pos.shape[1], d)).astype(bev.dtype)

        memory = bev
        enc_ref = self._encoder_ref_points(bs)
        for layer in self.enc_layers:
            memory = layer(memory, enc_ref, shapes, pos=pos,
                           deterministic=deterministic)

        qe = self.query_embedding
        query_pos = jnp.broadcast_to(qe[None, :, :d],
                                     (bs, self.num_query, d))
        query = jnp.broadcast_to(qe[None, :, d:], (bs, self.num_query, d))
        ref = jax.nn.sigmoid(self.reference_points_fc(query_pos))

        inter_states, inter_refs = [], []
        for lid, layer in enumerate(self.dec_layers):
            query = layer(query, memory, ref[:, :, None, :], shapes,
                          query_pos=query_pos, deterministic=deterministic)
            inter_states.append(query)
            inter_refs.append(ref)
            if self.with_box_refine:
                tmp = self.reg_branches[lid](query)
                new_ref = jax.nn.sigmoid(tmp[..., :2] + inverse_sigmoid(ref))
                ref = jax.lax.stop_gradient(new_ref)

        classes, coords = [], []
        for lid in range(self.num_dec_layers):
            cls = self.cls_branches[lid](inter_states[lid])
            tmp = self.reg_branches[lid](inter_states[lid])
            tmp = tmp.at[..., :2].add(inverse_sigmoid(inter_refs[lid]))
            coords.append(jax.nn.sigmoid(tmp))
            classes.append(cls)

        out = dict(
            outputs_classes=jnp.stack(classes),  # [L, B, Q, 3]
            outputs_coords=jnp.stack(coords),    # [L, B, Q, 4] cxcywh [0,1]
            args_tuple=(memory, None, pos, inter_states[-1], None,
                        query_pos, shapes),
            reference=ref)
        if with_masks:
            k = min(self.num_mask_queries, self.num_query)
            score = jax.nn.sigmoid(classes[-1]).max(-1)  # [B, Q]
            _, top = jax.lax.top_k(score, k)
            tq = jnp.take_along_axis(inter_states[-1], top[..., None],
                                     axis=1)
            tp = jnp.take_along_axis(query_pos, top[..., None], axis=1)
            out['masks'] = self.forward_masks(
                memory, pos, tq, tp, deterministic=deterministic)
            out['masks']['thing_index'] = top
        return out

    def forward_masks(self, memory, memory_pos, thing_query, thing_query_pos,
                      *, deterministic: bool = True):
        """Run both mask decoders; returns per-query BEV masks.

        thing_query/thing_query_pos: [B, K, D] (fixed-capacity selection of
        matched/top-scoring thing queries).
        """
        bs = memory.shape[0]
        d = self.embed_dims
        attn_t, masks_t, inter_t = self.things_mask_head(
            memory, memory_pos, thing_query, thing_query_pos,
            deterministic=deterministic)
        sq = self.stuff_query
        stuff_pos = jnp.broadcast_to(sq[None, :, :d],
                                     (bs, self.num_stuff_classes, d))
        stuff_q = jnp.broadcast_to(sq[None, :, d:],
                                   (bs, self.num_stuff_classes, d))
        attn_s, masks_s, inter_s = self.stuff_mask_head(
            memory, memory_pos, stuff_q, stuff_pos,
            deterministic=deterministic)

        thing_cls = [self.cls_thing_branches[i](inter_t[i])
                     for i in range(self.num_thing_mask_layers)]
        stuff_cls = [self.cls_stuff_branches[i](inter_s[i])
                     for i in range(self.num_stuff_mask_layers)]
        hw = (self.bev_h, self.bev_w)
        def to_map(m):  # [B, N, L, 1] -> [B, N, H, W]
            return m[..., 0].reshape(m.shape[0], m.shape[1], *hw)
        return dict(
            thing_masks=to_map(attn_t), stuff_masks=to_map(attn_s),
            thing_masks_inter=[to_map(m) for m in masks_t],
            stuff_masks_inter=[to_map(m) for m in masks_s],
            thing_cls=thing_cls, stuff_cls=stuff_cls)


class _RegBranch4(nn.Module):
    """2x(Linear+ReLU) + Linear(4) (seg_detr_head.py:125-140)."""
    embed_dims: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(TorchLinear(self.embed_dims, dtype=self.dtype,
                                name='fc0')(x))
        x = nn.relu(TorchLinear(self.embed_dims, dtype=self.dtype,
                                name='fc1')(x))
        return TorchLinear(4, dtype=self.dtype, name='out')(x)


# ---------------------------------------------------------------------------
# Losses (seg_detr_head.py:270-550, panseg_head.py:281-1000)
# ---------------------------------------------------------------------------

def _cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def giou(boxes1, boxes2):
    """Generalized IoU between [..., 4] xyxy boxes."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((boxes1[..., 2] - boxes1[..., 0]) *
          (boxes1[..., 3] - boxes1[..., 1]))
    a2 = ((boxes2[..., 2] - boxes2[..., 0]) *
          (boxes2[..., 3] - boxes2[..., 1]))
    union = a1 + a2 - inter
    iou = inter / jnp.clip(union, 1e-7, None)
    elt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    erb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    ewh = jnp.clip(erb - elt, 0.0, None)
    enclose = jnp.clip(ewh[..., 0] * ewh[..., 1], 1e-7, None)
    return iou - (enclose - union) / enclose


def panseg_loss_single(cls_scores, bbox_preds, gt_labels, gt_boxes,
                       num_valid_gt, num_things_classes: int = 3,
                       cls_weight: float = 2.0, bbox_weight: float = 5.0,
                       iou_weight: float = 2.0):
    """Single-layer DETR loss for one sample (fixed-capacity gt).

    cls_scores: [Q, C]; bbox_preds: [Q, 4] cxcywh in [0,1];
    gt_labels: [G] int; gt_boxes: [G, 4] cxcywh in [0,1]; num_valid_gt: [].
    """
    q, g = cls_scores.shape[0], gt_boxes.shape[0]
    # matching cost: focal cls + L1 + GIoU (base_e2e.py:313-319)
    cls_cost = focal_loss_cost(cls_scores.astype(jnp.float32),
                               jnp.clip(gt_labels, 0, None),
                               weight=cls_weight)
    l1_cost = jnp.abs(bbox_preds[:, None] - gt_boxes[None]).sum(-1)
    giou_cost = -giou(_cxcywh_to_xyxy(bbox_preds)[:, None],
                      _cxcywh_to_xyxy(gt_boxes)[None])
    cost = cls_cost + bbox_weight * l1_cost + iou_weight * giou_cost
    assign = hungarian_assign(cost, num_valid_gt)  # [Q] in [-1, G)

    matched = assign >= 0
    safe = jnp.clip(assign, 0, g - 1)
    labels = jnp.where(matched, gt_labels[safe], num_things_classes)
    loss_cls = sigmoid_focal_loss(cls_scores, labels,
                                  num_things_classes).sum() * cls_weight
    tgt = gt_boxes[safe]
    mw = matched.astype(jnp.float32)
    loss_bbox = (jnp.abs(bbox_preds - tgt).sum(-1) * mw).sum() * bbox_weight
    loss_iou = ((1.0 - giou(_cxcywh_to_xyxy(bbox_preds),
                            _cxcywh_to_xyxy(tgt))) * mw).sum() * iou_weight
    denom = jnp.clip(num_valid_gt.astype(jnp.float32), 1.0, None)
    return dict(loss_cls=loss_cls / denom,
                loss_bbox=loss_bbox / denom,
                loss_iou=loss_iou / denom,
                assign=assign)
