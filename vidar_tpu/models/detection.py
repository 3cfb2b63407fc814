"""Detection fine-tune stack: DETR decoder + BEVFormerHead (+ losses).

Capability match for the reference fine-tune path (SURVEY §3.4):
  * ``DetectionTransformerDecoder`` with iterative box refinement
    (reference modules/decoder.py:52-131) — 6 layers of vanilla multi-head
    self-attention over 900 object queries, then single-level deformable
    cross-attention into the BEV map (``CustomMSDeformableAttention``,
    decoder.py:132-345), reference points refined per layer through
    inverse-sigmoid residuals.
  * ``BEVFormerHead`` (reference dense_heads/bevformer_head.py:17-512):
    per-layer cls/reg branches, NMS-free top-k decode, Hungarian-matched
    focal + L1 loss with the (1,1,1,1,1,1,1,1,0.2,0.2) code weights.

GT boxes arrive padded to a static maximum with a validity count.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .attention import PredictionMSDeformableAttention
from .layers import FFN, TorchLinear, normal_init, xavier_uniform_init
from ..core import bbox as bbox_core


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1.0 - x, eps))


class DecoderLayer(nn.Module):
    """self_attn (MHA) -> norm -> cross_attn (deformable) -> norm -> ffn -> norm."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, query_pos, bev_value, reference_points,
                 bev_h: int, bev_w: int, *, deterministic: bool = True):
        q = query + query_pos
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            out_features=self.embed_dims, dtype=self.dtype,
            name='self_attn')(q, q, query)
        attn_out = nn.Dropout(self.dropout)(attn_out,
                                            deterministic=deterministic)
        query = nn.LayerNorm(name='norms_0')(query + attn_out)

        query = PredictionMSDeformableAttention(
            embed_dims=self.embed_dims, num_levels=1, num_points=4,
            dtype=self.dtype, name='cross_attn')(
                query, bev_value, reference_points[:, :, None, :],
                ((bev_h, bev_w),), query_pos=query_pos,
                deterministic=deterministic)
        query = nn.LayerNorm(name='norms_1')(query)
        query = FFN(self.feedforward_channels, self.embed_dims, self.dropout,
                    dtype=self.dtype, name='ffns_0')(
                        query, deterministic=deterministic)
        query = nn.LayerNorm(name='norms_2')(query)
        return query


class BEVFormerHead(nn.Module):
    """DETR-style 3D detection head over BEV features."""
    num_classes: int = 10
    num_query: int = 900
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_decoder_layers: int = 6
    num_reg_fcs: int = 2
    code_size: int = 10
    code_weights: Tuple[float, ...] = (1, 1, 1, 1, 1, 1, 1, 1, 0.2, 0.2)
    with_box_refine: bool = True
    cls_loss_weight: float = 2.0
    bbox_loss_weight: float = 0.25
    bbox_coder_max_num: int = 300
    post_center_range: Sequence[float] = (-61.2, -61.2, -10.0,
                                          61.2, 61.2, 10.0)
    dtype: jnp.dtype | None = None

    def setup(self):
        self.query_embedding = self.param(
            'query_embedding', normal_init,
            (self.num_query, self.embed_dims * 2))
        self.reference_points_fc = nn.Dense(
            3, kernel_init=xavier_uniform_init,
            bias_init=nn.initializers.zeros, name='reference_points')
        self.layers = [
            DecoderLayer(embed_dims=self.embed_dims,
                         feedforward_channels=self.embed_dims * 2,
                         dtype=self.dtype, name=f'layers_{i}')
            for i in range(self.num_decoder_layers)]

        def make_branch(prefix, out_dim, with_norm):
            fcs = []
            norms = []
            for i in range(self.num_reg_fcs):
                fcs.append(TorchLinear(self.embed_dims, dtype=self.dtype,
                                       name=f'{prefix}_fc{i}'))
                if with_norm:
                    norms.append(nn.LayerNorm(name=f'{prefix}_ln{i}'))
            fcs.append(TorchLinear(out_dim, dtype=self.dtype,
                                   name=f'{prefix}_out'))
            return fcs, norms

        cls_branches = []
        cls_norms = []
        reg_branches = []
        for lid in range(self.num_decoder_layers):
            fcs, norms = make_branch(f'cls_branches_{lid}', self.num_classes,
                                     True)
            cls_branches.append(fcs)
            cls_norms.append(norms)
            fcs, _ = make_branch(f'reg_branches_{lid}', self.code_size, False)
            reg_branches.append(fcs)
        self.cls_branches = cls_branches
        self.cls_norms = cls_norms
        self.reg_branches = reg_branches

    def _cls(self, lid, x):
        for fc, ln in zip(self.cls_branches[lid][:-1], self.cls_norms[lid]):
            x = nn.relu(ln(fc(x)))
        return self.cls_branches[lid][-1](x)

    def _reg(self, lid, x):
        for fc in self.reg_branches[lid][:-1]:
            x = nn.relu(fc(x))
        return self.reg_branches[lid][-1](x)

    def __call__(self, bev_embed, *, query_embeds=None, ref_points=None,
                 deterministic: bool = True):
        """bev_embed: [bs, H*W, C] -> dict with all_cls_scores/all_bbox_preds.

        Args:
          query_embeds: optional [bs, Q, 2C] external (track) queries —
            persistent track queries enter the decoder here (reference
            uniad_track.py get_detections passes track_instances.query).
          ref_points: optional [bs, Q, 3] sigmoid-space reference points
            (track queries carry their motion-compensated refs).

        Also returns ``query_feats`` (the last decoder layer's query
        embeddings, [bs, Q, C]) and ``last_ref_points`` ([bs, Q, 3]
        sigmoid-space) — the tracker state the QIM/motion heads consume
        (reference det_output['query_feats'/'last_ref_points']).
        """
        bs = bev_embed.shape[0]
        if query_embeds is None:
            qe = self.query_embedding.astype(bev_embed.dtype)
            query_pos, query = jnp.split(qe, 2, axis=1)
            query_pos = jnp.broadcast_to(query_pos[None],
                                         (bs,) + query_pos.shape)
            query = jnp.broadcast_to(query[None], (bs,) + query.shape)
        else:
            query_pos, query = jnp.split(
                query_embeds.astype(bev_embed.dtype), 2, axis=-1)
        reference_points = jax.nn.sigmoid(
            self.reference_points_fc(query_pos))  # [bs, Q, 3]
        if ref_points is not None:
            reference_points = ref_points

        pc = self.pc_range
        cls_out = []
        bbox_out = []
        ref = reference_points
        for lid, layer in enumerate(self.layers):
            query = layer(query, query_pos, bev_embed, ref[..., :2],
                          self.bev_h, self.bev_w,
                          deterministic=deterministic)
            cls_score = self._cls(lid, query)
            tmp = self._reg(lid, query)
            inv = inverse_sigmoid(ref)
            xy = jax.nn.sigmoid(tmp[..., 0:2] + inv[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + inv[..., 2:3])
            out = jnp.concatenate([
                xy[..., 0:1] * (pc[3] - pc[0]) + pc[0],
                xy[..., 1:2] * (pc[4] - pc[1]) + pc[1],
                tmp[..., 2:4],
                z * (pc[5] - pc[2]) + pc[2],
                tmp[..., 5:],
            ], axis=-1)
            cls_out.append(cls_score)
            bbox_out.append(out)
            if self.with_box_refine:
                new_ref = jnp.concatenate([
                    jax.nn.sigmoid(tmp[..., 0:2] + inv[..., 0:2]),
                    jax.nn.sigmoid(tmp[..., 4:5] + inv[..., 2:3]),
                ], axis=-1)
                ref = jax.lax.stop_gradient(new_ref)
        return dict(all_cls_scores=jnp.stack(cls_out),
                    all_bbox_preds=jnp.stack(bbox_out),
                    bev_embed=bev_embed,
                    query_feats=query,
                    last_ref_points=ref)

    # ----------------------------------------------------------------- loss

    def loss(self, preds, gt_bboxes, gt_labels, num_valid_gt):
        """Hungarian-matched focal+L1 loss over all decoder layers.

        Args:
          preds: dict from __call__.
          gt_bboxes: [bs, G, 9] (cx cy cz w l h rot vx vy), padded.
          gt_labels: [bs, G] int32.
          num_valid_gt: [bs] int32.
        """
        all_cls = preds['all_cls_scores']
        all_box = preds['all_bbox_preds']
        losses = {}
        for lid in range(all_cls.shape[0]):
            lc, lb = self._loss_single(all_cls[lid], all_box[lid], gt_bboxes,
                                       gt_labels, num_valid_gt)
            if lid == all_cls.shape[0] - 1:
                losses['loss_cls'] = lc
                losses['loss_bbox'] = lb
            else:
                losses[f'd{lid}.loss_cls'] = lc
                losses[f'd{lid}.loss_bbox'] = lb
        return losses

    def _loss_single(self, cls_scores, bbox_preds, gt_bboxes, gt_labels,
                     num_valid_gt):
        bs, q, _ = cls_scores.shape
        g = gt_bboxes.shape[1]
        gt_norm = bbox_core.normalize_bbox(gt_bboxes)  # [bs, G, 10]

        def assign_one(cls_s, box_p, gt_n, gt_l, n_valid):
            cost_cls = bbox_core.focal_loss_cost(
                cls_s, gt_l, weight=self.cls_loss_weight)
            cost_reg = bbox_core.bbox3d_l1_cost(
                box_p, gt_n, weight=self.bbox_loss_weight)
            cost = cost_cls + cost_reg
            big = jnp.float32(1e8)
            gt_pad = jnp.arange(g) >= n_valid
            cost = jnp.where(gt_pad[None, :], big, cost)
            return bbox_core.hungarian_assign(cost, n_valid)

        assigned = jax.vmap(assign_one)(cls_scores, bbox_preds, gt_norm,
                                        gt_labels, num_valid_gt)  # [bs, Q]
        pos = assigned >= 0
        a_safe = jnp.clip(assigned, 0, g - 1)
        labels = jnp.where(
            pos, jnp.take_along_axis(gt_labels, a_safe, axis=1),
            self.num_classes)
        targets = jnp.take_along_axis(gt_norm, a_safe[..., None], axis=1)

        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        cls_l = bbox_core.sigmoid_focal_loss(
            cls_scores, labels, self.num_classes).sum()
        cls_l = cls_l * self.cls_loss_weight / num_pos

        cw = jnp.asarray(self.code_weights)
        isfin = jnp.all(jnp.isfinite(targets), axis=-1) & pos
        l1 = jnp.abs(bbox_preds - targets) * cw
        l1 = (l1 * isfin[..., None].astype(l1.dtype)).sum()
        bbox_l = l1 * self.bbox_loss_weight / num_pos
        return jnp.nan_to_num(cls_l), jnp.nan_to_num(bbox_l)

    def get_bboxes(self, preds):
        """Per-sample NMS-free decode of the last layer."""
        cls_s = preds['all_cls_scores'][-1]
        box_p = preds['all_bbox_preds'][-1]
        return jax.vmap(lambda c, b: bbox_core.nms_free_decode(
            c, b, max_num=self.bbox_coder_max_num,
            num_classes=self.num_classes,
            post_center_range=self.post_center_range))(cls_s, box_p)


class BEVFormerHeadGroupDETR(BEVFormerHead):
    """Group-DETR variant: ``group_detr`` independent query groups share the
    decoder at train time (one-to-many assignment); inference uses only the
    first group (reference bevformer_head.py:513+ BEVFormerHead_GroupDETR,
    registered but unused by the released configs)."""
    group_detr: int = 1

    def loss(self, preds, gt_bboxes, gt_labels, num_valid_gt):
        g = self.group_detr
        per = self.num_query // max(g, 1)
        losses = {}
        for gi in range(g):
            sl = slice(gi * per, (gi + 1) * per)
            sub = dict(all_cls_scores=preds['all_cls_scores'][:, :, sl],
                       all_bbox_preds=preds['all_bbox_preds'][:, :, sl])
            for k, v in super().loss(sub, gt_bboxes, gt_labels,
                                     num_valid_gt).items():
                losses[k] = losses.get(k, 0.0) + v / g
        return losses

    def get_bboxes(self, preds):
        per = self.num_query // max(self.group_detr, 1)
        sub = dict(all_cls_scores=preds['all_cls_scores'][:, :, :per],
                   all_bbox_preds=preds['all_bbox_preds'][:, :, :per])
        return super().get_bboxes(sub)
