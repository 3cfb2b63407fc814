"""UniAD detectors: tracking perception + end-to-end task dispatch.

TPU-native counterpart of reference
UniAD/projects/mmdet3d_plugin/uniad/detectors/uniad_track.py:21-138
(``UniADTrack``: BEVFormer encoder + track-query detection + runtime
tracker) and uniad_e2e.py:17-346 (``UniAD``: sequential track -> seg ->
motion -> occ -> planning with ``task_loss_weight``). The ViDAR integration
is the same as the reference's: the shared BEV encoder (with latent
rendering) initialised from ViDAR-pretrained weights
(UniAD/projects/configs/stage1_track_map/vidar_track_map.py:169-206).

Fixed-capacity design: the reference threads variable-length per-sample
``bbox_results`` lists between heads; here every inter-head tensor is a
padded ``[B, A]`` array with masks (vehicle filtering at uniad_e2e
motion_head.py:139-160 becomes the returned ``vehicle_mask``), so the whole
dispatch jits as one program.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..models.transformer import BEVEncoderHead
from ..models.detection import BEVFormerHead
from ..models.resnet import ResNet
from ..models.fpn import FPN
from ..models.position_embedding import sine_positional_encoding
from .track import (TrackInstances, RuntimeTracker, QueryInteractionModule,
                    MemoryBank)
from .motion_head import MotionHead, default_anchors
from .occ_head import OccHead
from .panseg_head import PansegformerHead
from .planning_head import PlanningHeadSingleMode


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
        # ego (SDC) query, reference uniad_track.py sdc_embedding
        self.sdc_query = self.param('sdc_query',
                                    nn.initializers.normal(1.0),
                                    (2 * self.embed_dims,))

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
    """End-to-end dispatcher: track -> seg -> motion -> occ -> planning.

    Reference flow: uniad_e2e.py:88-346. ``task_loss_weight`` defaults to
    the released config (track 1.0, map 1.0, motion 1.0, occ 1.0, plan 1.0).
    """
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_cams: int = 6
    num_query: int = 900
    num_seg_query: int = 300
    num_classes: int = 10
    backbone_depth: int = 101
    predict_steps: int = 12
    predict_modes: int = 6
    occ_n_future: int = 4
    planning_steps: int = 6
    task_loss_weight: Optional[dict] = None
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    vehicle_id_list: Sequence[int] = (0, 1, 2, 3, 4, 6, 7)
    dtype: jnp.dtype | None = None

    def setup(self):
        self.track = UniADTrack(
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range,
            num_cams=self.num_cams, num_query=self.num_query,
            num_classes=self.num_classes,
            backbone_depth=self.backbone_depth,
            latent_render_lids=self.latent_render_lids,
            latent_render_cfg=self.latent_render_cfg,
            dtype=self.dtype, name='track')
        self.seg_head = PansegformerHead(
            embed_dims=self.embed_dims, num_query=self.num_seg_query,
            bev_h=self.bev_h, bev_w=self.bev_w, dtype=self.dtype,
            name='seg_head')
        self.motion_head = MotionHead(
            embed_dims=self.embed_dims, num_anchor=self.predict_modes,
            predict_steps=self.predict_steps, num_classes=self.num_classes,
            bev_h=self.bev_h, bev_w=self.bev_w, pc_range=self.pc_range,
            vehicle_id_list=self.vehicle_id_list, dtype=self.dtype,
            name='motion_head')
        self.occ_head = OccHead(
            embed_dims=self.embed_dims, n_future=self.occ_n_future,
            bev_h=self.bev_h, bev_w=self.bev_w, dtype=self.dtype,
            name='occ_head')
        self.planning_head = PlanningHeadSingleMode(
            embed_dims=self.embed_dims, planning_steps=self.planning_steps,
            bev_h=self.bev_h, bev_w=self.bev_w, dtype=self.dtype,
            name='planning_head')

    def __call__(self, batch, tracks: Optional[TrackInstances],
                 prev_bev, prev_exists, command, *,
                 deterministic: bool = True, with_masks: bool = False):
        if tracks is None:
            tracks = self.track.init_tracks()
        bev = self.track.encode_bev(batch, prev_bev, prev_exists)
        det_preds, tracks = self.track.track_frame(bev, tracks)

        # ---- map segmentation ----
        seg = self.seg_head(bev, with_masks=with_masks,
                            deterministic=deterministic)
        memory, _, memory_pos, lane_query, _, lane_query_pos, _ = \
            seg['args_tuple']

        # ---- agent states for motion (uniad_e2e.py:117-136, fixed cap) ----
        d = self.embed_dims
        box = tracks.pred_boxes           # [A, 10]
        centers = box[:, :2]
        yaw = jnp.arctan2(box[:, 6], box[:, 7])
        labels = tracks.pred_logits.argmax(-1)
        active = tracks.obj_idxes >= 0

        # append the SDC query at the last slot
        sdc = self.track.sdc_query
        tq = jnp.concatenate([tracks.query[:, d:], sdc[None, d:]], 0)[None]
        centers = jnp.concatenate([centers, jnp.zeros((1, 2))], 0)[None]
        yaw = jnp.concatenate([yaw, jnp.zeros((1,))], 0)[None]
        labels = jnp.concatenate(
            [labels, jnp.zeros((1,), labels.dtype)], 0)[None]
        active = jnp.concatenate(
            [active, jnp.ones((1,), bool)], 0)[None]

        anchors = jnp.asarray(default_anchors(
            self.motion_head.num_anchor_group, self.motion_head.num_anchor,
            self.predict_steps))
        motion = self.motion_head(
            tq, labels, centers, yaw, lane_query, lane_query_pos, bev,
            anchors, deterministic=deterministic)

        vm_table = np.zeros((self.num_classes,), np.float32)
        for vid in self.vehicle_id_list:
            vm_table[vid] = 1.0
        vehicle_mask = jnp.asarray(vm_table)[
            jnp.clip(labels, 0, self.num_classes - 1)]
        vehicle_mask = vehicle_mask * active

        # split SDC from agents (uniad_e2e motion_head.py:152-160)
        sdc_traj_query = motion['traj_query'][:, :, -1]      # [L, B, P, D]
        sdc_track_query = motion['track_query'][:, -1]       # [B, D]
        agent_traj_query = motion['traj_query'][:, :, :-1]
        agent_track_query = motion['track_query'][:, :-1]
        agent_track_query_pos = motion['track_query_pos'][:, :-1]

        # ---- occupancy (occ_head.py:271-284) ----
        ins_query = self.occ_head.merge_queries(
            agent_traj_query[-1], agent_track_query, agent_track_query_pos)
        occ = self.occ_head(bev, ins_query, deterministic=deterministic)

        # ---- planning ----
        bev_pos = sine_positional_encoding(
            self.bev_h, self.bev_w, d // 2).reshape(1, -1, d)
        bev_pos = jnp.broadcast_to(
            bev_pos, (bev.shape[0],) + bev_pos.shape[1:]).astype(bev.dtype)
        occ_mask = occ['seg_out'] if deterministic else None
        plan = self.planning_head(
            bev, occ_mask, bev_pos, sdc_traj_query, sdc_track_query,
            command, deterministic=deterministic)

        return dict(bev=bev, det=det_preds, seg=seg, motion=motion, occ=occ,
                    plan=plan, tracks=tracks, active=active,
                    vehicle_mask=vehicle_mask)
