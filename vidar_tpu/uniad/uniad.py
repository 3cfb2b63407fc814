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

Clip training (``clip_forward``) mirrors reference
uniad_track.py:552-633 ``forward_track_train``: the window's T frames are
processed sequentially with persistent track queries entering the DETR
decoder, per-frame ClipMatcher assignment (identity inheritance + fresh
Hungarian), velocity-compensated reference points (``velo_update``,
:238-286), MemoryBank + QIM between frames, and the task heads running on
the final frame's gated active tracks. One deliberate deviation: prev_bev
propagates RNN-style from the previous clip frame (detached) instead of
re-running a frozen history queue per frame — the reference marks exactly
this as its own TODO ("Generate prev_bev in an RNN way",
uniad_track.py:592) and the recurrent form is both cheaper and the shape
XLA pipelines best.
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
from ..core import bbox as bbox_core
from .track import (TrackInstances, RuntimeTracker, QueryInteractionModule,
                    MemoryBank)
from .clip_matcher import (FrameGT, match_frame, bev_iou_aligned,
                           velo_update)
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
    memory_len: int = 4
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
        self.mem_bank = MemoryBank(embed_dims=self.embed_dims,
                                   memory_len=max(self.memory_len, 1),
                                   dtype=self.dtype, name='mem_bank')
        self.tracker = RuntimeTracker(self.score_thresh,
                                      self.filter_score_thresh,
                                      self.miss_tolerance)
        # ego (SDC) query, reference uniad_track.py sdc_embedding
        self.sdc_query = self.param('sdc_query',
                                    nn.initializers.normal(1.0),
                                    (2 * self.embed_dims,))

    def init_tracks(self, batch_shape: Tuple[int, ...] = ()
                    ) -> TrackInstances:
        qe = self.det_head.query_embedding
        ref = jax.nn.sigmoid(self.det_head.reference_points_fc(
            qe[:, :self.embed_dims]))
        return TrackInstances.empty(self.num_query, self.embed_dims,
                                    self.num_classes, qe, ref,
                                    memory_len=self.memory_len,
                                    batch_shape=batch_shape)

    def encode_bev(self, batch, prev_bev, prev_exists, frame: int = -1,
                   *, deterministic: bool = True):
        img_hw = batch.images.shape[3:5]
        bs, t, cams, h, w, _ = batch.images.shape
        imgs = batch.images[:, frame].reshape(bs * cams, h, w, 3)
        feats = self.img_neck(self.img_backbone(imgs))
        feats = [f.reshape((bs, cams) + f.shape[1:]) for f in feats]
        return self.bev_head(feats, batch.can_bus[:, frame],
                             batch.shift[:, frame],
                             batch.rotate_angle[:, frame],
                             batch.lidar2img[:, frame], img_hw, prev_bev,
                             prev_exists, deterministic=deterministic)

    def track_frame(self, bev, tracks: TrackInstances,
                    *, deterministic: bool = True
                    ) -> Tuple[Dict, TrackInstances]:
        """One frame of detection with persistent track queries.

        The track queries enter the DETR decoder (reference
        uniad_track.py ``get_detections``: track_instances.query +
        ref_pts feed the head); the decoder's output embeddings become the
        slots' refreshed content and ``last_ref_points`` their refreshed
        reference points."""
        preds = self.det_head(bev, query_embeds=tracks.query,
                              ref_points=tracks.ref_points,
                              deterministic=deterministic)
        cls_last = preds['all_cls_scores'][-1]
        box_last = preds['all_bbox_preds'][-1]
        scores = jax.nn.sigmoid(cls_last).max(-1)

        query = jnp.concatenate(
            [tracks.query[..., :self.embed_dims],
             preds['query_feats'].astype(tracks.query.dtype)], axis=-1)
        tracks = tracks.replace(
            scores=scores, pred_boxes=box_last, pred_logits=cls_last,
            query=query, ref_points=preds['last_ref_points'])
        return preds, tracks

    def refresh_tracks(self, tracks: TrackInstances) -> TrackInstances:
        """Between-frame query refresh: MemoryBank then QIM (reference
        _forward_single_frame_train:518-527)."""
        d = self.embed_dims
        if self.memory_len > 0:
            content = tracks.query[..., d:]
            active = tracks.obj_idxes >= 0
            fused, new_mem = self.mem_bank(content, tracks.memory, active)
            tracks = tracks.replace(
                query=jnp.concatenate(
                    [tracks.query[..., :d], fused], axis=-1),
                memory=new_mem)
        return self.qim(tracks, self.det_head.query_embedding)

    def advance_refs(self, tracks: TrackInstances, l2g_r1, l2g_t1,
                     l2g_r2, l2g_t2, time_delta) -> TrackInstances:
        """Velocity-compensated reference points for the next frame
        (reference uniad_track.py:478-492): refs are re-derived from the
        query pos embedding, with x/y overridden by the velo_update of the
        current refs."""
        new_ref = jax.nn.sigmoid(self.det_head.reference_points_fc(
            tracks.query[..., :self.embed_dims]))
        velo = tracks.pred_boxes[..., 8:10]
        upd = jax.vmap(velo_update, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
            tracks.ref_points, velo, l2g_r1, l2g_t1, l2g_r2, l2g_t2,
            time_delta, tuple(self.pc_range))
        new_ref = new_ref.at[..., :2].set(upd[..., :2])
        return tracks.replace(ref_points=new_ref)


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
    memory_len: int = 4
    gt_iou_threshold: float = 0.0
    # k-means trajectory-anchor pickle (reference base_e2e.py:415
    # ``anchor_info_path``); None -> deterministic radial-fan anchors.
    # Generate with `python -m vidar_tpu.tools.data_tools kmeans-anchors`.
    anchor_info_path: Optional[str] = None
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
            memory_len=self.memory_len,
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
            bev_h=self.bev_h, bev_w=self.bev_w, pc_range=self.pc_range,
            dtype=self.dtype, name='planning_head')

    # ------------------------------------------------------------ task heads

    def _run_task_heads(self, bev, tracks: TrackInstances, command,
                        active, *, deterministic: bool = True,
                        with_masks: bool = False) -> Dict:
        """Map seg + motion + occ + planning on one frame's BEV/tracks.

        ``active`` [B, cap] gates which track slots feed the motion head
        (reference active_index, uniad_track.py:513-515)."""
        seg = self.seg_head(bev, with_masks=with_masks,
                            deterministic=deterministic)
        memory, _, memory_pos, lane_query, _, lane_query_pos, _ = \
            seg['args_tuple']

        # ---- agent states for motion (uniad_e2e.py:117-136, fixed cap) ----
        d = self.embed_dims
        box = tracks.pred_boxes                     # [B, A, 10]
        centers = box[..., :2]
        yaw = jnp.arctan2(box[..., 6], box[..., 7])
        labels = tracks.pred_logits.argmax(-1)
        bs = box.shape[0]

        # append the SDC query at the last slot
        sdc = self.track.sdc_query
        sdc_b = jnp.broadcast_to(sdc[None, None, d:], (bs, 1, d))
        tq = jnp.concatenate([tracks.query[..., d:], sdc_b], axis=1)
        centers = jnp.concatenate(
            [centers, jnp.zeros((bs, 1, 2))], axis=1)
        yaw = jnp.concatenate([yaw, jnp.zeros((bs, 1))], axis=1)
        labels = jnp.concatenate(
            [labels, jnp.zeros((bs, 1), labels.dtype)], axis=1)
        active = jnp.concatenate(
            [active, jnp.ones((bs, 1), bool)], axis=1)

        if self.anchor_info_path:
            from .motion_head import load_motion_anchors
            anc = load_motion_anchors(self.anchor_info_path)
            assert anc.shape == (self.motion_head.num_anchor_group,
                                 self.motion_head.num_anchor,
                                 self.predict_steps, 2), anc.shape
        else:
            anc = default_anchors(
                self.motion_head.num_anchor_group,
                self.motion_head.num_anchor, self.predict_steps)
        anchors = jnp.asarray(anc)
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

        return dict(bev=bev, seg=seg, motion=motion, occ=occ, plan=plan,
                    active=active, vehicle_mask=vehicle_mask)

    # ------------------------------------------------------- single frame

    def __call__(self, batch, tracks: Optional[TrackInstances],
                 prev_bev, prev_exists, command, *,
                 deterministic: bool = True, with_masks: bool = False):
        bs = batch.images.shape[0]
        if tracks is None:
            tracks = self.track.init_tracks(batch_shape=(bs,))
        bev = self.track.encode_bev(batch, prev_bev, prev_exists,
                                    deterministic=deterministic)
        det_preds, tracks = self.track.track_frame(
            bev, tracks, deterministic=deterministic)
        tracks = self.track.tracker.update(tracks)
        active = tracks.obj_idxes >= 0
        out = self._run_task_heads(bev, tracks, command, active,
                                   deterministic=deterministic,
                                   with_masks=with_masks)
        tracks = self.track.refresh_tracks(tracks)
        out.update(det=det_preds, tracks=tracks)
        return out

    # -------------------------------------------------------- clip training

    def clip_forward(self, batch, track_gt: FrameGT, l2g_r, l2g_t,
                     timestamp, command, *, deterministic: bool = False,
                     with_masks: bool = True):
        """Train-time clip forward (reference forward_track_train,
        uniad_track.py:547-633).

        Args:
          batch: ViDARBatch whose T image frames ARE the clip.
          track_gt: FrameGT with [B, T, ...] leaves (consistent ``ids``
            across frames — the ClipMatcher contract).
          l2g_r/l2g_t: [B, T, 3, 3] / [B, T, 3] lidar->global per frame.
          timestamp: [B, T] seconds.
        Returns (track_losses, out, matched_gt_last [B, cap]).
        """
        bs, t_clip = batch.images.shape[:2]
        tracks = self.track.init_tracks(batch_shape=(bs,))
        prev_bev = jnp.zeros(
            (bs, self.bev_h * self.bev_w, self.embed_dims), jnp.float32)
        slot_mask = jnp.ones((bs, self.num_query), bool)

        track_losses = dict(loss_cls=jnp.float32(0.0),
                            loss_bbox=jnp.float32(0.0))
        matched = None
        bev = None
        det_preds = None
        for t in range(t_clip):
            exists = (batch.prev_bev_exists[:, t]
                      if t > 0 else jnp.zeros((bs,), bool))
            bev = self.track.encode_bev(batch, prev_bev, exists, frame=t,
                                        deterministic=deterministic)
            det_preds, tracks = self.track.track_frame(
                bev, tracks, deterministic=deterministic)

            gt_t = jax.tree.map(lambda x, t=t: x[:, t], track_gt)
            # [L, B, ...] -> per-sample matcher over the batch
            new_obj, matched, fl = jax.vmap(
                match_frame, in_axes=(1, 1, 0, 0, 0, None))(
                det_preds['all_cls_scores'], det_preds['all_bbox_preds'],
                tracks.obj_idxes, gt_t, slot_mask, self.num_classes)
            tracks = tracks.replace(obj_idxes=new_obj)
            track_losses = {k: track_losses[k] + fl[k].mean()
                            for k in track_losses}

            if t < t_clip - 1:
                tracks = self.track.advance_refs(
                    tracks, l2g_r[:, t], l2g_t[:, t], l2g_r[:, t + 1],
                    l2g_t[:, t + 1], timestamp[:, t + 1] - timestamp[:, t])
                tracks = self.track.refresh_tracks(tracks)
                # RNN-style BEV carry, detached like the reference's
                # no-grad history queue (uniad_track.py get_bevs)
                prev_bev = jax.lax.stop_gradient(bev)

        # final-frame active gate (uniad_track.py:513-515): matched track
        # whose predicted box overlaps its gt
        g = track_gt.boxes.shape[2]
        safe = jnp.clip(matched, 0, g - 1)
        gt_last = track_gt.boxes[:, -1]             # [B, G, 10]
        gt_m = jnp.take_along_axis(gt_last, safe[..., None], axis=1)
        iou = jax.vmap(bev_iou_aligned)(
            bbox_core.denormalize_bbox(tracks.pred_boxes),
            bbox_core.denormalize_bbox(gt_m))
        active = ((tracks.obj_idxes >= 0) & (matched >= 0) &
                  (iou >= self.gt_iou_threshold))

        out = self._run_task_heads(bev, tracks, command, active,
                                   deterministic=deterministic,
                                   with_masks=with_masks)
        out.update(det=det_preds, tracks=tracks)
        return track_losses, out, matched
