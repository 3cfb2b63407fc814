"""Integrated UniAD training loss (task_loss_weight-weighted).

The reference computes per-head losses inside ``UniAD.forward_train`` and
weights them with ``task_loss_weight`` (reference UniAD/projects/
mmdet3d_plugin/uniad/detectors/uniad_e2e.py:27-47,231). Here the heads
return raw predictions and this module assembles the weighted total from
the per-head loss functions, with fixed-capacity targets.

Motion/occupancy targets are aligned to query slots through the SAME
Hungarian assignment as the track loss (the reference aligns through its
ClipMatcher track ids; with fixed-capacity track slots the per-frame
assignment is the jittable equivalent).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vidar_tpu.core import bbox as bbox_core
from vidar_tpu.uniad.motion_head import traj_loss
from vidar_tpu.uniad.occ_head import (dice_loss_with_masks,
                                      fiery_binary_seg_loss)
from vidar_tpu.uniad.panseg_head import panseg_loss_single
from vidar_tpu.uniad.planning_head import planning_loss


class UniADTargets(NamedTuple):
    """Fixed-capacity ground truth for one UniAD training sample.

    G / Gm cap detection / map ground-truth counts; T / To / Tp are the
    motion / occupancy / planning horizons. The ``track_*`` clip fields
    (optional, [B, Tc, ...] with Tc = clip length) carry per-frame gt with
    clip-consistent instance ids for ClipMatcher training (reference
    gt_inds, uniad_track.py:571); when absent the step falls back to
    single-frame training.
    """
    gt_boxes: jnp.ndarray        # [B, G, 9] cx cy cz w l h rot vx vy
    gt_labels: jnp.ndarray       # [B, G] int32
    num_valid_gt: jnp.ndarray    # [B] int32
    map_boxes: jnp.ndarray       # [B, Gm, 4] cxcywh in [0, 1]
    map_labels: jnp.ndarray      # [B, Gm] int32
    num_valid_map: jnp.ndarray   # [B] int32
    gt_traj: jnp.ndarray         # [B, G, T, 2] future agent xy
    gt_traj_valid: jnp.ndarray   # [B, G, T] {0,1}
    sdc_traj: jnp.ndarray        # [B, Tp, 3] x y yaw
    sdc_mask: jnp.ndarray        # [B, Tp] {0,1}
    gt_occ: jnp.ndarray          # [B, G, To, H, W] instance occupancy {0,1}
    map_masks: jnp.ndarray       # [B, Gm, Hb, Wb] map element BEV masks
    # ---- clip-training fields (None => single-frame fallback) ----
    track_boxes: Optional[jnp.ndarray] = None   # [B, Tc, G, 10] normalized
    track_labels: Optional[jnp.ndarray] = None  # [B, Tc, G] int32
    track_ids: Optional[jnp.ndarray] = None     # [B, Tc, G] int32, -1 pad
    track_num: Optional[jnp.ndarray] = None     # [B, Tc] int32
    l2g_r: Optional[jnp.ndarray] = None         # [B, Tc, 3, 3]
    l2g_t: Optional[jnp.ndarray] = None         # [B, Tc, 3]
    timestamp: Optional[jnp.ndarray] = None     # [B, Tc] seconds


DEFAULT_TASK_WEIGHTS = dict(track=1.0, map=1.0, motion=1.0, occ=1.0,
                            planning=1.0)


def _track_assign(cls_scores, bbox_preds, gt_norm, gt_labels, num_valid_gt,
                  cls_weight=2.0, bbox_weight=0.25):
    """Per-sample Hungarian assignment: [B, Q] gt index or -1."""
    g = gt_norm.shape[1]

    def one(cls_s, box_p, gt_n, gt_l, n_valid):
        cost = (bbox_core.focal_loss_cost(cls_s, gt_l, weight=cls_weight) +
                bbox_core.bbox3d_l1_cost(box_p, gt_n, weight=bbox_weight))
        gt_pad = jnp.arange(g) >= n_valid
        cost = jnp.where(gt_pad[None, :], jnp.float32(1e8), cost)
        return bbox_core.hungarian_assign(cost, n_valid)

    return jax.vmap(one)(cls_scores, bbox_preds, gt_norm, gt_labels,
                         num_valid_gt)


def _detr_losses(cls_scores, bbox_preds, assigned, gt_norm, gt_labels,
                 num_classes, code_weights=None, cls_weight=2.0,
                 bbox_weight=0.25):
    g = gt_norm.shape[1]
    pos = assigned >= 0
    a_safe = jnp.clip(assigned, 0, g - 1)
    labels = jnp.where(pos, jnp.take_along_axis(gt_labels, a_safe, axis=1),
                       num_classes)
    targets = jnp.take_along_axis(gt_norm, a_safe[..., None], axis=1)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    cls_l = bbox_core.sigmoid_focal_loss(
        cls_scores, labels, num_classes).sum() * cls_weight / num_pos
    isfin = jnp.all(jnp.isfinite(targets), axis=-1) & pos
    l1 = jnp.abs(bbox_preds - targets)
    if code_weights is not None:
        l1 = l1 * jnp.asarray(code_weights)
    l1 = (l1 * isfin[..., None].astype(l1.dtype)).sum()
    return jnp.nan_to_num(cls_l), jnp.nan_to_num(l1 * bbox_weight / num_pos)


def uniad_loss(out, targets: UniADTargets,
               task_loss_weight: Optional[dict] = None,
               num_det_classes: int = 10, num_map_things: int = 3):
    """Weighted UniAD loss. ``out`` is the dict from ``UniAD.__call__``.

    Returns (total, dict of per-term losses).
    """
    w = dict(DEFAULT_TASK_WEIGHTS)
    if task_loss_weight:
        w.update(task_loss_weight)
    losses = {}

    # ---- track: DETR loss over decoder layers (track_head) ----
    all_cls = out['det']['all_cls_scores']
    all_box = out['det']['all_bbox_preds']
    gt_norm = bbox_core.normalize_bbox(targets.gt_boxes)
    track_total = 0.0
    assigned_last = None
    for lid in range(all_cls.shape[0]):
        assigned = _track_assign(all_cls[lid], all_box[lid], gt_norm,
                                 targets.gt_labels, targets.num_valid_gt)
        cls_l, box_l = _detr_losses(all_cls[lid], all_box[lid], assigned,
                                    gt_norm, targets.gt_labels,
                                    num_det_classes)
        track_total = track_total + cls_l + box_l
        assigned_last = assigned
    losses['track.loss'] = track_total
    total, losses = _downstream_losses(out, targets, assigned_last, w,
                                       losses, num_map_things)
    return total, losses


def uniad_clip_loss(track_losses, out, targets: UniADTargets, matched_last,
                    task_loss_weight: Optional[dict] = None,
                    num_map_things: int = 3):
    """Weighted UniAD loss for the clip-training path.

    ``track_losses`` comes from ``UniAD.clip_forward`` (per-frame
    ClipMatcher losses summed over the clip); the downstream heads are
    aligned to gt through ``matched_last`` [B, cap] — the final frame's
    track<->gt assignment, the reference's track-id alignment
    (motion_head.py:139-160 consumes matched track queries)."""
    w = dict(DEFAULT_TASK_WEIGHTS)
    if task_loss_weight:
        w.update(task_loss_weight)
    losses = {'track.loss': track_losses['loss_cls'] +
              track_losses['loss_bbox']}
    return _downstream_losses(out, targets, matched_last, w, losses,
                              num_map_things)


def _downstream_losses(out, targets: UniADTargets, assigned_last, w,
                       losses, num_map_things: int = 3):
    # ---- map: per-sample DETR loss on the last seg layer ----
    seg_cls = out['seg']['outputs_classes'][-1]
    seg_box = out['seg']['outputs_coords'][-1]
    map_losses = jax.vmap(
        lambda c, b2, gl, gb, nv: panseg_loss_single(
            c, b2, gl, gb, nv, num_things_classes=num_map_things))(
        seg_cls, seg_box, targets.map_labels, targets.map_boxes,
        targets.num_valid_map)
    map_assign = map_losses.pop('assign')          # [B, Q] (NOT a loss)
    map_total = sum(v.mean() for v in map_losses.values())
    # thing-mask branch (reference DiceLoss weight=2.0, panseg_head.py:64):
    # gt element masks follow the same Hungarian assignment through the
    # top-k query selection
    seg_masks = out['seg'].get('masks')
    if seg_masks is not None:
        top = seg_masks['thing_index']             # [B, K]
        tm = seg_masks['thing_masks']              # [B, K, Hb, Wb]
        gm = targets.map_masks.shape[1]
        a_top = jnp.take_along_axis(map_assign, top, axis=1)
        pos_m = a_top >= 0
        safe_m = jnp.clip(a_top, 0, gm - 1)
        gt_m = jnp.take_along_axis(
            targets.map_masks, safe_m[..., None, None], axis=1)
        valid_m = pos_m[..., None, None].astype(jnp.float32)
        map_total = map_total + 2.0 * dice_loss_with_masks(
            tm, gt_m, valid_m)
    losses['map.loss'] = map_total

    # ---- motion: MTP loss on slots aligned by the track assignment ----
    g = targets.gt_boxes.shape[1]
    pos = assigned_last >= 0
    a_safe = jnp.clip(assigned_last, 0, g - 1)
    agent_traj = jnp.take_along_axis(
        targets.gt_traj, a_safe[..., None, None], axis=1)   # [B, Q, T, 2]
    agent_valid = jnp.take_along_axis(
        targets.gt_traj_valid, a_safe[..., None], axis=1)   # [B, Q, T]
    # SDC occupies the last motion slot; supervise with the plan gt
    t_m = agent_traj.shape[2]
    sdc_xy = targets.sdc_traj[:, :t_m, :2][:, None]
    sdc_valid = targets.sdc_mask[:, :t_m][:, None]
    gt_traj_all = jnp.concatenate([agent_traj, sdc_xy], axis=1)
    gt_valid_all = jnp.concatenate(
        [agent_valid.astype(jnp.float32), sdc_valid.astype(jnp.float32)],
        axis=1)
    mask_all = jnp.concatenate(
        [pos.astype(jnp.float32), jnp.ones_like(pos[:, :1], jnp.float32)],
        axis=1)
    motion_losses = traj_loss(
        out['motion']['all_traj_scores'][-1],
        out['motion']['all_traj_preds'][-1],
        gt_traj_all, gt_valid_all, mask_all)
    losses['motion.loss'] = motion_losses['loss_traj']

    # ---- occ: instance occupancy aligned by the same assignment ----
    occ_logits = out['occ']['ins_occ_logits']       # [B, A, To, H, W]
    to_, hh, ww = occ_logits.shape[2:]
    gt_occ = jnp.take_along_axis(
        targets.gt_occ[:, :, :to_],
        a_safe[..., None, None, None], axis=1)      # [B, A(=Q), To, H, W]
    occ_a = occ_logits[:, :gt_occ.shape[1]]
    valid = pos[..., None, None, None].astype(jnp.float32)
    occ_l = (fiery_binary_seg_loss(occ_a, gt_occ, valid) +
             dice_loss_with_masks(occ_a, gt_occ, valid))
    losses['occ.loss'] = occ_l

    # ---- planning ----
    tp = out['plan']['sdc_traj'].shape[1]
    losses['planning.loss'] = planning_loss(
        out['plan']['sdc_traj'], targets.sdc_traj[:, :tp, :2],
        targets.sdc_mask[:, :tp])

    total = (w['track'] * losses['track.loss'] +
             w['map'] * losses['map.loss'] +
             w['motion'] * losses['motion.loss'] +
             w['occ'] * losses['occ.loss'] +
             w['planning'] * losses['planning.loss'])
    return total, losses
