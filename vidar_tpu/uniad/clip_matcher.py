"""Clip-level track matching + losses (jittable, fixed capacity).

TPU-native counterpart of the reference ``ClipMatcher``
(UniAD/projects/mmdet3d_plugin/losses/track_loss.py:62-556) and the track
state propagation pieces of ``UniADTrack``
(UniAD/projects/mmdet3d_plugin/uniad/detectors/uniad_track.py:238-286
``velo_update``, :352-470 frame matching flow):

* **identity inheritance** — slots already bound to a gt instance id keep
  that gt across frames (matched by ``obj_idxes == gt_ids``, vectorized
  over the fixed capacity instead of the reference's python dict loop);
* **new-track Hungarian** — unmatched slots x untracked gts assigned with
  the shared padded-LAP (`core.bbox.hungarian_assign`), masked with a big
  cost instead of the reference's dynamic index_select;
* **per-frame focal + L1 losses** under the merged (inherited + fresh)
  assignment, normalized by (num gt + disappeared tracks) like the
  reference's ``num_samples`` accounting;
* **velocity ref-point compensation** between frames (``velo_update``),
  operating directly in the [0, 1] sigmoid-space refs our tracker stores.

The 3D-IoU gate the reference computes with a CUDA op (track_loss
``iou_3d``) is approximated with axis-aligned BEV IoU — a gating signal
only (selects which track queries feed the motion head), not a metric.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.struct

from ..core import bbox as bbox_core

BIG = jnp.float32(1e8)


@flax.struct.dataclass
class FrameGT:
    """Per-frame track gt (fixed caps; one sample — vmap for batches)."""
    boxes: jnp.ndarray      # [G, 10] normalized code
    labels: jnp.ndarray     # [G] int32
    ids: jnp.ndarray        # [G] int32 instance ids, -1 = pad
    num_valid: jnp.ndarray  # [] int32


def inherit_matches(obj_idxes: jnp.ndarray, gt: FrameGT) -> jnp.ndarray:
    """For slots bound to a gt id, find that id's gt row this frame.

    Returns matched_gt [cap] int32 (-1 when the slot's instance is absent
    this frame — the reference's track-disappear case, track_loss.py:
    389-400).
    """
    g = gt.ids.shape[0]
    gt_valid = (jnp.arange(g) < gt.num_valid) & (gt.ids >= 0)
    eq = (obj_idxes[:, None] == gt.ids[None, :]) & gt_valid[None, :]
    found = eq.any(axis=1)
    row = jnp.argmax(eq, axis=1).astype(jnp.int32)
    return jnp.where((obj_idxes >= 0) & found, row, -1)


def match_new_tracks(cls_logits: jnp.ndarray, box_preds: jnp.ndarray,
                     obj_idxes: jnp.ndarray, matched_gt: jnp.ndarray,
                     gt: FrameGT, slot_mask: jnp.ndarray,
                     cls_weight: float = 2.0, reg_weight: float = 0.25
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hungarian-match unmatched slots to untracked gts.

    slot_mask: [cap] bool — slots eligible for NEW matches (False for the
    SDC slot and any already-bound slot).
    Returns updated (obj_idxes, matched_gt).
    """
    cap, g = cls_logits.shape[0], gt.ids.shape[0]
    gt_valid = jnp.arange(g) < gt.num_valid
    tracked_gt = jnp.zeros((g,), bool).at[
        jnp.where(matched_gt >= 0, matched_gt, g)].set(True, mode='drop')
    free_slot = (obj_idxes == -1) & slot_mask

    cost = (bbox_core.focal_loss_cost(cls_logits, gt.labels,
                                      weight=cls_weight) +
            bbox_core.bbox3d_l1_cost(box_preds, gt.boxes,
                                     weight=reg_weight))
    cost = jnp.where(free_slot[:, None], cost, BIG)
    cost = jnp.where((gt_valid & ~tracked_gt)[None, :], cost, BIG)

    assigned = bbox_core.hungarian_assign(cost, gt.num_valid)  # [cap]
    # discard forced assignments onto masked rows/cols (the LAP assigns
    # every valid gt; big-cost pairs are structural, not real matches)
    a_safe = jnp.clip(assigned, 0, g - 1)
    real = (assigned >= 0) & (jnp.take_along_axis(
        cost, a_safe[:, None], axis=1)[:, 0] < BIG / 2)

    new_ids = jnp.take(gt.ids, a_safe)
    obj_idxes = jnp.where(real, new_ids, obj_idxes)
    matched_gt = jnp.where(real, a_safe, matched_gt)
    return obj_idxes, matched_gt


def frame_track_loss(cls_logits: jnp.ndarray, box_preds: jnp.ndarray,
                     matched_gt: jnp.ndarray, obj_idxes: jnp.ndarray,
                     gt: FrameGT, slot_mask: jnp.ndarray, num_classes: int,
                     cls_weight: float = 2.0, reg_weight: float = 0.25,
                     code_weights: Sequence[float] = (
                         1, 1, 1, 1, 1, 1, 1, 1, 0.2, 0.2)
                     ) -> Dict[str, jnp.ndarray]:
    """Focal cls over every eligible slot + L1 on matched slots.

    Normalization follows the reference ``num_samples`` accounting
    (track_loss.py:509): gt count + disappeared-track count.
    """
    g = gt.ids.shape[0]
    pos = (matched_gt >= 0) & slot_mask
    a_safe = jnp.clip(matched_gt, 0, g - 1)
    labels = jnp.where(pos, jnp.take(gt.labels, a_safe), num_classes)
    cls_l = bbox_core.sigmoid_focal_loss(cls_logits, labels, num_classes)
    cls_l = (cls_l * slot_mask[:, None]).sum()

    targets = jnp.take(gt.boxes, a_safe, axis=0)
    cw = jnp.asarray(code_weights)
    isfin = jnp.all(jnp.isfinite(targets), axis=-1) & pos
    l1 = (jnp.abs(box_preds - targets) * cw).sum(-1)
    l1 = (l1 * isfin.astype(l1.dtype)).sum()

    disappeared = ((obj_idxes >= 0) & (matched_gt < 0) & slot_mask).sum()
    num_samples = jnp.maximum(
        (gt.num_valid + disappeared).astype(jnp.float32), 1.0)
    return dict(loss_cls=cls_weight * cls_l / num_samples,
                loss_bbox=reg_weight * jnp.nan_to_num(l1) / num_samples)


def match_frame(all_cls: jnp.ndarray, all_box: jnp.ndarray,
                obj_idxes: jnp.ndarray, gt: FrameGT,
                slot_mask: jnp.ndarray, num_classes: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One frame of clip matching + losses over all decoder layers.

    The reference ``match_for_single_frame`` runs per decoder layer
    (track_loss.py:345-556) with identity inheritance shared (obj_idxes are
    only stepped at the last layer). Here: inherit + fresh-match on the
    LAST layer, and supervise every aux layer under that same assignment
    (the established DETR-aux simplification this repo's det head also
    uses — one discrete assignment per frame keeps the jitted graph to a
    single LAP call).

    Args:
      all_cls: [L, cap, num_classes]; all_box: [L, cap, 10]; obj_idxes:
      [cap] int32 carried from the previous frame.
    Returns (new_obj_idxes, matched_gt, losses-dict summed over layers).
    """
    matched = inherit_matches(obj_idxes, gt)
    obj_idxes, matched = match_new_tracks(
        all_cls[-1], all_box[-1], obj_idxes, matched, gt, slot_mask)
    losses = dict(loss_cls=jnp.float32(0.0), loss_bbox=jnp.float32(0.0))
    for lid in range(all_cls.shape[0]):
        fl = frame_track_loss(all_cls[lid], all_box[lid], matched,
                              obj_idxes, gt, slot_mask, num_classes)
        losses = {k: losses[k] + fl[k] for k in losses}
    return obj_idxes, matched, losses


def bev_iou_aligned(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray
                    ) -> jnp.ndarray:
    """Axis-aligned BEV IoU of paired denormalized boxes [N, >=5].

    Boxes are (cx cy cz w l ...); the rotation is ignored — an
    approximation of the reference's rotated ``iou_3d`` used only to gate
    which matched tracks feed the downstream heads."""
    ax, ay, aw, al = (boxes_a[:, 0], boxes_a[:, 1],
                      boxes_a[:, 3], boxes_a[:, 4])
    bx, by, bw, bl = (boxes_b[:, 0], boxes_b[:, 1],
                      boxes_b[:, 3], boxes_b[:, 4])
    ix = jnp.clip((jnp.minimum(ax + aw / 2, bx + bw / 2) -
                   jnp.maximum(ax - aw / 2, bx - bw / 2)), 0.0)
    iy = jnp.clip((jnp.minimum(ay + al / 2, by + bl / 2) -
                   jnp.maximum(ay - al / 2, by - bl / 2)), 0.0)
    inter = ix * iy
    union = aw * al + bw * bl - inter
    return inter / jnp.clip(union, 1e-6)


def velo_update(ref_pts: jnp.ndarray, velocity: jnp.ndarray,
                l2g_r1: jnp.ndarray, l2g_t1: jnp.ndarray,
                l2g_r2: jnp.ndarray, l2g_t2: jnp.ndarray,
                time_delta: jnp.ndarray,
                pc_range: Sequence[float]) -> jnp.ndarray:
    """Motion-compensate sigmoid-space reference points to the next frame.

    Reference uniad_track.py:238-286: unnormalize to the current lidar
    frame, advance by velocity * dt, re-express in the next frame's lidar
    coordinates (through lidar->global of both frames), renormalize.
    Our refs live in [0, 1] directly (no inverse-sigmoid detour).
    """
    pc = jnp.asarray(pc_range, jnp.float32)
    span = pc[3:6] - pc[0:3]
    pts = ref_pts * span + pc[0:3]                    # [cap, 3] metres
    velo = jnp.concatenate(
        [velocity, jnp.zeros_like(velocity[:, :1])], axis=-1)
    pts = pts + velo * time_delta
    # row-vector transform chain (reference: pts @ l2g_r1 + t1 - t2, then
    # @ inv(l2g_r2))
    pts = pts @ l2g_r1 + l2g_t1 - l2g_t2
    pts = pts @ jnp.linalg.inv(l2g_r2)
    return jnp.clip((pts - pc[0:3]) / span, 0.0, 1.0)
