"""Clip matcher: identity inheritance, fresh Hungarian, velo_update."""

import numpy as np
import jax.numpy as jnp

from vidar_tpu.uniad.clip_matcher import (FrameGT, inherit_matches,
                                          match_new_tracks, frame_track_loss,
                                          bev_iou_aligned, velo_update)
from vidar_tpu.core.bbox import normalize_bbox


def _gt(centers, labels, ids, g_cap=8):
    n = len(centers)
    boxes9 = np.zeros((g_cap, 9), np.float32)
    lab = np.zeros((g_cap,), np.int32)
    idv = np.full((g_cap,), -1, np.int32)
    for i, c in enumerate(centers):
        boxes9[i, :2] = c
        boxes9[i, 3:6] = 1.0
    lab[:n] = labels
    idv[:n] = ids
    return FrameGT(boxes=normalize_bbox(jnp.asarray(boxes9)),
                   labels=jnp.asarray(lab), ids=jnp.asarray(idv),
                   num_valid=jnp.asarray(n, jnp.int32))


def test_inherit_follows_ids_across_reorder():
    obj = jnp.asarray([7, -1, 3, -1], jnp.int32)
    gt = _gt([(0, 0), (1, 1)], [0, 0], [3, 7])
    m = np.asarray(inherit_matches(obj, gt))
    assert m[0] == 1   # id 7 -> gt row 1
    assert m[2] == 0   # id 3 -> gt row 0
    assert m[1] == -1 and m[3] == -1


def test_inherit_disappeared_gives_minus_one():
    obj = jnp.asarray([5, -1], jnp.int32)
    gt = _gt([(0, 0)], [0], [9])
    m = np.asarray(inherit_matches(obj, gt))
    assert m[0] == -1


def test_match_new_tracks_assigns_untracked_gt():
    cap, g = 4, 8
    cls_logits = jnp.full((cap, 3), -4.0)
    boxes9 = np.zeros((cap, 9), np.float32)
    boxes9[:, 3:6] = 1.0
    boxes9[1, :2] = (5.0, 5.0)   # slot 1 near gt B
    box_preds = normalize_bbox(jnp.asarray(boxes9))

    gt = _gt([(0.1, 0.0), (5.0, 5.0)], [0, 0], [11, 22])
    obj = jnp.asarray([11, -1, -1, -1], jnp.int32)   # slot 0 tracks id 11
    matched = inherit_matches(obj, gt)
    slot_mask = jnp.ones((cap,), bool)
    obj2, m2 = match_new_tracks(cls_logits, box_preds, obj, matched, gt,
                                slot_mask)
    obj2, m2 = np.asarray(obj2), np.asarray(m2)
    assert obj2[0] == 11 and m2[0] == 0            # inherited kept
    assert obj2[1] == 22 and m2[1] == 1            # fresh match by distance
    assert (obj2[2:] == -1).all()                  # one gt, one slot


def test_match_new_respects_slot_mask():
    cap = 3
    cls_logits = jnp.zeros((cap, 2))
    box_preds = normalize_bbox(jnp.asarray(
        np.tile(np.array([0, 0, 0, 1, 1, 1, 0, 0, 0], np.float32), (cap, 1))))
    gt = _gt([(0.0, 0.0)], [0], [1])
    obj = jnp.full((cap,), -1, jnp.int32)
    matched = inherit_matches(obj, gt)
    mask = jnp.asarray([False, False, True])
    obj2, m2 = match_new_tracks(cls_logits, box_preds, obj, matched, gt, mask)
    assert np.asarray(obj2)[2] == 1
    assert (np.asarray(obj2)[:2] == -1).all()


def test_frame_track_loss_counts_disappeared():
    cap = 3
    cls_logits = jnp.zeros((cap, 2))
    box_preds = jnp.zeros((cap, 10))
    gt = _gt([(0, 0)], [0], [4])
    slot_mask = jnp.ones((cap,), bool)
    # slot 0 matched, slot 1 disappeared track (obj >= 0, matched -1)
    obj = jnp.asarray([4, 9, -1], jnp.int32)
    matched = inherit_matches(obj, gt)
    out = frame_track_loss(cls_logits, box_preds, matched, obj, gt,
                           slot_mask, num_classes=2)
    assert np.isfinite(float(out['loss_cls']))
    assert np.isfinite(float(out['loss_bbox']))
    # num_samples = 1 gt + 1 disappeared = 2: halves the raw sum vs 1 gt
    gt_solo = _gt([(0, 0)], [0], [4])
    obj_solo = jnp.asarray([4, -1, -1], jnp.int32)
    out_solo = frame_track_loss(cls_logits, box_preds,
                                inherit_matches(obj_solo, gt_solo), obj_solo,
                                gt_solo, slot_mask, num_classes=2)
    np.testing.assert_allclose(float(out['loss_cls']) * 2,
                               float(out_solo['loss_cls']), rtol=1e-5)


def test_bev_iou_identity_and_disjoint():
    a = jnp.asarray([[0, 0, 0, 2, 4, 1, 0, 0, 0],
                     [0, 0, 0, 2, 4, 1, 0, 0, 0]], jnp.float32)
    b = jnp.asarray([[0, 0, 0, 2, 4, 1, 0, 0, 0],
                     [10, 10, 0, 2, 4, 1, 0, 0, 0]], jnp.float32)
    iou = np.asarray(bev_iou_aligned(a, b))
    np.testing.assert_allclose(iou, [1.0, 0.0], atol=1e-5)


def test_velo_update_identity_frames():
    pc = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    ref = jnp.asarray([[0.5, 0.5, 0.5]])     # lidar origin-ish
    v = jnp.asarray([[2.0, -1.0]])           # m/s
    eye = jnp.eye(3)
    zero = jnp.zeros((3,))
    out = np.asarray(velo_update(ref, v, eye, zero, eye, zero,
                                 jnp.asarray(0.5), pc))
    # 0.5 s at (2, -1) m/s -> +1.0 m x, -0.5 m y in a 102.4 m span
    np.testing.assert_allclose(out[0, 0], 0.5 + 1.0 / 102.4, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.5 - 0.5 / 102.4, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.5, atol=1e-6)


def test_velo_update_ego_translation():
    pc = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    ref = jnp.asarray([[0.5, 0.5, 0.5]])
    v = jnp.zeros((1, 2))
    eye = jnp.eye(3)
    # next frame's ego moved +3 m x in global: the static point shifts -3 m
    out = np.asarray(velo_update(ref, v, eye, jnp.zeros(3), eye,
                                 jnp.asarray([3.0, 0.0, 0.0]),
                                 jnp.asarray(0.5), pc))
    np.testing.assert_allclose(out[0, 0], 0.5 - 3.0 / 102.4, atol=1e-6)
