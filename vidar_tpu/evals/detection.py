"""nuScenes-protocol detection metrics: mAP (center-distance) + TP errors + NDS.

Devkit-free implementation of the evaluation the reference runs through
``NuScenesEval_custom`` (reference datasets/nuscnes_eval.py:507, a thin
subclass of the official nuScenes eval): per-class average precision at
center-distance thresholds {0.5, 1, 2, 4} m, true-positive errors
(ATE/ASE/AOE/AVE/AAE) at the 2 m threshold, and
NDS = (5*mAP + sum(1 - min(1, tp_err))) / 10.

Operates on plain numpy dicts:
  prediction: {sample_token: {boxes [N,9], scores [N], labels [N]}}
  ground truth: {sample_token: {boxes [M,9], labels [M], (optional)
                 attr/velocity already inside boxes[7:9]}}
Box layout: (cx, cy, cz, w, l, h, yaw, vx, vy).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1


def _yaw_diff(a, b):
    d = np.abs(a - b) % (2 * np.pi)
    return np.minimum(d, 2 * np.pi - d)


def _scale_iou(pred, gt):
    """IoU of aligned, axis-centred boxes (size-only similarity)."""
    inter = np.prod(np.minimum(pred[3:6], gt[3:6]))
    union = np.prod(pred[3:6]) + np.prod(gt[3:6]) - inter
    return inter / max(union, 1e-12)


def _accumulate_class(preds, gts, dist_th: float):
    """Match one class at one distance threshold.

    preds: list of (score, box, token); gts: {token: [boxes]}.
    Returns (tp flags sorted by score desc, n_pos, tp_errors dict lists).
    """
    n_pos = sum(len(v) for v in gts.values())
    order = sorted(range(len(preds)), key=lambda i: -preds[i][0])
    taken = defaultdict(set)
    tp = np.zeros(len(order), bool)
    errs = dict(trans=[], scale=[], orient=[], vel=[])
    for rank, i in enumerate(order):
        score, box, token = preds[i]
        gt_boxes = gts.get(token, [])
        best, best_d = -1, dist_th
        for gi, gb in enumerate(gt_boxes):
            if gi in taken[token]:
                continue
            d = np.linalg.norm(box[:2] - gb[:2])
            if d < best_d:
                best, best_d = gi, d
        if best >= 0:
            taken[token].add(best)
            tp[rank] = True
            gb = gt_boxes[best]
            errs['trans'].append(best_d)
            errs['scale'].append(1.0 - _scale_iou(box, gb))
            errs['orient'].append(_yaw_diff(box[6], gb[6]))
            errs['vel'].append(np.linalg.norm(box[7:9] - gb[7:9]))
    return tp, n_pos, errs


def _average_precision(tp: np.ndarray, n_pos: int) -> float:
    if n_pos == 0 or len(tp) == 0:
        return 0.0
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    prec = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    rec = cum_tp / n_pos
    # 101-point interpolation clipped at min recall/precision (nuScenes)
    rec_interp = np.linspace(0, 1, 101)
    prec_interp = np.interp(rec_interp, rec, prec, right=0)
    prec_interp = np.maximum.accumulate(prec_interp[::-1])[::-1]
    mask = rec_interp >= MIN_RECALL
    ap = np.clip(prec_interp[mask] - MIN_PRECISION, 0, 1).sum() / (
        mask.sum() * (1 - MIN_PRECISION))
    return float(ap)


def evaluate_detection(predictions: Dict, ground_truth: Dict,
                       class_names: Sequence[str]) -> Dict[str, float]:
    """Compute per-class AP, TP errors, mAP and NDS."""
    metrics: Dict[str, float] = {}
    aps = []
    tp_errs = {k: [] for k in ('trans', 'scale', 'orient', 'vel')}
    for ci, cname in enumerate(class_names):
        preds = []
        for token, p in predictions.items():
            sel = np.asarray(p['labels']) == ci
            for b, s in zip(np.asarray(p['boxes'])[sel],
                            np.asarray(p['scores'])[sel]):
                preds.append((float(s), b, token))
        gts = {}
        for token, g in ground_truth.items():
            sel = np.asarray(g['labels']) == ci
            gts[token] = list(np.asarray(g['boxes'])[sel])

        class_aps = []
        for th in DIST_THRESHOLDS:
            tp, n_pos, errs = _accumulate_class(preds, gts, th)
            class_aps.append(_average_precision(tp, n_pos))
            if th == TP_THRESHOLD:
                for k in tp_errs:
                    if errs[k]:
                        tp_errs[k].append(float(np.mean(errs[k])))
        ap = float(np.mean(class_aps))
        metrics[f'AP_{cname}'] = ap
        aps.append(ap)

    m_ap = float(np.mean(aps)) if aps else 0.0
    metrics['mAP'] = m_ap
    tp_scores = []
    for k, norm in (('trans', 1.0), ('scale', 1.0), ('orient', np.pi),
                    ('vel', 1.0)):
        err = float(np.mean(tp_errs[k])) if tp_errs[k] else 1.0
        metrics[f'm{k.upper()}E'] = err
        tp_scores.append(max(0.0, 1.0 - min(1.0, err / norm
                                            if k == 'orient' else err)))
    # nuScenes NDS uses 5 TP metrics (incl. attribute); without attribute
    # labels in this pipeline mAAE defaults to its neutral 1.0 contribution.
    metrics['mAAE'] = 1.0
    tp_scores.append(0.0)
    nds = (5.0 * m_ap + sum(tp_scores)) / 10.0
    metrics['NDS'] = float(nds)
    return metrics
