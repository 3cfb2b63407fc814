"""Devkit-protocol semantics tests for evals/detection.py.

Constructed examples verifying the nuScenes eval contract the reference
inherits through NuScenesEval_custom (reference datasets/nuscnes_eval.py:507):
TP errors as recall-band averages of cumulative means, per-class metric
exclusions, barrier orientation period, attribute error, and the NDS
formula with raw (un-normalized) errors.
"""

import numpy as np
import pytest

from vidar_tpu.evals.detection import (DEFAULT_ATTRIBUTE, evaluate_detection,
                                       infer_attributes)

CLASSES = ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
           'barrier', 'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone')


def _box(x, y, yaw=0.0, size=(2.0, 4.0, 1.5), vel=(0.0, 0.0), z=0.0):
    return np.array([x, y, z, size[0], size[1], size[2], yaw,
                     vel[0], vel[1]])


def _sample(boxes, labels, scores=None, attrs=None):
    d = dict(boxes=np.asarray(boxes).reshape(-1, 9),
             labels=np.asarray(labels))
    if scores is not None:
        d['scores'] = np.asarray(scores)
    if attrs is not None:
        d['attrs'] = np.asarray(attrs)
    return d


def test_perfect_prediction_full_scores():
    gt = {'s0': _sample([_box(1, 2), _box(10, -5)], [0, 0])}
    pred = {'s0': _sample([_box(1, 2), _box(10, -5)], [0, 0], [0.9, 0.8])}
    m = evaluate_detection(pred, gt, ('car',))
    assert m['AP_car'] == pytest.approx(1.0)
    assert m['mATE'] == pytest.approx(0.0)
    assert m['mASE'] == pytest.approx(0.0)
    assert m['mAOE'] == pytest.approx(0.0)
    assert m['mAVE'] == pytest.approx(0.0)
    # no attrs anywhere -> neutral mAAE = 1.0, NDS = (5*1 + 4*1 + 0)/10
    assert m['mAAE'] == pytest.approx(1.0)
    assert m['NDS'] == pytest.approx(0.9)


def test_tp_error_is_recall_band_average_not_plain_mean():
    """Two TPs with different errors: the devkit averages the cumulative
    mean over the [0.1, max_recall] recall band, which weights the
    first (higher-confidence) match more than a plain mean would."""
    gt = {'s0': _sample([_box(0, 0), _box(20, 0)], [0, 0])}
    # first match exact, second offset by 1 m -> trans errors (0, 1)
    pred = {'s0': _sample([_box(0, 0), _box(21, 0)], [0, 0], [0.9, 0.8])}
    m = evaluate_detection(pred, gt, ('car',))
    # cummean = [0, 0.5] at recalls [0.5, 1.0]; interpolated on the
    # 101-pt grid then averaged over indices 11..100:
    rec = np.linspace(0, 1, 101)
    interp = np.interp(rec, [0.5, 1.0], [0.0, 0.5])
    expected = float(np.mean(interp[11:]))
    assert m['mATE'] == pytest.approx(expected, abs=1e-6)
    # a plain mean over matches would be 0.5 — must NOT be that
    assert m['mATE'] < 0.4


def test_barrier_orientation_period_pi():
    gt = {'s0': _sample([_box(0, 0, yaw=0.0)], [0])}
    pred = {'s0': _sample([_box(0, 0, yaw=np.pi)], [0], [0.9])}
    # as 'car' (period 2pi) the error is pi
    m_car = evaluate_detection(pred, gt, ('car',))
    assert m_car['mAOE'] == pytest.approx(np.pi, abs=1e-6)
    # as 'barrier' (period pi) the flip is equivalent -> 0
    m_bar = evaluate_detection(pred, gt, ('barrier',))
    assert m_bar['mAOE'] == pytest.approx(0.0, abs=1e-6)


def test_class_exclusions_traffic_cone_and_barrier():
    """Cones contribute no AOE/AVE/AAE, barriers no AVE/AAE: with only a
    cone in the data the excluded means fall back to the 1.0 default."""
    gt = {'s0': _sample([_box(0, 0)], [0])}
    pred = {'s0': _sample([_box(0, 0, yaw=1.0, vel=(3.0, 0))], [0], [0.9])}
    m = evaluate_detection(pred, gt, ('traffic_cone',))
    # matched, so ATE/ASE real; AOE/AVE excluded despite the large errors
    assert m['mATE'] == pytest.approx(0.0)
    assert m['mAOE'] == pytest.approx(1.0)   # excluded -> default
    assert m['mAVE'] == pytest.approx(1.0)   # excluded -> default


def test_attribute_error():
    gt = {'s0': _sample([_box(0, 0), _box(10, 0)], [0, 0],
                        attrs=['vehicle.parked', 'vehicle.moving'])}
    pred = {'s0': _sample([_box(0, 0), _box(10, 0)], [0, 0], [0.9, 0.8],
                          attrs=['vehicle.parked', 'vehicle.parked'])}
    m = evaluate_detection(pred, gt, ('car',))
    # cummean of attr errs [0, 0.5] -> same band average as the ATE test
    rec = np.linspace(0, 1, 101)
    interp = np.interp(rec, [0.5, 1.0], [0.0, 0.5])
    assert m['mAAE'] == pytest.approx(float(np.mean(interp[11:])), abs=1e-6)


def test_attributeless_gt_is_skipped_not_counted():
    """A gt with no attribute ('' — cones/barriers) contributes nan to the
    attr cummean (devkit attr_acc), not an error of 1."""
    gt = {'s0': _sample([_box(0, 0), _box(10, 0)], [0, 0],
                        attrs=['', 'vehicle.moving'])}
    pred = {'s0': _sample([_box(0, 0), _box(10, 0)], [0, 0], [0.9, 0.8],
                          attrs=['vehicle.parked', 'vehicle.moving'])}
    m = evaluate_detection(pred, gt, ('car',))
    assert m['mAAE'] == pytest.approx(0.0, abs=1e-6)


def test_nds_uses_raw_clamped_errors():
    """Orientation error enters NDS as 1 - min(1, err) with err in
    radians (NOT normalized by pi)."""
    gt = {'s0': _sample([_box(0, 0, yaw=0.0)], [0])}
    pred = {'s0': _sample([_box(0, 0, yaw=0.5)], [0], [0.9])}
    m = evaluate_detection(pred, gt, ('car',))
    assert m['mAOE'] == pytest.approx(0.5, abs=1e-6)
    # tp scores: trans 1, scale 1, orient 1-0.5, vel 1, attr 1-min(1,1)=0
    assert m['NDS'] == pytest.approx((5 * 1.0 + 1 + 1 + 0.5 + 1 + 0) / 10,
                                     abs=1e-6)


def test_ap_uses_min_recall_precision_clips():
    """One TP out of 10 gts: recall 0.1 never exceeds min_recall -> AP 0."""
    gt = {'s0': _sample([_box(10 * i, 0) for i in range(10)], [0] * 10)}
    pred = {'s0': _sample([_box(0, 0)], [0], [0.9])}
    m = evaluate_detection(pred, gt, ('car',))
    assert m['AP_car'] == pytest.approx(0.0)
    # and the TP band is empty -> errors fall back to 1.0
    assert m['mATE'] == pytest.approx(1.0)


def test_infer_attributes_speed_heuristic():
    classes = ('car', 'bus', 'pedestrian', 'bicycle', 'traffic_cone')
    boxes = np.stack([
        _box(0, 0, vel=(1.0, 0)),    # moving car
        _box(0, 0, vel=(0.0, 0)),    # parked car
        _box(0, 0, vel=(0.0, 0)),    # stopped bus
        _box(0, 0, vel=(0.0, 0)),    # standing pedestrian
        _box(0, 0, vel=(1.0, 0)),    # riding bicycle
        _box(0, 0, vel=(0.0, 0)),    # cone
    ])
    labels = np.array([0, 0, 1, 2, 3, 4])
    attrs = infer_attributes(boxes, labels, classes)
    assert list(attrs) == ['vehicle.moving', 'vehicle.parked',
                           'vehicle.stopped', 'pedestrian.standing',
                           'cycle.with_rider', '']
    assert DEFAULT_ATTRIBUTE['bus'] == 'vehicle.moving'
