"""AMOTA/AMOTP tracking metric (devkit-free protocol)."""

import numpy as np

from vidar_tpu.evals.tracking import evaluate_tracking, _mot_pass

CLASSES = ('car', 'pedestrian')


def _scene(n_frames=6, n_tracks=3, drift=1.0, scene='s0'):
    """Perfect gt + matching predictions: same boxes, stable ids."""
    preds, gts = {}, {}
    for f in range(n_frames):
        xy = np.stack([[10.0 * k + drift * f, 5.0 * k]
                       for k in range(n_tracks)])
        tok = f'{scene}_f{f}'
        gts[tok] = dict(boxes=xy, labels=np.zeros(n_tracks, np.int64),
                        track_ids=np.arange(n_tracks), scene=scene)
        preds[tok] = dict(boxes=xy + 0.1, scores=np.full(n_tracks, 0.9),
                          labels=np.zeros(n_tracks, np.int64),
                          track_ids=np.arange(n_tracks) + 50)
    return preds, gts


def test_perfect_tracking_amota_one():
    preds, gts = _scene()
    m = evaluate_tracking(preds, gts, CLASSES)
    assert m['amota'] > 0.99
    assert m['amotp'] < 0.2
    assert m['ids'] == 0


def test_id_switches_penalized():
    preds, gts = _scene()
    # flip the pred ids halfway: one IDS per track
    for f in range(3, 6):
        preds[f's0_f{f}']['track_ids'] = preds[f's0_f{f}']['track_ids'] + 7
    m = evaluate_tracking(preds, gts, CLASSES)
    assert m['ids'] == 3
    assert m['amota'] < 0.99


def test_empty_predictions_zero():
    _, gts = _scene()
    m = evaluate_tracking({}, gts, CLASSES)
    assert m['amota'] == 0.0


def test_false_positives_reduce_amota():
    preds, gts = _scene()
    for tok in preds:
        p = preds[tok]
        p['boxes'] = np.concatenate([p['boxes'],
                                     np.array([[500.0, 500.0]])])
        p['scores'] = np.concatenate([p['scores'], [0.95]])
        p['labels'] = np.concatenate([p['labels'], [0]]).astype(np.int64)
        p['track_ids'] = np.concatenate([p['track_ids'], [99]])
    m = evaluate_tracking(preds, gts, CLASSES)
    clean = evaluate_tracking(*_scene(), CLASSES)
    assert m['amota'] < clean['amota']


def test_mot_pass_counts():
    frames = [dict(pred_xy=np.array([[0.0, 0.0], [10.0, 0.0]]),
                   pred_score=np.array([0.9, 0.9]),
                   pred_tid=np.array([1, 2]),
                   gt_xy=np.array([[0.5, 0.0], [30.0, 0.0]]),
                   gt_tid=np.array([7, 8]))]
    s = _mot_pass(frames, 0.5, 2.0)
    assert s['tp'] == 1 and s['fp'] == 1 and s['fn'] == 1 and s['ids'] == 0


def test_greedy_vs_hungarian_matchers():
    """Greedy (the devkit DETECTION-eval convention) lets the high-score
    prediction take the shared nearest gt even when that starves another
    prediction; Hungarian/motmetrics trade it away to maximize matched
    pairs. This is exactly the protocol difference quantified in
    docs/STATUS.md."""
    # A (score .9) at 0; B (score .5) at 3. gt1 at 1.2 (in both gates),
    # gt2 at -1.5 (in A's gate only).
    frames = [dict(pred_xy=np.array([[0.0, 0.0], [3.0, 0.0]]),
                   pred_score=np.array([0.9, 0.5]),
                   pred_tid=np.array([1, 2]),
                   gt_xy=np.array([[1.2, 0.0], [-1.5, 0.0]]),
                   gt_tid=np.array([7, 8]))]
    g = _mot_pass(frames, 0.0, 2.0, matcher='greedy')
    h = _mot_pass(frames, 0.0, 2.0, matcher='hungarian')
    # greedy: A takes its nearest gt1 (1.2); B's only remaining gt2 is
    # 4.5 away -> unmatched. 1 TP, 1 FP, 1 FN.
    assert (g['tp'], g['fp'], g['fn']) == (1, 1, 1)
    # hungarian: A->gt2 (1.5), B->gt1 (1.8) -> 2 TP.
    assert (h['tp'], h['fp'], h['fn']) == (2, 0, 0)
    # with no prior correspondences the motmetrics matcher reduces to LAP
    assert _mot_pass(frames, 0.0, 2.0, matcher='motmetrics') == h
    # and it IS the default (devkit tracking eval runs py-motmetrics)
    assert _mot_pass(frames, 0.0, 2.0) == h


def test_motmetrics_continuity_preference():
    """The motmetrics accumulator re-uses the previous frame's
    correspondence when still inside the gate, even when a fresh LAP
    solve would assign a closer pair — so no IDS is charged where plain
    Hungarian would flip the pairing."""
    # frame 0: gt7 matched to pred A (tid 1). frame 1: pred B (tid 2)
    # is now CLOSER to gt7, but A is still inside the 2 m gate.
    frames = [
        dict(pred_xy=np.array([[0.0, 0.0]]), pred_score=np.array([0.9]),
             pred_tid=np.array([1]), gt_xy=np.array([[0.2, 0.0]]),
             gt_tid=np.array([7])),
        dict(pred_xy=np.array([[1.5, 0.0], [0.1, 0.0]]),
             pred_score=np.array([0.9, 0.9]), pred_tid=np.array([1, 2]),
             gt_xy=np.array([[0.0, 0.0]]), gt_tid=np.array([7])),
    ]
    m = _mot_pass(frames, 0.0, 2.0, matcher='motmetrics')
    # continuity: gt7 stays with pred tid 1 (1.5 m away) -> no IDS
    assert m['ids'] == 0 and m['tp'] == 2
    h = _mot_pass(frames, 0.0, 2.0, matcher='hungarian')
    # plain LAP picks the closer pred tid 2 in frame 1 -> one switch
    assert h['ids'] == 1
