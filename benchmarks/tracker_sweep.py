"""RuntimeTracker birth/death threshold sweep against AMOTA.

VERDICT round-2 item 7: the tracker's ``score_thresh`` / ``filter_score_thresh``
/ ``miss_tolerance`` defaults (reference
UniAD/.../track_head_plugin/tracker.py:6-41 uses 0.4 / 0.35 / 5) were never
tuned against the AMOTA metric this repo now implements. No nuScenes data
exists in this environment, so the sweep runs on a synthetic multi-scene
benchmark that models the failure modes the thresholds trade off:

* real objects emit noisy scores around ``tp_score`` with occlusion dips
  (births too strict -> FNs; deaths too eager -> id switches / fragments);
* empty query slots emit clutter scores with occasional flickers
  (births too loose -> FPs and ghost tracks).

The simulation drives the REAL ``uniad.track.RuntimeTracker.update`` over
``TrackInstances`` states and scores the resulting id streams with the REAL
``evals.tracking.evaluate_tracking`` AMOTA.

Run: JAX_PLATFORMS=cpu python benchmarks/tracker_sweep.py
"""

import itertools
import json

import numpy as np


def simulate_scene(rng, tracker_cls, kwargs, num_frames=40, num_objects=8,
                   cap=24, flicker_p=0.06, occlusion_p=0.12,
                   tp_score=0.75, noise_score=0.15):
    """One scene: returns (pred_frames, gt_frames) for evaluate_tracking."""
    import jax.numpy as jnp
    from vidar_tpu.uniad.track import TrackInstances

    tracker = tracker_cls(**kwargs)
    tr = TrackInstances.empty(cap, 8, 1, jnp.zeros((cap, 16)),
                              jnp.zeros((cap, 3)))

    # ground-truth trajectories: constant velocity in [-40, 40] m
    pos = rng.uniform(-30, 30, (num_objects, 2))
    vel = rng.uniform(-1.5, 1.5, (num_objects, 2))
    # object k lives in slot k (the detector is assumed consistent per
    # scene; slot assignment consistency is the track head's job, the
    # tracker only does birth/death bookkeeping on scores)
    preds, gts = [], []
    for t in range(num_frames):
        pos = pos + vel
        occluded = rng.random(num_objects) < occlusion_p
        scores = np.full((cap,), 0.0, np.float32)
        boxes = np.zeros((cap, 2), np.float32)
        for k in range(num_objects):
            s = rng.normal(tp_score, 0.08)
            if occluded[k]:
                s = rng.normal(noise_score, 0.05)
            scores[k] = np.clip(s, 0.0, 1.0)
            boxes[k] = pos[k] + rng.normal(0, 0.3, 2)
        for k in range(num_objects, cap):
            s = rng.normal(noise_score, 0.08)
            if rng.random() < flicker_p:
                s = rng.normal(0.55, 0.1)
            scores[k] = np.clip(s, 0.0, 1.0)
            boxes[k] = rng.uniform(-40, 40, 2)

        tr = tr.replace(scores=jnp.asarray(scores))
        tr = tracker.update(tr)
        ids = np.asarray(tr.obj_idxes)

        keep = ids >= 0
        preds.append(dict(xy=boxes[keep], ids=ids[keep],
                          scores=scores[keep]))
        gts.append(dict(xy=pos.copy(), ids=np.arange(num_objects)))
    return preds, gts


def run_sweep(grid=None, num_scenes=6, seed=0, verbose=True):
    from vidar_tpu.uniad.track import RuntimeTracker
    from vidar_tpu.evals.tracking import evaluate_tracking

    if grid is None:
        grid = dict(score_thresh=(0.3, 0.4, 0.5, 0.6),
                    filter_score_thresh=(0.25, 0.35, 0.45),
                    miss_tolerance=(2, 5, 8))

    # fixed synthetic dataset across the sweep
    rng = np.random.default_rng(seed)
    scene_seeds = rng.integers(0, 2 ** 31, num_scenes)

    results = []
    for st, ft, mt in itertools.product(grid['score_thresh'],
                                        grid['filter_score_thresh'],
                                        grid['miss_tolerance']):
        if ft > st:
            continue  # filter threshold above birth threshold is ill-posed
        predictions, ground_truth = {}, {}
        for si, ss in enumerate(scene_seeds):
            srng = np.random.default_rng(ss)
            preds, gts = simulate_scene(
                srng, RuntimeTracker,
                dict(score_thresh=st, filter_score_thresh=ft,
                     miss_tolerance=mt))
            for t, (p, g) in enumerate(zip(preds, gts)):
                tok = f's{si}_f{t}'
                predictions[tok] = dict(
                    scene=f's{si}',
                    boxes=np.concatenate(
                        [p['xy'], np.zeros((len(p['xy']), 5))], -1),
                    scores=p['scores'],
                    track_ids=p['ids'],
                    labels=np.zeros(len(p['xy']), np.int32))
                ground_truth[tok] = dict(
                    scene=f's{si}',
                    boxes=np.concatenate(
                        [g['xy'], np.zeros((len(g['xy']), 5))], -1),
                    track_ids=g['ids'],
                    labels=np.zeros(len(g['xy']), np.int32))
        m = evaluate_tracking(predictions, ground_truth, classes=('car',))
        results.append(dict(score_thresh=st, filter_score_thresh=ft,
                            miss_tolerance=mt,
                            amota=round(float(m['amota']), 4),
                            amotp=round(float(m['amotp']), 4)))
        if verbose:
            print(json.dumps(results[-1]))

    best = max(results, key=lambda r: r['amota'])
    if verbose:
        print('BEST:', json.dumps(best))
    return results, best


if __name__ == '__main__':
    run_sweep()
