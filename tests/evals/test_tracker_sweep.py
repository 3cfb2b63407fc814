"""Tracker threshold sweep machinery (VERDICT round-2 item 7).

Drives the real RuntimeTracker + AMOTA eval over a synthetic multi-scene
benchmark and asserts thresholds measurably matter (the sweep separates
good from bad settings by a wide AMOTA margin)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'benchmarks'))


def test_sweep_separates_thresholds():
    from tracker_sweep import run_sweep
    grid = dict(score_thresh=(0.3, 0.6), filter_score_thresh=(0.25,),
                miss_tolerance=(2, 8))
    results, best = run_sweep(grid=grid, num_scenes=2, verbose=False)
    assert len(results) == 4
    for r in results:
        assert set(r) == {'score_thresh', 'filter_score_thresh',
                          'miss_tolerance', 'amota', 'amotp'}
        assert 0.0 <= r['amota'] <= 1.0
    worst = min(results, key=lambda r: r['amota'])
    assert best['amota'] > worst['amota'] + 0.05
