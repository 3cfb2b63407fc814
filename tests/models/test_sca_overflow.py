"""SCA static-capacity safety: overflow metric + visibility scan tool.

The fixed-capacity compaction must never SILENTLY drop visible queries
(reference spatial_cross_attention.py:135-166 keeps every visible query via
dynamic rebatching). These tests prove drops are detected by the standard
train metric and that the dataset-scan tool reports the safe capacity.
"""

import numpy as np
import jax.numpy as jnp

from vidar_tpu.models.encoder import (sca_overflow_count, point_sampling,
                                      reference_points_3d)
from vidar_tpu.models.attention import sca_compaction

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def _wide_lidar2img(num_cams=2):
    """Calibration where camera 0 sees a huge swath of the BEV plane."""
    l2i = np.zeros((1, 1, num_cams, 4, 4), np.float32)
    # camera 0: x_img = 100*X + 800 + 800*Z... keep it simple: a weak
    # perspective looking straight down +X with a wide FoV
    for c in range(num_cams):
        K = np.array([[400.0, 0, 800, 0],
                      [0, 400.0, 450, 0],
                      [0, 0, 1, 0],
                      [0, 0, 0, 1]], np.float32)
        R = np.eye(4, dtype=np.float32)
        # camera c looks along +X (c=0) / -X (c=1): depth = ±X
        sign = 1.0 if c == 0 else -1.0
        R[:3, :3] = np.array([[0, -sign, 0],
                              [0, 0, -1],
                              [sign, 0, 0]], np.float32)
        l2i[0, 0, c] = K @ R
    return l2i


def test_overflow_detected_and_zero_when_capacity_safe():
    bev_h = bev_w = 20
    l2i = _wide_lidar2img()
    img_hw = (900, 1600)

    # ground truth visibility via point_sampling itself
    ref3d = jnp.asarray(reference_points_3d(bev_h, bev_w, PC[5] - PC[2], 4))
    _, bev_mask = point_sampling(ref3d, PC, jnp.asarray(l2i[0]), img_hw)
    vis_per_cam = np.asarray(jnp.any(bev_mask, -1).sum(2)).max()
    assert vis_per_cam > 40  # the construction actually sees queries

    tight_ratio = (vis_per_cam - 10) / (bev_h * bev_w)
    over = sca_overflow_count(jnp.asarray(l2i), img_hw, bev_h, bev_w, PC,
                              float(tight_ratio))
    assert int(over) >= 10  # drops detected (>= because cap floors)

    safe_ratio = min(0.99, (vis_per_cam + 8) / (bev_h * bev_w))
    over = sca_overflow_count(jnp.asarray(l2i), img_hw, bev_h, bev_w, PC,
                              float(safe_ratio))
    assert int(over) == 0

    # capacity disabled -> always 0
    assert int(sca_overflow_count(jnp.asarray(l2i), img_hw, bev_h, bev_w,
                                  PC, 0.0)) == 0


def test_overflow_matches_compaction_telemetry():
    """The train metric must agree with what the compaction actually drops."""
    bev_h = bev_w = 16
    l2i = jnp.asarray(_wide_lidar2img()[0])  # [1, cams, 4, 4]
    img_hw = (900, 1600)
    ref3d = jnp.asarray(reference_points_3d(bev_h, bev_w, PC[5] - PC[2], 4))
    ref_cam, bev_mask = point_sampling(ref3d, PC, l2i, img_hw)

    ratio = 0.1
    cap = int(bev_h * bev_w * ratio)
    _, _, _, _, overflow, _ = sca_compaction(ref_cam, bev_mask, cap)
    metric = sca_overflow_count(l2i[None], img_hw, bev_h, bev_w, PC, ratio)
    assert int(metric) == int(np.asarray(overflow).max())


def test_visibility_scan_tool(tmp_path):
    from tests.data.fake_nuscenes import make_fake_nuscenes
    from vidar_tpu.tools.analysis import visibility_scan
    import os
    pkl = make_fake_nuscenes(str(tmp_path / 'data'), num_samples=4,
                             num_cams=3, img_hw=(32, 64), num_scenes=1)
    cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), 'configs', 'tiny', 'vidar_tiny.py')
    rep = visibility_scan(cfg, max_samples=2,
                          cfg_options=[f'data.train.ann_file={pkl}'])
    assert 0.0 <= rep['visible_frac_peak'] <= 1.0
    assert rep['min_safe_capacity_ratio'] == rep['visible_frac_peak']
    assert rep['suggested_capacity_ratio'] >= rep['visible_frac_peak']
