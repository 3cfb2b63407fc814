"""Detection-results renderer (reference tools/analysis_tools/visual.py
parity surface): camera-grid + BEV figures from synthetic boxes, devkit-free.
"""
import os
import pickle

import numpy as np
import pytest

from vidar_tpu.tools.visualize import (box_corners_3d, render_detection_sample,
                                       viz_detections)


def _pinhole_lidar2img(cams=6, img_w=320, img_h=192):
    """Simple lidar2img stack: camera c looks along a yaw of c*60deg."""
    fx = fy = 160.0
    k = np.array([[fx, 0, img_w / 2, 0],
                  [0, fy, img_h / 2, 0],
                  [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float64)
    mats = []
    for c in range(cams):
        yaw = np.deg2rad(60.0 * c)
        # lidar -> cam: z_cam = forward axis (cos yaw, sin yaw), x_cam =
        # right, y_cam = down (z_lidar up)
        fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        right = np.array([np.sin(yaw), -np.cos(yaw), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        r = np.stack([right, down, fwd])
        ext = np.eye(4)
        ext[:3, :3] = r
        mats.append(k @ ext)
    return np.stack(mats)


def test_box_corners_shape_and_heading():
    boxes = np.array([[1.0, 2.0, 0.5, 2.0, 4.0, 1.5, 0.0, 0, 0]])
    c = box_corners_3d(boxes)
    assert c.shape == (1, 8, 3)
    # l=4 along x at yaw 0: x extent [-1, 3]
    np.testing.assert_allclose(c[0, :, 0].max(), 3.0)
    np.testing.assert_allclose(c[0, :, 0].min(), -1.0)
    # w=2 along y: [1, 3]; h=1.5 around cz=0.5: [-0.25, 1.25]
    np.testing.assert_allclose(c[0, :, 1].max(), 3.0)
    np.testing.assert_allclose(c[0, :, 2].min(), -0.25)
    # 90deg yaw swaps extents
    boxes[0, 6] = np.pi / 2
    c = box_corners_3d(boxes)
    np.testing.assert_allclose(c[0, :, 1].max(), 4.0, atol=1e-9)


def test_render_detection_sample(tmp_path):
    rng = np.random.default_rng(0)
    cams, img_h, img_w = 6, 192, 320
    images = (rng.uniform(0, 255, (cams, img_h, img_w, 3))).astype(np.uint8)
    lidar2img = _pinhole_lidar2img(cams, img_w, img_h)
    # boxes ahead of cameras 0 and 3 (yaw 0 and 180)
    pred = {
        'boxes': np.array([[8.0, 0.5, 0.0, 2.0, 4.5, 1.6, 0.2, 0, 0],
                           [-9.0, -1.0, 0.2, 0.6, 0.8, 1.7, 1.0, 0, 0]]),
        'scores': np.array([0.9, 0.55]),
        'labels': np.array([0, 8]),
    }
    gt = {
        'boxes': np.array([[8.2, 0.4, 0.0, 2.0, 4.4, 1.6, 0.25, 0, 0]]),
        'labels': np.array([0]),
    }
    out = str(tmp_path / 'sample.png')
    counts = render_detection_sample(images, lidar2img, pred, gt, out)
    assert counts['pred'] >= 2      # both boxes visible in >=1 camera
    assert counts['gt'] >= 1
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / 'sample_bev.png'))


def test_render_score_threshold_filters(tmp_path):
    images = np.zeros((6, 64, 96, 3), np.uint8)
    lidar2img = _pinhole_lidar2img(6, 96, 64)
    pred = {'boxes': np.array([[5.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 0, 0]]),
            'scores': np.array([0.1]), 'labels': np.array([0])}
    gt = {'boxes': np.zeros((0, 9)), 'labels': np.zeros(0, np.int32)}
    counts = render_detection_sample(images, lidar2img, pred, gt,
                                     str(tmp_path / 'f.png'))
    assert counts['pred'] == 0      # below the 0.2 score threshold


def test_viz_detections_cli_surface(tmp_path):
    images = np.zeros((6, 64, 96, 3), np.uint8)
    lidar2img = _pinhole_lidar2img(6, 96, 64)
    rec = {
        'images': images, 'lidar2img': lidar2img,
        'pred': {'boxes': np.array([[5.0, 0, 0, 2, 4, 1.5, 0, 0, 0]]),
                 'scores': np.array([0.8]), 'labels': np.array([0])},
        'gt': {'boxes': np.array([[5.1, 0, 0, 2, 4, 1.5, 0, 0, 0]]),
               'labels': np.array([0])},
    }
    pkl = str(tmp_path / 'dump.pkl')
    with open(pkl, 'wb') as f:
        pickle.dump({'tok0': rec, 'tok1': rec}, f)
    out_dir = str(tmp_path / 'viz')
    viz_detections(pkl, out_dir, num_samples=1)
    assert os.path.exists(os.path.join(out_dir, 'tok0.png'))
    assert os.path.exists(os.path.join(out_dir, 'tok0_bev.png'))
    assert not os.path.exists(os.path.join(out_dir, 'tok1.png'))
