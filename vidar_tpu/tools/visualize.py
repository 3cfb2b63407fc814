"""Visualization tools: BEV point cloud plots + dataset browsing.

Capability match for reference tools/nusc_viz.py, tools/misc/visualize_results
and the detector's ``_viz_pcd`` (reference vidar.py:521-536 +
e2e_predictor_utils._dbg_draw_pc_function:188-224): BEV scatter of predicted
vs GT point clouds with ego marker, saved as png.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def draw_pcd_bev(pred_pcd: np.ndarray, output_path: str,
                 gt_pcd: Optional[np.ndarray] = None,
                 origin: Optional[np.ndarray] = None,
                 axes_limit: float = 40.0) -> None:
    """BEV scatter: predictions blue, GT pink, origin red cross."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    _, ax = plt.subplots(1, 1, figsize=(9, 9))
    ax.scatter(pred_pcd[:, 0], pred_pcd[:, 1], c='#0000e6', s=0.2,
               label='pred')
    if gt_pcd is not None:
        ax.scatter(gt_pcd[:, 0], gt_pcd[:, 1], c='#db7093', s=0.2,
                   label='gt')
    if origin is not None:
        ax.scatter(origin[0], origin[1], c='red', s=100, marker='x')
    ax.plot(0, 0, 'x', color='red')
    ax.set_xlim(-axes_limit, axes_limit)
    ax.set_ylim(-axes_limit, axes_limit)
    ax.axis('off')
    ax.set_aspect('equal')
    os.makedirs(os.path.dirname(output_path) or '.', exist_ok=True)
    plt.savefig(output_path, bbox_inches='tight', pad_inches=0, dpi=200)
    plt.close()


def viz_forecast(decode: dict, pc_range, out_prefix: str,
                 sample_name: str = 'sample') -> None:
    """Render per-future-frame pred vs gt BEV plots from a decode dict."""
    from ..evals.metrics import render_pcds, inside_mask

    pred_dist = np.asarray(decode['pred_dist'])[0]
    gt_dist = np.asarray(decode['gt_dist'])[0]
    frame_idx = np.asarray(decode['frame_idx'])[0]
    gt_points = np.asarray(decode['gt_points_ref'])[0]
    origins = np.asarray(decode['origins'])[0]
    for f in sorted(set(frame_idx[frame_idx >= 0].tolist())):
        sel = (frame_idx == f) & (gt_dist > 0)
        if not sel.any():
            continue
        origin = origins[f]
        gt = render_pcds(origin, gt_points[sel], gt_dist[sel])
        pred = render_pcds(origin, gt_points[sel], pred_dist[sel])
        inner = inside_mask(gt, pc_range)
        draw_pcd_bev(pred[inner], f'{out_prefix}_{sample_name}_{f}.png',
                     gt_pcd=gt[inner], origin=origin)


# --------------------------------------------------- detection results ----
#
# Devkit-free re-implementation of the reference detection-results renderer
# (reference tools/analysis_tools/visual.py:275-477 lidiar_render +
# render_sample_data): a 4x3 camera grid — 6 cameras with predicted boxes,
# the same 6 with ground-truth boxes — plus a BEV figure overlaying pred vs
# gt footprints. Boxes are [cx cy cz w l h yaw vx vy] in lidar frame (the
# repo's eval layout, models/detection.py:211); projection uses the batch's
# lidar2img, no nuScenes devkit needed.

CAM_ORDER = ('CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
             'CAM_BACK_LEFT', 'CAM_BACK', 'CAM_BACK_RIGHT')

# per-class draw colors, nuScenes detection classes (reference
# visual.py:320-350 tableau-ish scheme)
CLASS_COLORS = {
    'car': '#ff9e4a', 'truck': '#ff9e4a', 'construction_vehicle': '#ff9e4a',
    'bus': '#ff9e4a', 'trailer': '#ff9e4a',
    'barrier': '#9467bd',
    'motorcycle': '#e377c2', 'bicycle': '#e377c2',
    'pedestrian': '#1f77b4', 'traffic_cone': '#d62728',
}
DEFAULT_CLASSES = ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
                   'barrier', 'motorcycle', 'bicycle', 'pedestrian',
                   'traffic_cone')

# the 12 box edges over the corner ordering of box_corners_3d
_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),          # bottom
          (4, 5), (5, 6), (6, 7), (7, 4),          # top
          (0, 4), (1, 5), (2, 6), (3, 7)]          # verticals
_FRONT_CROSS = [(0, 5), (1, 4)]                    # X on the +x face


def box_corners_3d(boxes: np.ndarray) -> np.ndarray:
    """[N, >=7] (cx cy cz w l h yaw) -> [N, 8, 3] corners, lidar frame.

    nuScenes convention: l along the box x (heading) axis, w lateral, z up;
    cz is the box center. Bottom corners 0-3 (x+y+, x+y-, x-y-, x-y+),
    top 4-7 in the same xy order.
    """
    boxes = np.asarray(boxes, np.float64)
    n = boxes.shape[0]
    l, w, h = boxes[:, 4], boxes[:, 3], boxes[:, 5]
    sx = np.array([1, 1, -1, -1], np.float64)
    sy = np.array([1, -1, -1, 1], np.float64)
    cx = sx[None, :] * (l / 2)[:, None]      # [N, 4]
    cy = sy[None, :] * (w / 2)[:, None]
    yaw = boxes[:, 6]
    c, s = np.cos(yaw)[:, None], np.sin(yaw)[:, None]
    gx = c * cx - s * cy + boxes[:, 0:1]
    gy = s * cx + c * cy + boxes[:, 1:2]
    corners = np.zeros((n, 8, 3), np.float64)
    for half, zsign in ((slice(0, 4), -1.0), (slice(4, 8), 1.0)):
        corners[:, half, 0] = gx
        corners[:, half, 1] = gy
        corners[:, half, 2] = (boxes[:, 2] + zsign * h / 2)[:, None]
    return corners


def _project(corners: np.ndarray, lidar2img: np.ndarray):
    """[N, 8, 3] -> ([N, 8, 2] pixels, [N, 8] depth)."""
    hom = np.concatenate([corners, np.ones_like(corners[..., :1])], axis=-1)
    cam = hom @ np.asarray(lidar2img, np.float64).T
    depth = cam[..., 2]
    pix = cam[..., :2] / np.maximum(depth[..., None], 1e-5)
    return pix, depth


def draw_boxes_camera(ax, boxes, labels, lidar2img, img_w: int, img_h: int,
                      class_names=DEFAULT_CLASSES, linewidth: float = 1.5
                      ) -> int:
    """Draw projected 3D wireframes on a camera axis; returns boxes drawn."""
    if len(boxes) == 0:
        return 0
    pix, depth = _project(box_corners_3d(boxes), lidar2img)
    drawn = 0
    for i in range(len(boxes)):
        if depth[i].max() < 0.1:        # fully behind the camera
            continue
        vis = ((pix[i, :, 0] > -img_w) & (pix[i, :, 0] < 2 * img_w) &
               (pix[i, :, 1] > -img_h) & (pix[i, :, 1] < 2 * img_h))
        if not vis.any():
            continue
        name = (class_names[int(labels[i])]
                if labels is not None and int(labels[i]) < len(class_names)
                else 'car')
        color = CLASS_COLORS.get(name, '#2ca02c')
        any_edge = False
        for (a, b) in _EDGES + _FRONT_CROSS:
            if depth[i, a] < 0.1 or depth[i, b] < 0.1:
                continue
            ax.plot([pix[i, a, 0], pix[i, b, 0]],
                    [pix[i, a, 1], pix[i, b, 1]],
                    color=color, linewidth=linewidth)
            any_edge = True
        drawn += int(any_edge)
    return drawn


def draw_boxes_bev_ax(ax, boxes, color, linewidth: float = 1.0) -> None:
    """BEV footprints (rect + heading tick) for [N, >=7] boxes."""
    if len(boxes) == 0:
        return
    corners = box_corners_3d(boxes)[:, :4, :2]      # bottom face
    for i in range(len(boxes)):
        ring = np.concatenate([corners[i], corners[i][:1]], axis=0)
        ax.plot(ring[:, 0], ring[:, 1], color=color, linewidth=linewidth)
        # heading tick: center -> midpoint of the +x edge (corners 0-1)
        mid = corners[i, :2].mean(axis=0)
        ax.plot([boxes[i][0], mid[0]], [boxes[i][1], mid[1]],
                color=color, linewidth=linewidth)


def render_detection_sample(images, lidar2img, pred: dict, gt: dict,
                            out_path: str, class_names=DEFAULT_CLASSES,
                            score_thr: float = 0.2, axes_limit: float = 54.0,
                            cam_names=CAM_ORDER) -> dict:
    """Reference-style detection viz: 4x3 camera grid + BEV overlay.

    images: [cams, H, W, 3] uint8 (or float in [0,1]); lidar2img
    [cams, 4, 4]; pred {'boxes','scores','labels'}; gt {'boxes','labels'}.
    Writes ``out_path`` (camera grid) and ``out_path_bev.png``; returns draw
    counts for testability.
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    cams = images.shape[0]
    pb = np.asarray(pred['boxes']).reshape(-1, np.asarray(
        pred['boxes']).shape[-1] if len(pred['boxes']) else 9)
    keep = (np.asarray(pred['scores']).reshape(-1) > score_thr
            if len(pb) else np.zeros(0, bool))
    pb = pb[keep]
    pl_ = (np.asarray(pred['labels']).reshape(-1)[keep]
           if len(keep) else np.zeros(0, np.int32))
    gb = np.asarray(gt['boxes']).reshape(-1, 9) if len(gt['boxes']) else \
        np.zeros((0, 9))
    gl = np.asarray(gt['labels']).reshape(-1) if len(gb) else \
        np.zeros(0, np.int32)

    img_h, img_w = images.shape[1:3]
    if images.dtype != np.uint8:
        images = np.clip(images, 0.0, 1.0)
    counts = {'pred': 0, 'gt': 0}
    fig, axes = plt.subplots(4, 3, figsize=(24, 18))
    for ind in range(min(cams, 6)):
        row, col = divmod(ind, 3)
        for (rr, boxes, labels, key) in ((row, pb, pl_, 'pred'),
                                         (row + 2, gb, gl, 'gt')):
            ax = axes[rr, col]
            ax.imshow(images[ind])
            counts[key] += draw_boxes_camera(
                ax, boxes, labels, lidar2img[ind], img_w, img_h,
                class_names)
            ax.set_xlim(0, img_w)
            ax.set_ylim(img_h, 0)
            ax.axis('off')
            if ind < len(cam_names):
                ax.set_title(f'{"PRED" if key == "pred" else "GT"} '
                             f'{cam_names[ind]}', fontsize=9)
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    fig.savefig(out_path, bbox_inches='tight', dpi=72)
    plt.close(fig)

    fig, ax = plt.subplots(1, 1, figsize=(9, 9))
    draw_boxes_bev_ax(ax, gb, '#2ca02c')          # gt green (reference)
    draw_boxes_bev_ax(ax, pb, '#0000e6')          # pred blue
    ax.plot(0, 0, 'x', color='red')
    ax.set_xlim(-axes_limit, axes_limit)
    ax.set_ylim(-axes_limit, axes_limit)
    ax.set_aspect('equal')
    base, ext = os.path.splitext(out_path)
    fig.savefig(f'{base}_bev{ext or ".png"}', bbox_inches='tight', dpi=72)
    plt.close(fig)
    return counts


def viz_detections(results_pkl: str, out_dir: str, num_samples: int = 5,
                   score_thr: float = 0.2) -> None:
    """Render detection results dumped by tools/test.py (--dump-viz): a
    pickle {token: {images, lidar2img, pred, gt}}."""
    import pickle
    with open(results_pkl, 'rb') as f:
        dump = pickle.load(f)
    for i, (token, rec) in enumerate(dump.items()):
        if i >= num_samples:
            break
        render_detection_sample(
            rec['images'], rec['lidar2img'], rec['pred'], rec['gt'],
            os.path.join(out_dir, f'{token}.png'), score_thr=score_thr)
    print(f'wrote {min(num_samples, len(dump))} detection plots to '
          f'{out_dir}')


def browse_dataset(config: str, out_dir: str, num_samples: int = 5,
                   cfg_options=None) -> None:
    """Dump BEV lidar plots of the first samples of the configured dataset."""
    from ..core.config import load_config, apply_overrides
    from ..data.nuscenes import NuScenesViDARDataset

    cfg = apply_overrides(load_config(config), cfg_options)
    ds = NuScenesViDARDataset(**cfg['data']['train'])
    for i in range(min(num_samples, len(ds))):
        batch = ds[i]
        pts = np.asarray(batch.gt_points)[0]
        tix = np.asarray(batch.gt_tindex)[0]
        cur = pts[tix == cfg['data']['train'].get('queue_length', 4)]
        draw_pcd_bev(cur, os.path.join(out_dir, f'sample{i}.png'))
    print(f'wrote {min(num_samples, len(ds))} plots to {out_dir}')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    b = sub.add_parser('browse')
    b.add_argument('config')
    b.add_argument('--out-dir', default='viz')
    b.add_argument('--num-samples', type=int, default=5)
    b.add_argument('--cfg-options', nargs='+', default=None)
    d = sub.add_parser('detections',
                       help='render a tools/test.py --dump-viz pickle')
    d.add_argument('results_pkl')
    d.add_argument('--out-dir', default='viz_det')
    d.add_argument('--num-samples', type=int, default=5)
    d.add_argument('--score-thr', type=float, default=0.2)
    args = p.parse_args()
    if args.cmd == 'browse':
        browse_dataset(args.config, args.out_dir, args.num_samples,
                       args.cfg_options)
    elif args.cmd == 'detections':
        viz_detections(args.results_pkl, args.out_dir, args.num_samples,
                       args.score_thr)


if __name__ == '__main__':
    main()
