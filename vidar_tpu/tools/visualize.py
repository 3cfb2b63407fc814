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
    args = p.parse_args()
    if args.cmd == 'browse':
        browse_dataset(args.config, args.out_dir, args.num_samples,
                       args.cfg_options)


if __name__ == '__main__':
    main()
