"""Forecast evaluation: chamfer distance + 4d-occ ray errors.

Host-side metric computation over the device-decoded ray depths; mirrors the
reference protocol:

* chamfer on points inside the pc_range, bidirectional mean of squared
  distances halved (reference e2e_predictor_utils.py:163-183) — the KNN runs
  on device via ``vidar_tpu.ops.chamfer``;
* ray L1 / AbsRel with ray clamping to the 4d-occ volume
  (reference eval_utils.py:39-225, PC_RANGE [-70, 70] x [-4.5, 4.5]);
* per-frame dict aggregation (reference
  nuscenes_vidar_dataset_template.py:147-197 and vidar.py:446-502).

Frame keys: 2 Hz keyframes, so CD@1s = frame.2, CD@2s = frame.4,
CD@3s = frame.6; frame.0 is the reconstructed current frame.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import jax.numpy as jnp

from ..ops.chamfer import chamfer_distance

OCC_PC_RANGE = (-70.0, -70.0, -4.5, 70.0, 70.0, 4.5)
_BIG = 1e8


def inside_mask(points: np.ndarray, pc_range: Sequence[float]) -> np.ndarray:
    return ((pc_range[0] <= points[..., 0]) & (points[..., 0] <= pc_range[3]) &
            (pc_range[1] <= points[..., 1]) & (points[..., 1] <= pc_range[4]) &
            (pc_range[2] <= points[..., 2]) & (points[..., 2] <= pc_range[5]))


def render_pcds(origin: np.ndarray, gt_points: np.ndarray,
                dist: np.ndarray) -> np.ndarray:
    """Place points along origin->gt unit rays at the given distances.

    origin [3], gt_points [N, 3], dist [N] -> [N, 3]
    (reference vidar_head_base.py:344-389 get_rendered_pcds).
    """
    r = gt_points - origin[None]
    r_norm = r / np.maximum(np.sqrt((r ** 2).sum(1, keepdims=True)), 1e-12)
    return origin[None] + r_norm * dist[:, None]


def chamfer_distance_inner(pred_pcd: np.ndarray, gt_pcd: np.ndarray,
                           pc_range: Sequence[float]) -> float:
    pred = pred_pcd[inside_mask(pred_pcd, pc_range)]
    gt = gt_pcd[inside_mask(gt_pcd, pc_range)]
    if len(pred) == 0 or len(gt) == 0:
        return 0.0
    return float(chamfer_distance(jnp.asarray(pred, jnp.float32),
                                  jnp.asarray(gt, jnp.float32)))


# ---------------------------------------------------------- 4d-occ ray errors

def _spherical(pcd: np.ndarray):
    d = np.sqrt((pcd ** 2).sum(1))
    azimuth = np.arctan2(pcd[:, 0], pcd[:, 1])
    elevation = np.arctan2(pcd[:, 2], pcd[:, 1])
    return azimuth, elevation, d


def _clamp_to_volume(pcd: np.ndarray, origin: np.ndarray):
    """Clamp each origin->point ray to the 4d-occ volume box.

    Simplified vectorised equivalent of reference eval_utils.clamp/_clamp for
    the common case (origin inside the volume): points outside the box are
    pulled back along the ray to the box boundary. Returns (origins, points,
    invalid_mask).
    """
    lo = np.array(OCC_PC_RANGE[:3])
    hi = np.array(OCC_PC_RANGE[3:])
    origins = np.broadcast_to(origin[None], pcd.shape).copy()
    pts = pcd.copy()

    inner = inside_mask(pts, OCC_PC_RANGE)
    if (~inner).any():
        out = pts[~inner]
        d = out - origin[None]
        l = np.sqrt((d ** 2).sum(1, keepdims=True))
        u = d / np.maximum(l, 1e-12)
        # exit parameter along the ray for each face (reversed direction test)
        with np.errstate(divide='ignore', invalid='ignore'):
            t_lo = (lo[None] - origin[None]) / np.where(
                np.abs(u) < 1e-12, np.inf, u)
            t_hi = (hi[None] - origin[None]) / np.where(
                np.abs(u) < 1e-12, np.inf, u)
        t_max = np.minimum(np.maximum(t_lo, t_hi), _BIG).min(axis=1)
        t_max = np.clip(t_max, 0.0, None)
        pts[~inner] = origin[None] + u * t_max[:, None]

    invalid = (np.isinf(pts).all(1) | np.isnan(pts).all(1))
    return origins, pts, invalid


def compute_ray_errors(pred_pcd: np.ndarray, gt_pcd: np.ndarray,
                       origin: np.ndarray):
    """Ray-matched L1 / AbsRel between predicted and GT point clouds.

    Each GT ray is matched (1-NN in spherical direction space) to the nearest
    predicted ray; the predicted depth is interpolated onto the GT ray;
    errors are computed after clamping both to the 4d-occ volume
    (reference eval_utils.py:185-225).
    """
    pred_n = pred_pcd - origin[None]
    gt_n = gt_pcd - origin[None]
    theta_p, phi_p, d_p = _spherical(pred_n)
    theta_g, phi_g, d_g = _spherical(gt_n)

    mp = d_p > 1e-2
    mg = d_g > 1e-2
    theta_p, phi_p, d_p = theta_p[mp], phi_p[mp], d_p[mp]
    theta_g, phi_g, d_g = theta_g[mg], phi_g[mg], d_g[mg]
    gt_kept = gt_pcd[mg]
    count = theta_g.shape[0]
    if count == 0 or theta_p.shape[0] == 0:
        return 0.0, 0.0

    pred_sph = np.stack([theta_p, phi_p, np.ones_like(theta_p)], 1)
    gt_sph = np.stack([theta_g, phi_g, np.ones_like(theta_g)], 1)
    # 1-NN of each gt direction among pred directions (device KNN)
    from ..ops.chamfer import nearest_neighbor_sq
    _, idx = nearest_neighbor_sq(
        jnp.asarray(gt_sph), jnp.asarray(pred_sph),
        jnp.ones((gt_sph.shape[0],), bool),
        jnp.ones((pred_sph.shape[0],), bool))
    idx = np.asarray(idx)

    v = gt_kept - origin[None]
    unit = v / np.maximum(np.sqrt((v ** 2).sum(1, keepdims=True)), 1e-12)
    pred_interp = origin[None] + d_p[idx][:, None] * unit

    go, gp, invalid = _clamp_to_volume(gt_kept, origin)
    _, pi, _ = _clamp_to_volume(pred_interp, origin)
    gp, pi, go = gp[~invalid], pi[~invalid], go[~invalid]
    d_clamped = np.sqrt(((gp - go) ** 2).sum(1))
    valid = d_clamped > 0.01
    d_clamped = d_clamped[valid]
    eucl = np.sqrt(((gp[valid] - pi[valid]) ** 2).sum(1))
    return float(eucl.sum() / count), float((eucl / d_clamped).sum() / count)


# ------------------------------------------------------------- aggregation

def forecast_metrics(decode: Dict, pc_range: Sequence[float],
                     num_frames: int) -> Dict[str, Dict[str, float]]:
    """Turn a device decode dict into the reference's per-frame metric dict.

    decode carries [bs, P] pred/gt distances + frame indices and [bs, V, 3]
    origins (see ViDARHead.decode_pointcloud).
    """
    pred_dist = np.asarray(decode['pred_dist'])
    gt_dist = np.asarray(decode['gt_dist'])
    frame_idx = np.asarray(decode['frame_idx'])
    gt_points = np.asarray(decode['gt_points_ref'])
    origins = np.asarray(decode['origins'])
    bs = pred_dist.shape[0]

    out = {}
    for f in range(num_frames):
        res = dict(count=0, chamfer_distance=0.0, l1_error=0.0,
                   absrel_error=0.0)
        for b in range(bs):
            sel = (frame_idx[b] == f) & (gt_dist[b] > 0.0)
            if not sel.any():
                res['count'] += 1
                continue
            origin = origins[b, f]
            gt_pcd = render_pcds(origin, gt_points[b][sel], gt_dist[b][sel])
            pred_pcd = render_pcds(origin, gt_points[b][sel],
                                   pred_dist[b][sel])
            res['chamfer_distance'] += chamfer_distance_inner(
                pred_pcd, gt_pcd, pc_range)
            l1, absrel = compute_ray_errors(pred_pcd, gt_pcd, origin)
            res['l1_error'] += l1
            res['absrel_error'] += absrel
            res['count'] += 1
        out[f'frame.{f}'] = res
    return out


def aggregate_frame_metrics(results: List[Dict]) -> Dict:
    """Sum per-sample frame dicts and divide by counts
    (reference nuscenes_vidar_dataset_template.py:176-191)."""
    agg = None
    for r in results:
        if agg is None:
            agg = {fk: dict(fv) for fk, fv in r.items()}
        else:
            for fk, fv in r.items():
                for k, v in fv.items():
                    agg[fk][k] += v
    for fk, fv in agg.items():
        cnt = max(fv['count'], 1)
        for k in fv:
            if k != 'count':
                fv[k] /= cnt
    return agg
