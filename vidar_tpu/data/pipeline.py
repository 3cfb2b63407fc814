"""Host-side data pipeline transforms (numpy), mirroring the reference's
mmdet pipelines with the same hyperparameters but a functional API.

Capability matches (reference datasets/pipelines/):
  * load_points / load_multi_sweeps  <- loading.py:97-223
    (CustomLoadPointsFromMultiSweeps: nearest-timestamp non-random sweep
    select, ego-box masking, hard_sweeps_timestamp=0, remove_close)
  * voxel_downsample_points          <- loading.py:226-241
    (CustomVoxelBasedPointSampler: 1 m^3 voxels, max 1 pt/voxel, <=50k)
  * photometric_distortion           <- transform_3d PhotoMetricDistortion
  * crop_resize_flip                 <- augmentation.py:9-203 CropResizeFlipImage
  * normalize_images / pad_images    <- transform_3d Normalize/PadMultiViewImage
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ------------------------------------------------------------------- lidar

def load_points(path: str, load_dim: int = 5) -> np.ndarray:
    pts = np.fromfile(path, dtype=np.float32)
    return pts.reshape(-1, load_dim)


def ego_mask_filter(points: np.ndarray, ego_mask: Sequence[float]
                    ) -> np.ndarray:
    """Drop points inside the ego-vehicle box (x0, y0, x1, y1)."""
    inside = ((ego_mask[0] <= points[:, 0]) & (points[:, 0] <= ego_mask[2]) &
              (ego_mask[1] <= points[:, 1]) & (points[:, 1] <= ego_mask[3]))
    return points[~inside]


def remove_close(points: np.ndarray, radius: float = 1.0) -> np.ndarray:
    keep = (np.abs(points[:, 0]) >= radius) | (np.abs(points[:, 1]) >= radius)
    return points[keep]


def load_multi_sweeps(info: Dict, *, sweeps_num: int = 2,
                      ego_mask: Optional[Sequence[float]] = None,
                      hard_sweeps_timestamp: float = 0.0,
                      pad_empty_sweeps: bool = True) -> np.ndarray:
    """Current keyframe + nearest-timestamp sweeps, all in keyframe coords.

    Sweep points are mapped by the pkl's precomputed sensor2lidar rot/trans;
    timestamps are overwritten to ``hard_sweeps_timestamp`` (the released
    configs collapse sweep time, loading.py:107-113).
    """
    points = load_points(info['lidar_path'])
    if ego_mask is not None:
        points = ego_mask_filter(points, ego_mask)
    points[:, 4] = 0.0
    out = [points]

    sweeps = list(info.get('sweeps', []))
    if len(sweeps) == 0 and pad_empty_sweeps:
        for _ in range(sweeps_num):
            out.append(remove_close(points))
    else:
        # nearest-timestamp selection (non-random)
        ts = info['timestamp']
        order = np.argsort([abs(s['timestamp'] - ts) for s in sweeps])
        for si in order[:sweeps_num]:
            sweep = sweeps[si]
            pts = load_points(sweep['data_path'])
            pts = remove_close(pts)
            r = np.asarray(sweep['sensor2lidar_rotation'])
            t = np.asarray(sweep['sensor2lidar_translation'])
            pts[:, :3] = pts[:, :3] @ r.T + t
            pts[:, 4] = hard_sweeps_timestamp
            if ego_mask is not None:
                pts = ego_mask_filter(pts, ego_mask)
            out.append(pts)
    return np.concatenate(out, 0)


def voxel_downsample_points(points: np.ndarray,
                            pc_range: Sequence[float],
                            voxel_size: Sequence[float] = (1.0, 1.0, 1.0),
                            max_voxels: int = 50000,
                            rng: Optional[np.random.Generator] = None
                            ) -> np.ndarray:
    """Keep at most one point per voxel, at most ``max_voxels`` points."""
    pc = np.asarray(pc_range)
    vs = np.asarray(voxel_size)
    inside = np.all((points[:, :3] >= pc[:3]) & (points[:, :3] < pc[3:]),
                    axis=1)
    pts = points[inside]
    coords = np.floor((pts[:, :3] - pc[:3]) / vs).astype(np.int64)
    dims = np.ceil((pc[3:] - pc[:3]) / vs).astype(np.int64)
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    _, first_idx = np.unique(key, return_index=True)
    if len(first_idx) > max_voxels:
        if rng is None:
            first_idx = first_idx[:max_voxels]
        else:
            first_idx = rng.choice(first_idx, max_voxels, replace=False)
    return pts[np.sort(first_idx)]


# ------------------------------------------------------------------- images

def load_multiview_images(paths: Sequence[str]) -> np.ndarray:
    from vidar_tpu import native
    imgs = []
    for p in paths:
        if native.available() and p.lower().endswith(('.jpg', '.jpeg')):
            with open(p, 'rb') as f:
                imgs.append(native.jpeg_decode(f.read()).astype(np.float32))
        else:
            from PIL import Image
            imgs.append(np.asarray(Image.open(p), dtype=np.float32))
    return np.stack(imgs)  # [cams, H, W, 3] RGB


def photometric_distortion(imgs: np.ndarray, rng: np.random.Generator,
                           brightness_delta: float = 32,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_delta: float = 18) -> np.ndarray:
    """Shared-parameter photometric jitter across all cameras of a frame."""
    out = imgs.astype(np.float32)
    if rng.integers(2):
        out = out + rng.uniform(-brightness_delta, brightness_delta)
    mode = rng.integers(2)
    if mode == 1 and rng.integers(2):
        out = out * rng.uniform(*contrast_range)
    # saturation/hue in HSV-ish approximation: scale chroma around luma
    if rng.integers(2):
        luma = out.mean(-1, keepdims=True)
        out = luma + (out - luma) * rng.uniform(*saturation_range)
    if mode == 0 and rng.integers(2):
        out = out * rng.uniform(*contrast_range)
    return np.clip(out, 0, 255)


class CropResizeFlipParams:
    def __init__(self, resize: float, crop: Tuple[int, int, int, int],
                 flip: bool):
        self.resize = resize
        self.crop = crop
        self.flip = flip


def sample_crop_resize_flip(rng: np.random.Generator, ida_aug_conf: Dict,
                            training: bool) -> CropResizeFlipParams:
    h, w = ida_aug_conf['H'], ida_aug_conf['W']
    if training:
        target = rng.choice(ida_aug_conf['reisze'])
        resize = target / h
        flip = bool(ida_aug_conf.get('rand_flip', False) and rng.integers(2))
    else:
        resize = 1.0
        flip = False
    new_h, new_w = int(h * resize), int(w * resize)
    crop_h0 = max(0, new_h - h) // 2
    crop_w0 = max(0, new_w - w) // 2
    crop = (crop_w0, crop_h0, min(new_w, crop_w0 + w),
            min(new_h, crop_h0 + h))
    return CropResizeFlipParams(resize, crop, flip)


def crop_resize_flip(imgs: np.ndarray, cam2img: np.ndarray,
                     p: CropResizeFlipParams):
    """Apply shared resize/center-crop/flip to all cams; update intrinsics.

    Flip is undone later on the features (reference detectors/vidar.py:123-126)
    so the geometry stays consistent.
    """
    from PIL import Image
    cams, h, w, _ = imgs.shape
    out = []
    new_h, new_w = int(h * p.resize), int(w * p.resize)
    for c in range(cams):
        im = Image.fromarray(imgs[c].astype(np.uint8))
        im = im.resize((new_w, new_h))
        im = im.crop(p.crop)
        if p.flip:
            im = im.transpose(Image.FLIP_LEFT_RIGHT)
        out.append(np.asarray(im, np.float32))
    out = np.stack(out)

    cam2img = cam2img.copy()
    cam2img[:, :2] *= p.resize
    cam2img[:, 0, 2] -= p.crop[0]
    cam2img[:, 1, 2] -= p.crop[1]
    if p.flip:
        cw = out.shape[2]
        cam2img[:, 0, 0] *= -1
        cam2img[:, 0, 2] = cw - cam2img[:, 0, 2]
    return out, cam2img


def normalize_images(imgs: np.ndarray,
                     mean=(103.530, 116.280, 123.675),
                     std=(1.0, 1.0, 1.0), to_bgr: bool = True) -> np.ndarray:
    """Caffe normalisation: RGB->BGR then subtract mean (img_norm_cfg)."""
    out = imgs.astype(np.float32)
    if to_bgr:
        out = out[..., ::-1]
    return (out - np.asarray(mean)) / np.asarray(std)


def pad_images(imgs: np.ndarray, size_divisor: int = 32) -> np.ndarray:
    cams, h, w, c = imgs.shape
    ph = (h + size_divisor - 1) // size_divisor * size_divisor
    pw = (w + size_divisor - 1) // size_divisor * size_divisor
    if ph == h and pw == w:
        return imgs
    out = np.zeros((cams, ph, pw, c), imgs.dtype)
    out[:, :h, :w] = imgs
    return out
