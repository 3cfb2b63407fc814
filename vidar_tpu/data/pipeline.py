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


def scale_images(imgs: np.ndarray, lidar2img: np.ndarray, scale: float):
    """RandomScaleImageMultiViewImage (reference transform_3d.py:294-328):
    resize every view by ``scale`` and left-multiply lidar2img with
    diag(scale, scale, 1, 1). The OpenScene/nuPlan configs run this with a
    single scale of 2/3."""
    from PIL import Image
    cams, h, w, _ = imgs.shape
    nh, nw = int(h * scale), int(w * scale)
    out = np.stack([
        np.asarray(Image.fromarray(im.astype(np.uint8)).resize((nw, nh)),
                   np.float32) for im in imgs])
    sf = np.eye(4)
    sf[0, 0] = scale
    sf[1, 1] = scale
    return out, np.einsum('ij,cjk->cik', sf, lidar2img)


class RandomCropResizeFlipParams:
    def __init__(self, resize: float, resize_dims: Tuple[int, int],
                 crop: Tuple[int, int, int, int], flip: bool):
        self.resize = resize
        self.resize_dims = resize_dims   # (new_w, new_h)
        self.crop = crop                 # (x0, y0, x1, y1)
        self.flip = flip


def sample_random_crop_resize_flip(rng: np.random.Generator,
                                   data_aug_conf: Dict,
                                   training: bool
                                   ) -> RandomCropResizeFlipParams:
    """Reference RandomCropResizeFlipImage._sample_augmentation
    (augmentation.py:272-302): random resize height from 'reisze', bottom
    crop of the fixed (fW, fH) window with a random horizontal offset,
    optional horizontal flip. Shared across the queue (aug_param
    contract)."""
    h, w = data_aug_conf['H'], data_aug_conf['W']
    crop_cfg = data_aug_conf['crop']
    f_w, f_h = int(crop_cfg[2] - crop_cfg[0]), int(crop_cfg[3] - crop_cfg[1])
    if training:
        resized_h = float(rng.choice(data_aug_conf['reisze']))
        resize = resized_h / h
        resize_dims = (int(resized_h / h * w), int(resized_h))
        new_w, new_h = resize_dims
        crop_h = int(max(0, new_h - f_h))
        crop_w = int(rng.uniform(0, max(0, new_w - f_w)))
        crop = (crop_w, crop_h, crop_w + f_w, crop_h + f_h)
        flip = bool(data_aug_conf.get('rand_flip', False) and
                    rng.integers(2))
    else:
        # eval branch (augmentation.py:294-299): resize is relative to the
        # crop window height and the configured crop tuple is kept as-is
        sizes = data_aug_conf['reisze']
        assert len(sizes) == 1
        resized_h = float(sizes[0])
        resize = resized_h / f_h
        resize_dims = (int(resized_h / f_h * f_w), int(resized_h))
        crop = tuple(int(v) for v in crop_cfg)
        flip = False
    return RandomCropResizeFlipParams(resize, resize_dims, crop, flip)


def random_crop_resize_flip(imgs: np.ndarray, lidar2img: np.ndarray,
                            p: RandomCropResizeFlipParams):
    """Apply a sampled RandomCropResizeFlipImage to all views and fold the
    pixel-space affine into lidar2img (the reference updates cam2img with
    ida_mat and rebuilds lidar2img, augmentation.py:230-248; flip is folded
    into the geometry directly, matching this repo's CropResizeFlip
    re-design instead of the reference's unflip-on-features)."""
    from PIL import Image
    out = []
    for c in range(imgs.shape[0]):
        im = Image.fromarray(imgs[c].astype(np.uint8))
        im = im.resize(p.resize_dims)
        im = im.crop(p.crop)
        if p.flip:
            im = im.transpose(Image.FLIP_LEFT_RIGHT)
        out.append(np.asarray(im, np.float32))
    out = np.stack(out)

    a = np.eye(4)
    a[0, 0] = a[1, 1] = p.resize
    a[0, 2] = -p.crop[0]
    a[1, 2] = -p.crop[1]
    if p.flip:
        fw = out.shape[2]
        f = np.eye(4)
        f[0, 0] = -1.0
        f[0, 2] = fw
        a = f @ a
    return out, np.einsum('ij,cjk->cik', a, lidar2img)


class BEVAugParams:
    def __init__(self, rot_angle: float, scale_ratio: float,
                 flip_dx: bool, flip_dy: bool):
        self.rot_angle = rot_angle
        self.scale_ratio = scale_ratio
        self.flip_dx = flip_dx
        self.flip_dy = flip_dy

    @property
    def mat4(self) -> np.ndarray:
        """Combined lidar-space transform T (points' = T @ points)."""
        c, s = np.cos(self.rot_angle), np.sin(self.rot_angle)
        rot = np.array([[c, -s, 0, 0], [s, c, 0, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1.0]])
        sc = np.diag([self.scale_ratio] * 3 + [1.0])
        fl = np.eye(4)
        if self.flip_dx:
            fl[0, 0] = -1.0
        if self.flip_dy:
            fl[1, 1] = -1.0
        return fl @ sc @ rot


def sample_bev_aug(rng: np.random.Generator,
                   rot_range=(-0.3925, 0.3925),
                   scale_ratio_range=(0.95, 1.05),
                   flip_dx_ratio: float = 0.5,
                   flip_dy_ratio: float = 0.5) -> BEVAugParams:
    """GlobalRotScaleTransImage sampling (augmentation.py:368-380). The
    reference's rot_range is interpreted in degrees (divided by 180*pi at
    sample time) — same here."""
    return BEVAugParams(
        rot_angle=float(rng.uniform(*rot_range)) / 180.0 * np.pi,
        scale_ratio=float(rng.uniform(*scale_ratio_range)),
        flip_dx=bool(rng.uniform() < flip_dx_ratio),
        flip_dy=bool(rng.uniform() < flip_dy_ratio))


def bev_aug_lidar2img(lidar2img: np.ndarray, p: BEVAugParams) -> np.ndarray:
    """lidar2img' = lidar2img @ T^-1 so projecting a transformed point
    lands on the original pixel (reference rotate_bev_along_z / scale_xyz /
    flip_along_*, augmentation.py:404-460)."""
    return np.einsum('cij,jk->cik', lidar2img, np.linalg.inv(p.mat4))


def bev_aug_boxes(boxes9: np.ndarray, p: BEVAugParams) -> np.ndarray:
    """Transform [N, 9] (cx cy cz w l h rot vx vy) gt boxes by T
    (reference gt_bboxes_3d.rotate/scale/flip semantics)."""
    out = boxes9.copy()
    if not len(out):
        return out
    t = p.mat4
    centers = np.concatenate([out[:, :3], np.ones((len(out), 1))], 1)
    out[:, :3] = (centers @ t.T)[:, :3]
    out[:, 3:6] *= p.scale_ratio
    yaw = out[:, 6] + p.rot_angle
    # velocity is a direction vector: rotate/scale/flip, no translation
    # (mmdet3d LiDARInstance3DBoxes.rotate/scale/flip semantics)
    vel3 = np.concatenate([out[:, 7:9], np.zeros((len(out), 1))], 1)
    vel = (vel3 @ t[:3, :3].T)[:, :2]
    if p.flip_dx:
        yaw = np.pi - yaw
    if p.flip_dy:
        yaw = -yaw
    out[:, 6] = yaw
    out[:, 7:9] = vel
    return out


def bev_aug_points(points: np.ndarray, p: BEVAugParams) -> np.ndarray:
    """Transform [N, >=3] lidar points by T."""
    out = points.copy()
    if not len(out):
        return out
    xyz1 = np.concatenate([out[:, :3], np.ones((len(out), 1))], 1)
    out[:, :3] = (xyz1 @ p.mat4.T)[:, :3]
    return out


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
