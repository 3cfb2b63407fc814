"""Native (C++) host-runtime ops with pure-numpy fallbacks.

The compute path of this framework is JAX/XLA/Pallas on TPU; the host-side
data runtime — JPEG decode, point-cloud filtering/voxelisation, image
normalise+pad, eval-time 1-NN — is C++ (``hostops.cpp``), the TPU-native
equivalent of the reference's torch-DataLoader/mmcv/chamferdist native layer.

ctypes releases the GIL during every call, so a ``ThreadPoolExecutor`` over
these functions yields a genuinely parallel host pipeline (see
``data.prefetch.PrefetchLoader``). When the library cannot be built the same
API transparently falls back to the numpy implementations in
``data.pipeline``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get('VIDAR_TPU_NO_NATIVE'):
        return None
    try:
        from vidar_tpu.native.build import build
        _lib = ctypes.CDLL(build())
    except Exception:
        _lib = None
        return None
    L = _lib
    L.vt_voxel_downsample.restype = ctypes.c_int
    L.vt_voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    L.vt_point_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8)]
    L.vt_transform_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    L.vt_normalize_pad.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    L.vt_jpeg_info.restype = ctypes.c_int
    L.vt_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    L.vt_jpeg_decode.restype = ctypes.c_int
    L.vt_jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int]
    L.vt_knn_1nn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxel_downsample_points(points: np.ndarray, pc_range: Sequence[float],
                            voxel_size: Sequence[float] = (1.0, 1.0, 1.0),
                            max_voxels: int = 50000) -> np.ndarray:
    """Native voxel downsample; same semantics as
    data.pipeline.voxel_downsample_points (deterministic truncation)."""
    lib = _load()
    if lib is None:
        from vidar_tpu.data.pipeline import voxel_downsample_points as ref
        return ref(points, pc_range, voxel_size, max_voxels)
    pts = np.ascontiguousarray(points, np.float32)
    pc = np.asarray(pc_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    out_idx = np.empty(max_voxels, np.int32)
    n = lib.vt_voxel_downsample(
        _fptr(pts), pts.shape[0], pts.shape[1], _fptr(pc), _fptr(vs),
        max_voxels, out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return pts[out_idx[:n]]


def point_filter(points: np.ndarray,
                 ego_box: Optional[Sequence[float]] = None,
                 radius: float = 0.0) -> np.ndarray:
    """Drop points inside the ego box and/or closer than ``radius``."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        keep = np.ones(len(pts), bool)
        if ego_box is not None:
            b = ego_box
            inside = ((pts[:, 0] >= b[0]) & (pts[:, 0] <= b[2]) &
                      (pts[:, 1] >= b[1]) & (pts[:, 1] <= b[3]))
            keep &= ~inside
        if radius > 0:
            keep &= (pts[:, 0] ** 2 + pts[:, 1] ** 2) >= radius ** 2
        return pts[keep]
    keep = np.empty(len(pts), np.uint8)
    box = (None if ego_box is None
           else np.asarray(ego_box, np.float32))
    lib.vt_point_filter(
        _fptr(pts), pts.shape[0], pts.shape[1],
        None if box is None else _fptr(box), ctypes.c_float(radius),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return pts[keep.astype(bool)]


def transform_points(points: np.ndarray, rot: np.ndarray,
                     t: np.ndarray) -> np.ndarray:
    """In-place-style xyz transform p' = p @ rot + t; returns the array."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        pts[:, :3] = pts[:, :3] @ np.asarray(rot, np.float32) + \
            np.asarray(t, np.float32)
        return pts
    r = np.ascontiguousarray(rot, np.float32)
    tt = np.ascontiguousarray(t, np.float32)
    lib.vt_transform_points(_fptr(pts), pts.shape[0], pts.shape[1],
                            _fptr(r), _fptr(tt))
    return pts


def normalize_pad(img: np.ndarray, ph: int, pw: int,
                  mean=(103.530, 116.280, 123.675),
                  std=(1.0, 1.0, 1.0), to_bgr: bool = True) -> np.ndarray:
    """Fused RGB->BGR + normalise + zero-pad for one [h, w, 3] image."""
    lib = _load()
    if lib is None:
        from vidar_tpu.data.pipeline import normalize_images, pad_images
        out = normalize_images(img[None], mean, std, to_bgr)[0]
        full = np.zeros((ph, pw, 3), np.float32)
        full[:img.shape[0], :img.shape[1]] = out
        return full
    im = np.ascontiguousarray(img, np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    out = np.empty((ph, pw, 3), np.float32)
    lib.vt_normalize_pad(_fptr(im), im.shape[0], im.shape[1], ph, pw,
                         _fptr(m), _fptr(s), int(to_bgr), _fptr(out))
    return out


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a JPEG byte string to an RGB uint8 [h, w, 3] array."""
    lib = _load()
    if lib is None:
        import io
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.vt_jpeg_info(data, len(data), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c)) != 0:
        raise ValueError('invalid JPEG stream')
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.vt_jpeg_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value)
    if rc != 0:
        raise ValueError(f'JPEG decode failed ({rc})')
    return out


def knn_1nn(src: np.ndarray, dst: np.ndarray
            ) -> Tuple[np.ndarray, np.ndarray]:
    """1-nearest-neighbour squared distances + indices, src -> dst (xyz)."""
    lib = _load()
    s = np.ascontiguousarray(src[:, :3], np.float32)
    d = np.ascontiguousarray(dst[:, :3], np.float32)
    if lib is None:
        d2 = ((s[:, None] - d[None]) ** 2).sum(-1)
        idx = d2.argmin(1)
        return d2[np.arange(len(s)), idx], idx.astype(np.int32)
    out_d = np.empty(len(s), np.float32)
    out_i = np.empty(len(s), np.int32)
    lib.vt_knn_1nn(_fptr(s), len(s), _fptr(d), len(d), _fptr(out_d),
                   out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out_d, out_i
