"""OpenScene / nuPlan data path: PCD parsing + 8-camera ViDAR dataset.

Capability match for reference datasets/nuplan_vidar_dataset_template.py:20-119,
nuplan_vidar_dataset_v1.py and pipelines/nuplan_loading.py:11-288 (pure-python
PCD parser). The pkl schema mirrors nuScenes' (token / scene_token / can_bus /
cams / lidar_path ...), so the dataset reuses the nuScenes assembly with a
different point loader, no sweeps, 8 cameras, and the OpenScene image scaling
(RandomScaleImageMultiViewImage 2/3) instead of crop/resize/flip.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Dict, Optional, Sequence

import numpy as np

from .nuscenes import NuScenesViDARDataset
from . import pipeline as pl

_PCD_TYPES = {
    ('F', 4): 'f4', ('F', 8): 'f8',
    ('I', 1): 'i1', ('I', 2): 'i2', ('I', 4): 'i4', ('I', 8): 'i8',
    ('U', 1): 'u1', ('U', 2): 'u2', ('U', 4): 'u4', ('U', 8): 'u8',
}


def load_pcd(path: str) -> np.ndarray:
    """Parse a PCD file (ascii / binary / binary_compressed not supported)
    into an [N, 5] float32 array (x, y, z, intensity, t=0)."""
    with open(path, 'rb') as f:
        header: Dict[str, str] = {}
        while True:
            line = f.readline().decode('ascii', errors='ignore').strip()
            if line.startswith('#') or not line:
                continue
            key, _, rest = line.partition(' ')
            header[key.upper()] = rest
            if key.upper() == 'DATA':
                break
        fields = header['FIELDS'].split()
        sizes = [int(s) for s in header['SIZE'].split()]
        types = header['TYPE'].split()
        counts = [int(c) for c in header.get(
            'COUNT', ' '.join(['1'] * len(fields))).split()]
        n = int(header['POINTS'])
        dtype = np.dtype([
            (name, _PCD_TYPES[(t, s)], (c,)) if c > 1 else
            (name, _PCD_TYPES[(t, s)])
            for name, t, s, c in zip(fields, types, sizes, counts)])
        mode = header['DATA'].split()[0]
        if mode == 'binary':
            data = np.frombuffer(f.read(n * dtype.itemsize), dtype, count=n)
        elif mode == 'ascii':
            data = np.loadtxt(f, dtype=np.float64, max_rows=n)
            out = np.zeros((n, 5), np.float32)
            for i, name in enumerate(('x', 'y', 'z')):
                if name in fields:
                    out[:, i] = data[:, fields.index(name)]
            if 'intensity' in fields:
                out[:, 3] = data[:, fields.index('intensity')]
            return out
        else:
            raise ValueError(f'unsupported PCD data mode: {mode}')

    out = np.zeros((n, 5), np.float32)
    for i, name in enumerate(('x', 'y', 'z')):
        if name in fields:
            out[:, i] = data[name].astype(np.float32)
    if 'intensity' in fields:
        out[:, 3] = np.asarray(data['intensity'], np.float32).reshape(n)
    return out


class NuPlanViDARDataset(NuScenesViDARDataset):
    """8-camera OpenScene/nuPlan variant."""

    def __init__(self, *args, image_scale: float = 2.0 / 3, **kwargs):
        kwargs.setdefault('ida_aug_conf', None)
        super().__init__(*args, **kwargs)
        # applied to images + lidar2img in the shared image loop
        # (reference RandomScaleImageMultiViewImage 2/3, transform_3d.py:294)
        self.image_scale = image_scale

    def _load_frame_points(self, info) -> np.ndarray:
        path = info['lidar_path']
        if self.data_root and not os.path.isabs(path):
            path = os.path.join(self.data_root, path)
        pts = load_pcd(path)
        if self.ego_mask is not None:
            pts = pl.ego_mask_filter(pts, self.ego_mask)
        return pts
