"""Host-side pose/quaternion math for the data layer (numpy).

Stands in for the nuscenes-devkit helpers used by the reference datasets
(``Quaternion``/``transform_matrix``/``quaternion_yaw``, e.g.
reference datasets/nuscenes_vidar_dataset_v1.py:11-12).
Quaternions are (w, x, y, z), matching nuScenes pkl convention.
"""

from __future__ import annotations

import numpy as np


def quat_to_rot(q) -> np.ndarray:
    w, x, y, z = np.asarray(q, np.float64)
    n = w * w + x * x + y * y + z * z
    if n < 1e-12:
        return np.eye(3)
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def transform_matrix(translation, rotation_quat, inverse: bool = False
                     ) -> np.ndarray:
    """4x4 column-vector transform (nuscenes-devkit semantics)."""
    tm = np.eye(4)
    rot = quat_to_rot(rotation_quat)
    t = np.asarray(translation, np.float64)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = rot.T @ (-t)
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = t
    return tm


def quaternion_yaw(q) -> float:
    """Yaw of the x-axis projected on the ground plane (devkit semantics)."""
    rot = quat_to_rot(q)
    v = rot @ np.array([1.0, 0.0, 0.0])
    return float(np.arctan2(v[1], v[0]))


def patch_angle_deg(q) -> float:
    a = quaternion_yaw(q) / np.pi * 180.0
    if a < 0:
        a += 360.0
    return a
