"""Synthetic on-disk nuScenes-format fixture: info pkl + jpg images + lidar
bins, small enough to drive the real CLIs end-to-end in tests."""

from __future__ import annotations

import os
import pickle

import numpy as np


def _write_pcd_binary(path: str, pts: np.ndarray) -> None:
    """Binary PCD (x y z intensity, F4) like OpenScene's MergedPointCloud
    files (reference pipelines/nuplan_loading.py PCD parser input)."""
    n = len(pts)
    header = (
        '# .PCD v0.7 - Point Cloud Data file format\n'
        'VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n'
        'TYPE F F F F\nCOUNT 1 1 1 1\n'
        f'WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n'
        f'POINTS {n}\nDATA binary\n')
    with open(path, 'wb') as f:
        f.write(header.encode('ascii'))
        f.write(np.ascontiguousarray(pts[:, :4], np.float32).tobytes())


def make_fake_nuscenes(root: str, *, num_samples: int = 10, num_cams: int = 3,
                       img_hw=(64, 96), with_gt: bool = True,
                       num_scenes: int = 1, seed: int = 0,
                       lidar_format: str = 'bin') -> str:
    """Create a fake dataset under ``root``; returns the train pkl path.
    ``lidar_format='pcd'`` emits OpenScene-style binary PCD files instead of
    nuScenes .bin, for driving NuPlanViDARDataset."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, 'samples'), exist_ok=True)
    h, w = img_hw

    infos = []
    per_scene = num_samples // num_scenes
    for i in range(num_samples):
        scene = f'scene{i // per_scene}'
        t = i * 500000  # 2 Hz in microseconds
        pos = np.array([i * 2.0, 0.1 * i, 0.0])
        yaw = 0.02 * i
        quat = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]

        pts = rng.uniform(-30, 30, (256, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 2, 256)
        pts[:, 3:] = 0
        if lidar_format == 'pcd':
            lidar_path = os.path.join(root, 'samples', f'lidar_{i}.pcd')
            _write_pcd_binary(lidar_path, pts)
        else:
            lidar_path = os.path.join(root, 'samples', f'lidar_{i}.bin')
            pts.tofile(lidar_path)

        cams = {}
        for c in range(num_cams):
            img_path = os.path.join(root, 'samples', f'img_{i}_{c}.jpg')
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3), np.uint8), 'RGB'
            ).save(img_path)
            ang = 2 * np.pi * c / num_cams
            rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                            [np.sin(ang), np.cos(ang), 0],
                            [0, 0, 1.0]])
            cams[f'CAM{c}'] = dict(
                data_path=img_path,
                type=f'CAM{c}',
                sample_data_token=f'sd{i}_{c}',
                sensor2lidar_rotation=rot,
                sensor2lidar_translation=np.array([1.0, 0.0, 1.5]),
                cam_intrinsic=np.array([[500.0, 0, w / 2],
                                        [0, 500.0, h / 2],
                                        [0, 0, 1]]),
                timestamp=t,
            )

        can_bus = np.zeros(18)
        can_bus[:3] = pos
        can_bus[3:7] = quat
        info = dict(
            token=f'tok{i}',
            scene_token=scene,
            frame_idx=i % per_scene,
            prev=f'tok{i - 1}' if i % per_scene else '',
            next=f'tok{i + 1}' if (i + 1) % per_scene else '',
            timestamp=t,
            lidar_path=lidar_path,
            lidar2ego_translation=[0.9, 0.0, 1.8],
            lidar2ego_rotation=[1.0, 0.0, 0.0, 0.0],
            ego2global_translation=pos.tolist(),
            ego2global_rotation=quat,
            can_bus=can_bus,
            cams=cams,
            sweeps=[],
        )
        if with_gt:
            g = int(rng.integers(2, 6))
            boxes = np.zeros((g, 7))
            boxes[:, :2] = rng.uniform(-40, 40, (g, 2))
            boxes[:, 2] = rng.uniform(-2, 0, g)
            boxes[:, 3:6] = rng.uniform(1, 4, (g, 3))
            boxes[:, 6] = rng.uniform(-np.pi, np.pi, g)
            names = rng.choice(['car', 'truck', 'pedestrian', 'ignoreme'], g)
            info['gt_boxes'] = boxes
            info['gt_names'] = names
            # stable per-scene instance identities (agents persist)
            info['gt_instance_tokens'] = np.asarray(
                [f'{scene}_inst{k}' for k in range(g)])
            info['gt_velocity'] = rng.uniform(-2, 2, (g, 2))
            info['gt_attrs'] = np.asarray([
                {'car': 'vehicle.parked', 'truck': 'vehicle.parked',
                 'pedestrian': 'pedestrian.moving'}.get(str(nm), '')
                for nm in names])
            info['num_lidar_pts'] = rng.integers(0, 50, g)
            info['num_radar_pts'] = np.zeros(g, np.int64)
            info['valid_flag'] = info['num_lidar_pts'] > 0
        infos.append(info)

    pkl = os.path.join(root, 'nuscenes_infos_temporal_train.pkl')
    with open(pkl, 'wb') as f:
        pickle.dump(dict(infos=infos, metadata=dict(version='fake')), f)
    return pkl
